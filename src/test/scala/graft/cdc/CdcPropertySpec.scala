package graft.cdc

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

import graft.{Oracle, SparkSpec}
import graft.model.ChangeEvent

/** ScalaCheck property: for RANDOM interleavings of upserts/deletes over a
  * small key space — including exact (warc_ts) ties and arbitrary batch
  * splits — the engine's final table state equals the single-threaded
  * last-writer-wins oracle. The reference has no property tests (SURVEY.md
  * §5); this generalizes its rewind/replay ITs. */
class CdcPropertySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkSpec.session

  private val genEvent: Gen[(Int, String, Int, Int)] = for {
    part <- Gen.choose(0, 2)
    op <- Gen.frequency(7 -> Gen.const("upsert"), 3 -> Gen.const("delete"))
    key <- Gen.choose(0, 11) // small pool → dense collisions
    tsBucket <- Gen.choose(0, 5) // few buckets → exact timestamp ties
  } yield (part, op, key, tsBucket)

  private def materialize(raw: List[(Int, String, Int, Int)]): Vector[ChangeEvent] = {
    val perPart = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    raw.map { case (part, op, key, tsb) =>
      val off = perPart(part)
      perPart(part) = off + 1
      val ts = new Timestamp(1700000000000L + tsb * 1000L)
      val html = if (op == "delete") null
        else s"<html><body>k$key v$off p$part</body></html>".getBytes("UTF-8")
      ChangeEvent(part, off, op, s"https://k$key.example.org/", ts, html, "en")
    }.toVector
  }

  test("random op interleavings + random batch splits == LWW oracle") {
    import spark.implicits._
    val prop = Prop.forAll(Gen.listOfN(60, genEvent), Gen.choose(7, 40)) { (raw, batchSize) =>
      val events = materialize(raw)
      if (events.isEmpty) true
      else {
        val oracle = Oracle.fold(events.iterator).collect {
          case (url, w) if w.op == ChangeEvent.OpUpsert =>
            url -> ((w.warcMicros, graft.model.TextExtract.extract(w.html)))
        }
        val root = java.nio.file.Files.createTempDirectory("prop-lake")
        val table = graft.lake.LakeTable.create(root, nBuckets = 4)
        events.grouped(batchSize).zipWithIndex.foreach { case (chunk, i) =>
          Ingest.applyBatch(spark, table)(spark.createDataset(chunk).toDF(), i.toLong)
        }
        val got = table.read(spark).collect().map { r =>
          r.getAs[String]("url") ->
            ((Oracle.micros(r.getAs[Timestamp]("warc_ts")), r.getAs[String]("text")))
        }.toMap
        got == oracle
      }
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(12)
      .withInitialSeed(org.scalacheck.rng.Seed(42L)) // deterministic suite
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("random batch/overwrite/truncate/rollback interleavings == rewrite-aware LWW model") {
    import spark.implicits._
    // step kinds: 0 = COW batch, 1 = MOR batch, 2 = INSERT-OVERWRITE-style
    // full replacement, 3 = TRUNCATE, 4 = ROLLBACK to a random earlier
    // snapshot. The MODEL is the multiset of events "live" since the last
    // rewrite: a batch appends to it, an overwrite REPLACES it, truncate
    // empties it, rollback restores the recorded set of the target
    // snapshot — the engine state must equal the LWW fold of exactly that
    // multiset after ANY interleaving (modes mixed per step).
    val genStep: Gen[(Int, List[(Int, String, Int, Int)])] = for {
      kind <- Gen.frequency(5 -> 0, 4 -> 1, 2 -> 2, 1 -> 3, 1 -> 4)
      n <- Gen.choose(5, 20)
      evs <- Gen.listOfN(n, genEvent)
    } yield (kind, evs)

    val prop = Prop.forAll(Gen.listOfN(6, genStep)) { steps =>
      val root = java.nio.file.Files.createTempDirectory("prop-rw")
      val table = graft.lake.LakeTable.create(root, nBuckets = 4)
      // offsets must stay unique ACROSS steps: two events sharing the full
      // (warc_ts, offset, partition) envelope would have no defined winner
      val perPart = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
      def mat(raw: List[(Int, String, Int, Int)]): Vector[ChangeEvent] =
        raw.map { case (part, op, key, tsb) =>
          val off = perPart(part)
          perPart(part) = off + 1
          val html = if (op == "delete") null
            else s"<html><body>k$key o$off p$part</body></html>".getBytes("UTF-8")
          ChangeEvent(part, off, op, s"https://k$key.example.org/",
            new Timestamp(1700000000000L + tsb * 1000L), html, "en")
        }.toVector
      var live = Vector.empty[ChangeEvent]
      var history = Vector((table.currentSnapshotId, live))
      steps.zipWithIndex.foreach { case ((kind, raw), i) =>
        kind match {
          case 0 | 1 =>
            val chunk = mat(raw)
            live = live ++ chunk
            Ingest.applyBatch(spark, table,
              mode = if (kind == 0) Cow else Mor)(
              spark.createDataset(chunk).toDF(), i.toLong)
          case 2 =>
            val chunk = mat(raw)
            live = chunk
            Merge.overwrite(spark, table,
              spark.createDataset(chunk).toDF(), (1L << 62) | i.toLong): Unit
          case 3 =>
            live = Vector.empty
            table.truncate(): Unit
          case 4 =>
            // deterministic pseudo-random pick of an earlier snapshot
            val (sid, recorded) = history(raw.length % history.size)
            if (sid != table.currentSnapshotId) {
              table.rollbackTo(sid): Unit
              live = recorded
            }
        }
        history = history :+ ((table.currentSnapshotId, live))
      }
      val oracle = Oracle.fold(live.iterator).collect {
        case (url, w) if w.op == ChangeEvent.OpUpsert =>
          url -> ((w.warcMicros, graft.model.TextExtract.extract(w.html)))
      }
      val got = table.read(spark).collect().map { r =>
        r.getAs[String]("url") ->
          ((Oracle.micros(r.getAs[Timestamp]("warc_ts")), r.getAs[String]("text")))
      }.toMap
      got == oracle
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(8) // each case runs up to 6 real merges
      .withInitialSeed(org.scalacheck.rng.Seed(44L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }

  test("random op interleavings applied via SQL MERGE == LWW oracle") {
    import spark.implicits._
    val wh = java.nio.file.Files.createTempDirectory("prop-sql-wh").toString
    graft.sql.GraftSql.enable(spark, wh)
    val prop = Prop.forAll(Gen.listOfN(50, genEvent), Gen.choose(7, 30)) { (raw, batchSize) =>
      val events = materialize(raw)
      if (events.isEmpty) true
      else {
        val oracle = Oracle.fold(events.iterator).collect {
          case (url, w) if w.op == ChangeEvent.OpUpsert =>
            url -> ((w.warcMicros, graft.model.TextExtract.extract(w.html)))
        }
        spark.sql("DROP TABLE IF EXISTS graft.prop")
        spark.sql("""CREATE TABLE graft.prop (url STRING, warc_ts TIMESTAMP,
                    |  html BINARY, text STRING, content_len BIGINT, lang STRING)
                    |USING graft TBLPROPERTIES('buckets'='4')""".stripMargin)
        events.grouped(batchSize).foreach { chunk =>
          spark.createDataset(chunk).toDF().createOrReplaceTempView("prop_src")
          spark.sql(
            """MERGE INTO graft.prop t USING (
              |  SELECT url, warc_ts, html, CAST(NULL AS STRING) AS text,
              |    CAST(NULL AS BIGINT) AS content_len, lang, op, offset, partition
              |  FROM prop_src) s
              |ON t.url = s.url
              |WHEN MATCHED AND s.op = 'delete' THEN DELETE
              |WHEN MATCHED THEN UPDATE SET *
              |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        }
        val got = spark.sql("SELECT url, warc_ts, text FROM graft.prop").collect().map { r =>
          r.getAs[String]("url") ->
            ((Oracle.micros(r.getAs[Timestamp]("warc_ts")), r.getAs[String]("text")))
        }.toMap
        got == oracle
      }
    }
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(6) // each case runs several real SQL MERGEs
      .withInitialSeed(org.scalacheck.rng.Seed(43L))
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, res.status.toString)
  }
}
