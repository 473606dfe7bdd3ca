package graft.cdc

import java.nio.file.{Files, Path}

import org.apache.spark.sql.DataFrame

import graft.{Oracle, SparkSpec}
import graft.binlog.{BinlogRead, ChangeEventGen, EventCodec, GenProfile, Segment}
import graft.lake.LakeTable
import graft.model.{ChangeEvent, TextExtract}

/** Replay-equivalence suites (FIXTURES.md F5): the engine's final table
  * state must equal the pure-Scala last-writer-wins oracle — including
  * byte-identical extracted `text` per url — under arbitrary batch splits,
  * duplicate delivery, kill/restart, and schema evolution. Mirrors the
  * reference's offset-restore and rewind ITs
  * (`/root/reference/sink/src/test/java/com/spredfast/kafka/connect/s3/S3SinkConnectorIT.java:314-612`). */
class CdcPipelineSpec extends SparkSpec {

  /** Collect engine state as url → (warcMicros, text, lang, content_len). */
  private def engineState(table: LakeTable): Map[String, (Long, String, String, Long)] = {
    table.read(spark).collect().map { r =>
      val ts = r.getAs[java.sql.Timestamp]("warc_ts")
      val cl = r.getAs[Any]("content_len") match {
        case null => -1L
        case l: Long => l
        case i: Int => i.toLong
      }
      r.getAs[String]("url") -> ((Oracle.micros(ts), r.getAs[String]("text"),
        r.getAs[String]("lang"), cl))
    }.toMap
  }

  private def assertMatchesOracle(table: LakeTable,
      oracle: Map[String, (Long, String, String, Long)]): Unit = {
    val got = engineState(table)
    assert(got.size == oracle.size,
      s"row count: engine=${got.size} oracle=${oracle.size}; " +
        s"extra=${(got.keySet -- oracle.keySet).take(3)}, missing=${(oracle.keySet -- got.keySet).take(3)}")
    oracle.foreach { case (url, (ts, text, lang, cl)) =>
      val g = got(url)
      assert(g._1 == ts, s"warc_ts mismatch at $url: ${g._1} != $ts")
      assert(g._2 == text, s"text NOT byte-identical at $url")
      assert(g._3 == lang, s"lang mismatch at $url")
      assert(g._4 == cl, s"content_len mismatch at $url")
    }
  }

  private def gen(p: GenProfile): Path = {
    val dir = tmpDir("binlog")
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 1000, chunkThreshold = 64 * 1024)
    dir
  }

  test("full replay equals oracle — byte-identical text, uniform profile") {
    val p = GenProfile.uniformSmall().copy(eventsPerPartition = 2500)
    val binlog = gen(p)
    val table = Ingest.replayBatch(spark, binlog.toString, tmpDir("tbl"), eventsPerBatch = 800, nBuckets = 8)
    assertMatchesOracle(table, Oracle.finalState(p))
    // lineage chain is gap-free per partition (≙ chunk-chain contiguity)
    val snap = table.currentSnapshot
    (0 until p.partitions).foreach { part =>
      val chain = snap.batches.flatMap(_.lineage.filter(_.partition == part)).sortBy(_.startOffset)
      assert(chain.head.startOffset == 0L)
      chain.sliding(2).foreach {
        case Seq(a, b) => assert(b.startOffset == a.startOffset + a.count, s"gap at p$part")
        case _ =>
      }
      assert(chain.map(_.count).sum == p.eventsPerPartition)
    }
  }

  test("byte-capped ingest: same final state, more (smaller) exactly-once batches") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1500)
    val binlog = tmpDir("binlog-bytes")
    // small chunks so the byte budget clamps mid-segment
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 750, chunkThreshold = 8 * 1024)
    val oracle = Oracle.finalState(p)

    val root = tmpDir("tbl-bytes")
    val q = Ingest.startStream(spark, binlog.toString, root, tmpDir("ckpt-bytes").toString,
      maxEventsPerBatch = 1000000L, nBuckets = 4, maxBytesPerBatch = 64 * 1024)
    q.awaitTermination()
    val table = LakeTable.load(root)
    assertMatchesOracle(table, oracle)
    // the byte cap split the drain (an uncapped AvailableNow run = 1 batch)
    // into several exactly-once batches with a gap-free lineage chain
    val snap = table.currentSnapshot
    assert(snap.batches.size > 3, s"expected a byte-split drain, got ${snap.batches.size} batches")
    (0 until p.partitions).foreach { part =>
      val chain = snap.batches.flatMap(_.lineage.filter(_.partition == part)).sortBy(_.startOffset)
      assert(chain.map(_.count).sum == p.eventsPerPartition, s"p$part coverage")
      chain.sliding(2).foreach {
        case Seq(a, b) => assert(b.startOffset == a.startOffset + a.count, s"gap at p$part")
        case _ =>
      }
    }
  }

  test("final state is invariant to batch split size") {
    val p = GenProfile.adversarialOrder().copy(partitions = 2, eventsPerPartition = 1000)
    val binlog = gen(p)
    val oracle = Oracle.finalState(p)
    val t1 = Ingest.replayBatch(spark, binlog.toString, tmpDir("tbl"), eventsPerBatch = 170, nBuckets = 4)
    val t2 = Ingest.replayBatch(spark, binlog.toString, tmpDir("tbl"), eventsPerBatch = 100000, nBuckets = 4)
    assertMatchesOracle(t1, oracle)
    assertMatchesOracle(t2, oracle)
  }

  test("adversarial order: ties and delete/upsert races resolve by (warc_ts, offset, partition)") {
    val p = GenProfile.adversarialOrder()
    val binlog = gen(p)
    val table = Ingest.replayBatch(spark, binlog.toString, tmpDir("tbl"), eventsPerBatch = 700, nBuckets = 4)
    assertMatchesOracle(table, Oracle.finalState(p))
  }

  test("duplicate batch delivery is a no-op (exactly-once marker)") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 1000)
    val binlog = gen(p)
    val root = tmpDir("tbl")
    val table = Ingest.replayBatch(spark, binlog.toString, root, eventsPerBatch = 500, nBuckets = 4)
    val before = table.currentSnapshotId
    // redeliver batch 0 (same id, same data) — marker must skip it
    val df0 = BinlogRead.range(spark, binlog.toString, 0L, 500L)
    Ingest.applyBatch(spark, table)(df0, 0L)
    assert(table.currentSnapshotId == before)
    assertMatchesOracle(table, Oracle.finalState(p))
  }

  test("rewind-and-replay with NEW batch ids is idempotent (LWW merge)") {
    // ≙ the delete-everything-and-rewind IT: replaying the whole log over an
    // already-complete table must not change the final state.
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 800)
    val binlog = gen(p)
    val root = tmpDir("tbl")
    val t1 = Ingest.replayBatch(spark, binlog.toString, root, eventsPerBatch = 300, nBuckets = 4)
    val oracle = Oracle.finalState(p)
    assertMatchesOracle(t1, oracle)
    // rewind: replay everything again under fresh batch ids (as a recovered
    // writer would after losing its checkpoint)
    val t2 = Ingest.replayBatch(spark, binlog.toString, root, eventsPerBatch = 300, firstBatchId = 100L)
    assertMatchesOracle(t2, oracle)
  }

  test("kill mid-stream, restart from checkpoint: no gaps, no dups") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1500)
    val binlog = tmpDir("binlog")
    val root = tmpDir("tbl")
    val ckpt = tmpDir("ckpt").toString
    // phase 1: only the first 2 segments per partition exist
    val pHalf = p.copy(eventsPerPartition = 800)
    ChangeEventGen.writeSegments(pHalf, binlog, segmentEvents = 400)
    val q1 = Ingest.startStream(spark, binlog.toString, root, ckpt, maxEventsPerBatch = 500, nBuckets = 4)
    q1.awaitTermination()
    // "crash" (query terminated); more data arrives
    (0 until p.partitions).foreach { part =>
      var off = 800L
      val w = new graft.binlog.SegmentWriter(binlog, part, off)
      while (off < p.eventsPerPartition) { w.writeEvent(ChangeEventGen.event(p, part, off), EventCodec.V2); off += 1 }
      w.close()
    }
    // restart from the same checkpoint
    val q2 = Ingest.startStream(spark, binlog.toString, root, ckpt, maxEventsPerBatch = 500, nBuckets = 4)
    q2.awaitTermination()
    val table = LakeTable.load(root)
    assertMatchesOracle(table, Oracle.finalState(p))
    // per-partition lineage covers [0, N) exactly once
    val snap = table.currentSnapshot
    (0 until p.partitions).foreach { part =>
      val chain = snap.batches.flatMap(_.lineage.filter(_.partition == part)).sortBy(_.startOffset)
      assert(chain.map(_.count).sum == p.eventsPerPartition, s"p$part lineage incomplete")
      chain.sliding(2).foreach {
        case Seq(a, b) => assert(b.startOffset == a.startOffset + a.count)
        case _ =>
      }
    }
  }

  test("schema evolution v1→v2 mid-stream: widen + added column, replay-equivalent") {
    val p = GenProfile.evolving().copy(partitions = 2, eventsPerPartition = 1000)
    val binlog = gen(p)
    val root = tmpDir("tbl")
    val boundary = (p.eventsPerPartition * p.v2FromFraction).toLong // 400
    // table starts at schema v1; ingest the v1 era
    val table = LakeTable.create(root, nBuckets = 64, schemaVersion = 1)
    Ingest.applyBatch(spark, table)(BinlogRead.range(spark, binlog.toString, 0L, boundary), 0L)
    // evolve: add lang, widen content_len — metadata-only commit
    table.evolveSchema(2)
    // mixed-version read immediately after evolve: v1 files under the v2
    // logical schema — added column reads as null, widened type as long
    val afterEvolve = table.read(spark)
    assert(afterEvolve.schema("lang").dataType == org.apache.spark.sql.types.StringType)
    assert(afterEvolve.schema("content_len").dataType == org.apache.spark.sql.types.LongType)
    assert(afterEvolve.filter(org.apache.spark.sql.functions.col("lang").isNotNull).count() == 0)
    assert(afterEvolve.count() > 0)
    // a NARROW v2 batch: copy-on-write must rewrite only the touched buckets,
    // leaving genuine v1 files in the live snapshot (mixed-version table)
    Ingest.applyBatch(spark, table)(BinlogRead.range(spark, binlog.toString, boundary, boundary + 30), 1L)
    assert(table.currentSnapshot.files.map(_.schemaVersion).toSet == Set(1, 2))
    // ingest the rest of the v2 era
    Ingest.applyBatch(spark, table)(BinlogRead.range(spark, binlog.toString, boundary + 30, p.eventsPerPartition), 2L)
    // oracle over DECODED wire events (v1 events carry lang=null)
    val decoded = (0 until p.partitions).iterator.flatMap(part =>
      Segment.readRange(binlog, part, 0L, Long.MaxValue))
    val oracle = Oracle.fold(decoded).collect {
      case (url, w) if w.op == ChangeEvent.OpUpsert =>
        url -> ((w.warcMicros, TextExtract.extract(w.html), w.lang, w.html.length.toLong))
    }.toMap
    assertMatchesOracle(table, oracle)
  }

  test("salted dedup equals unsalted on hot-key (Zipf) stream; pipeline matches oracle") {
    import spark.implicits._
    val p = GenProfile.hotKeys(partitions = 2, perPartition = 3000)
    val events = ChangeEventGen.allEvents(p).toVector
    // hot keys are real: top url owns a significant share
    val byUrl = events.groupBy(_.url).view.mapValues(_.size)
    assert(byUrl.values.max > events.size / 50)
    val df = spark.createDataset(events).toDF()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[String]("url"), r.getAs[java.sql.Timestamp]("warc_ts").getTime,
        r.getAs[Long]("offset"), r.getAs[String]("op"))
    val unsalted = Dedup.latestPerUrl(df).collect().map(key).toSet
    val salted = SkewOps.saltedLatestPerUrl(df, salts = 16).collect().map(key).toSet
    assert(salted == unsalted)
    // and the full MOR pipeline on the skewed stream matches the oracle
    val binlog = tmpDir("hotbl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 1500)
    val table = Ingest.replayBatch(spark, binlog.toString, tmpDir("hottbl"),
      eventsPerBatch = 1000, nBuckets = 8, mode = Mor)
    val oracle = Oracle.finalState(p)
    val got = table.read(spark).collect()
      .map(r => r.getAs[String]("url") -> Oracle.micros(r.getAs[java.sql.Timestamp]("warc_ts"))).toMap
    assert(got.size == oracle.size)
    assert(oracle.forall { case (u, (ts, _, _, _)) => got(u) == ts })
  }

  test("fallback lineage records TRUE contiguous runs for an offset-gapped frame") {
    import org.apache.spark.sql.functions.col
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 300)
    val binlog = gen(p)
    val table = LakeTable.create(tmpDir("gaptbl"), nBuckets = 4)
    // a frame with an offset HOLE (an upstream filter dropped [100, 200)),
    // materialized so the non-binlog fallback lineage path runs
    val src = BinlogRead.range(spark, binlog.toString, 0, 300)
      .filter(col("offset") < 100 || col("offset") >= 200)
    val gapped = spark.createDataFrame(
      java.util.Arrays.asList(src.collect(): _*), src.schema)
    Ingest.applyBatch(spark, table)(gapped, 0L)
    val lin = table.currentSnapshot.batches.head.lineage
    // two runs — NOT a fabricated (min=0, count=200) envelope spanning the gap
    assert(lin.map(l => (l.partition, l.startOffset, l.count)) ==
      Seq((0, 0L, 100L), (0, 200L, 100L)), lin.toString)
    assert(table.read(spark).count() > 0)
  }

  test("time travel: earlier snapshot still readable after later commits") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 600)
    val binlog = gen(p)
    val root = tmpDir("tbl")
    val table = Ingest.replayBatch(spark, binlog.toString, root, eventsPerBatch = 200, nBuckets = 4)
    val ids = table.snapshotIds
    assert(ids.size >= 3)
    val mid = ids(ids.size / 2)
    val midCount = table.read(spark, Some(mid)).count()
    val curCount = table.read(spark).count()
    assert(midCount > 0 && midCount <= p.eventsPerPartition)
    assert(table.snapshot(mid).batches.size < table.currentSnapshot.batches.size)
    assert(curCount > 0)
  }
}
