package graft.cdc

import org.apache.spark.sql.functions._

import graft.{Oracle, SparkSpec}
import graft.binlog.{BinlogRead, ChangeEventGen, GenProfile}
import graft.lake.LakeTable

/** Initial-snapshot bootstrap → binlog handoff (Ingest.bootstrap): the
  * "snapshot, then stream" mode. The contract under test is CONVERGENCE —
  * bootstrap(dump at cut) + replay must equal a from-scratch replay of the
  * full log, byte-identical text included — plus the skip variant's
  * O(delta) read and the exactly-once/freshness guards. */
class BootstrapSpec extends SparkSpec {

  private def state(t: LakeTable): Map[String, (Long, String, String, Long)] =
    t.read(spark).collect().map { r =>
      val cl = r.getAs[Any]("content_len") match {
        case null => -1L
        case l: Long => l
        case i: Int => i.toLong
      }
      r.getAs[String]("url") -> ((Oracle.micros(r.getAs[java.sql.Timestamp]("warc_ts")),
        r.getAs[String]("text"), r.getAs[String]("lang"), cl))
    }.toMap

  /** What an operator would export from an existing system: the resolved
    * live rows' (url, warc_ts, html, lang). */
  private def dumpOf(t: LakeTable) =
    t.read(spark).select(col("url"), col("warc_ts"), col("html"), col("lang"))

  test("full-overlap handoff equals from-scratch replay — dense ties") {
    // adversarial profile: 30% deletes, 50% exact warc_ts ties — the case
    // where a wrong bootstrap envelope would flip winners
    val p = GenProfile.adversarialOrder().copy(eventsPerPartition = 1200)
    val binlog = tmpDir("bs-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 400)
    val cut = 700L
    // the dump: a resolved table state at the cut
    val preTable = LakeTable.create(tmpDir("bs-pre"), 4)
    Ingest.applyBatch(spark, preTable)(BinlogRead.range(spark, binlog.toString, 0L, cut), 0L)
    // control: plain full replay into a fresh table
    val control = Ingest.replayBatch(spark, binlog.toString, tmpDir("bs-ctl"),
      eventsPerBatch = 500, nBuckets = 4)
    // handoff: bootstrap the dump, then stream the WHOLE retained binlog
    val root = tmpDir("bs-tbl")
    Ingest.bootstrap(spark, root, dumpOf(preTable), nBuckets = 4)
    Ingest.startStream(spark, binlog.toString, root, tmpDir("bs-ckpt").toString,
      maxEventsPerBatch = 500, nBuckets = 4).awaitTermination()
    val got = state(LakeTable.load(root))
    val want = state(control)
    assert(got.size == want.size,
      s"rows: handoff=${got.size} control=${want.size}")
    want.foreach { case (url, w) =>
      assert(got(url) == w, s"divergence at $url: ${got(url)} != $w")
    }
    // and both equal the pure-Scala oracle (text byte-identical)
    val oracle = Oracle.finalState(p)
    assert(got.size == oracle.size)
    oracle.foreach { case (url, w) => assert(got(url) == w, s"oracle diff at $url") }
  }

  test("skip handoff via startOffsets reads only the delta and converges") {
    // no deliberate ties: the skip variant's documented exactness domain
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1600,
      urlPoolPerPartition = 1000, tieRatio = 0.0, lateRatio = 0.0)
    val binlog = tmpDir("bs2-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 400)
    val cut = 1000L
    val preTable = LakeTable.create(tmpDir("bs2-pre"), 4)
    Ingest.applyBatch(spark, preTable)(BinlogRead.range(spark, binlog.toString, 0L, cut), 0L)
    val control = Ingest.replayBatch(spark, binlog.toString, tmpDir("bs2-ctl"),
      eventsPerBatch = 500, nBuckets = 4)
    val root = tmpDir("bs2-tbl")
    Ingest.bootstrap(spark, root, dumpOf(preTable), nBuckets = 4)
    Ingest.startStream(spark, binlog.toString, root, tmpDir("bs2-ckpt").toString,
      maxEventsPerBatch = 500, nBuckets = 4,
      startOffsets = Map(0 -> cut, 1 -> cut)).awaitTermination()
    val t = LakeTable.load(root)
    val got = state(t)
    val want = state(control)
    assert(got.size == want.size)
    want.foreach { case (url, w) => assert(got(url) == w, s"divergence at $url") }
    // O(delta), not O(log): stream lineage starts exactly at the cut
    val snap = t.currentSnapshot
    (0 until p.partitions).foreach { part =>
      val chain = snap.batches.flatMap(_.lineage.filter(_.partition == part))
        .sortBy(_.startOffset)
      assert(chain.head.startOffset == cut, s"p$part read below the cut")
      assert(chain.map(_.count).sum == p.eventsPerPartition - cut)
      chain.sliding(2).foreach {
        case Seq(a, b) => assert(b.startOffset == a.startOffset + a.count)
        case _ =>
      }
    }
  }

  test("startOffsets anchors partitions DISCOVERED after the stream starts") {
    // partition 1's first segment lands only after the first run: discovery
    // goes through the running stream's base map, which must honor the
    // handoff anchor — without it the whole pre-cut history replays
    val p = graft.binlog.GenProfile.uniformSmall().copy(partitions = 2,
      eventsPerPartition = 1200, urlPoolPerPartition = 900,
      tieRatio = 0.0, lateRatio = 0.0)
    val binlog = tmpDir("bs4-binlog")
    graft.binlog.ChangeEventGen.writeSegments(p.copy(partitions = 1), binlog, segmentEvents = 400)
    val cut = 800L
    val root = tmpDir("bs4-tbl")
    val ckpt = tmpDir("bs4-ckpt").toString
    val anchors = Map(0 -> cut, 1 -> cut)
    Ingest.startStream(spark, binlog.toString, root, ckpt, maxEventsPerBatch = 500,
      nBuckets = 4, startOffsets = anchors).awaitTermination()
    // partition 1 appears now, with full history on disk
    var off = 0L
    val w = new graft.binlog.SegmentWriter(binlog, 1, off)
    while (off < p.eventsPerPartition) {
      w.writeEvent(graft.binlog.ChangeEventGen.event(p, 1, off), graft.binlog.EventCodec.V2)
      off += 1
    }
    w.close()
    Ingest.startStream(spark, binlog.toString, root, ckpt, maxEventsPerBatch = 500,
      nBuckets = 4, startOffsets = anchors).awaitTermination()
    val snap = graft.lake.LakeTable.load(root).currentSnapshot
    Seq(0, 1).foreach { part =>
      val chain = snap.batches.flatMap(_.lineage.filter(_.partition == part))
        .sortBy(_.startOffset)
      assert(chain.head.startOffset == cut,
        s"p$part read below the cut: ${chain.head.startOffset}")
      assert(chain.map(_.count).sum == p.eventsPerPartition - cut)
    }
  }

  test("bootstrap is idempotent; non-fresh tables are rejected") {
    import spark.implicits._
    val dump = Seq(
      ("u1", new java.sql.Timestamp(1700000000000L), "<p>one</p>".getBytes, "en"),
      ("u2", new java.sql.Timestamp(1700000001000L), "<p>two</p>".getBytes, "de"))
      .toDF("url", "warc_ts", "html", "lang")
    // a dump with duplicate urls is rejected (duplicates would share the one
    // reserved envelope and break envelope-keyed winner resolution)
    val dupDump = dump.union(dump.limit(1))
    intercept[IllegalArgumentException](
      Ingest.bootstrap(spark, tmpDir("bs3-dup"), dupDump, nBuckets = 2))
    val root = tmpDir("bs3-tbl")
    val t = Ingest.bootstrap(spark, root, dump, nBuckets = 2)
    val snapAfter = t.currentSnapshotId
    assert(t.read(spark).count() == 2)
    // replayed bootstrap: exactly-once marker makes it a no-op
    Ingest.bootstrap(spark, root, dump, nBuckets = 2): Unit
    assert(LakeTable.load(root).currentSnapshotId == snapAfter)
    // a stream-domain batch lands; bootstrap must now refuse
    val ev = Seq((0, 0L, "upsert", "u3", new java.sql.Timestamp(1700000002000L),
      "<p>three</p>".getBytes, "en"))
      .toDF("partition", "offset", "op", "url", "warc_ts", "html", "lang")
    Ingest.applyBatch(spark, t)(ev, 0L)
    intercept[IllegalArgumentException](Ingest.bootstrap(spark, root, dump, nBuckets = 2))
    // and the bootstrap envelope loses warc_ts ties to any real event:
    // same ts as u2's dump row, real envelope → the event wins
    val tie = Seq((0, 1L, "upsert", "u2", new java.sql.Timestamp(1700000001000L),
      "<p>two-v2</p>".getBytes, "de"))
      .toDF("partition", "offset", "op", "url", "warc_ts", "html", "lang")
    Ingest.applyBatch(spark, t)(tie, 1L)
    val u2 = t.read(spark).filter(col("url") === "u2").select("text").head().getString(0)
    assert(u2 == "two-v2", s"equal-warc_ts event must beat the bootstrap row, got '$u2'")
  }
}
