package graft.binlog

import graft.{Oracle, SparkSpec}
import graft.cdc.Ingest
import graft.lake.LakeTable

/** Binlog retention (Retention): segment-granular truncation below the
  * table's own applied-lineage horizon — the Kafka-retention role the
  * reference delegates to the broker. */
class RetentionSpec extends SparkSpec {

  private def state(t: LakeTable): Map[String, (Long, String)] =
    t.read(spark).collect().map { r =>
      r.getAs[String]("url") ->
        ((Oracle.micros(r.getAs[java.sql.Timestamp]("warc_ts")), r.getAs[String]("text")))
    }.toMap

  test("expireApplied truncates below the applied prefix; replay completes to oracle") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 2000,
      urlPoolPerPartition = 1400)
    val binlog = tmpDir("ret-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 500) // 4 segments/partition
    val table = LakeTable.create(tmpDir("ret-tbl"), 4)
    // apply only a prefix; the range read's planned offsets ARE the lineage
    Ingest.applyBatch(spark, table)(BinlogRead.range(spark, binlog.toString, 0L, 1200L), 0L)
    assert(Retention.appliedHorizon(table) == Map(0 -> 1200L, 1 -> 1200L))
    // segment-granular: [0,500) and [500,1000) go; [1000,1500) straddles and stays
    assert(Retention.expireApplied(table, binlog) == 4)
    val segs = Segment.listAll(binlog)
    assert(segs.nonEmpty && segs.forall(_.startOffset >= 1000L))
    // the tail still applies exactly once over the truncated head
    Ingest.applyBatch(spark, table)(BinlogRead.range(spark, binlog.toString, 1200L, 2000L), 1L)
    val oracle = Oracle.finalState(p)
    val got = state(table)
    assert(got.size == oracle.size)
    oracle.foreach { case (url, (ts, text, _, _)) =>
      assert(got(url) == ((ts, text)), s"divergence at $url") }
    // fully applied now → the rest truncates, listing is clean-empty
    assert(Retention.expireApplied(table, binlog) == 4)
    assert(Segment.listAll(binlog).isEmpty)
  }

  test("minHorizon withholds partitions a consumer hasn't touched") {
    val a = Map(0 -> 100L, 1 -> 50L)
    val b = Map(0 -> 80L)
    assert(Retention.minHorizon(Seq(a, b)) == Map(0 -> 80L))
    assert(Retention.minHorizon(Seq(a)) == a)
    assert(Retention.minHorizon(Nil) == Map.empty[Int, Long])
  }

  test("checkpointed stream survives full head truncation; new data continues") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1000,
      urlPoolPerPartition = 700)
    val binlog = tmpDir("ret2-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 500)
    val root = tmpDir("ret2-tbl")
    val ckpt = tmpDir("ret2-ckpt").toString
    Ingest.startStream(spark, binlog.toString, root, ckpt,
      maxEventsPerBatch = 600, nBuckets = 4).awaitTermination()
    val table = LakeTable.load(root)
    assert(Retention.expireApplied(table, binlog) == 4)
    assert(Segment.listAll(binlog).isEmpty)
    // restart over the emptied dir: a clean no-op, not an error
    Ingest.startStream(spark, binlog.toString, root, ckpt,
      maxEventsPerBatch = 600, nBuckets = 4).awaitTermination()
    // new events land above the truncation; the checkpoint carries on
    val pExt = p.copy(eventsPerPartition = 1600)
    (0 until p.partitions).foreach { part =>
      var off = 1000L
      val w = new SegmentWriter(binlog, part, off)
      while (off < pExt.eventsPerPartition) {
        w.writeEvent(ChangeEventGen.event(pExt, part, off), EventCodec.V2)
        off += 1
      }
      w.close()
    }
    Ingest.startStream(spark, binlog.toString, root, ckpt,
      maxEventsPerBatch = 600, nBuckets = 4).awaitTermination()
    val oracle = Oracle.finalState(pExt)
    val got = state(LakeTable.load(root))
    assert(got.size == oracle.size,
      s"rows: got=${got.size} oracle=${oracle.size}")
    oracle.foreach { case (url, (ts, text, _, _)) =>
      assert(got(url) == ((ts, text)), s"divergence at $url") }
  }
}
