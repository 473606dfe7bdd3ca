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

  test("in-loop retention: the ingest stream truncates its own source as it goes") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 2000,
      urlPoolPerPartition = 1400)
    val binlog = tmpDir("ret4-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 250)
    val root = tmpDir("ret4-tbl")
    Ingest.startStream(spark, binlog.toString, root, tmpDir("ret4-ckpt").toString,
      maxEventsPerBatch = 600, nBuckets = 4,
      retainBinlogEveryBatches = 2).awaitTermination()
    // the final state is still the exact oracle (retention never raced a read)
    val oracle = Oracle.finalState(p)
    val got = state(LakeTable.load(root))
    assert(got.size == oracle.size)
    oracle.foreach { case (url, (ts, text, _, _)) =>
      assert(got(url) == ((ts, text)), s"divergence at $url") }
    // and the source was truncated along the way (only a tail may remain)
    val remaining = Segment.listAll(binlog)
    assert(remaining.size < 16, s"expected most of 16 segments truncated, ${remaining.size} remain")
    remaining.foreach(sf => assert(sf.endOffset > 1200L, s"stale head segment ${sf.path}"))
  }

  test("expireArchive truncates grouped layouts by (topic, partition) horizon") {
    import spark.implicits._
    val events = (0L until 300L).map { o =>
      ((o % 2).toInt, o / 2, "upsert", s"https://x/${o / 2}",
        new java.sql.Timestamp(1700000000000L + o), s"<p>$o</p>".getBytes, "en")
    }
    val df = events.toDF("partition", "offset", "op", "url", "warc_ts", "html", "lang")
      .repartition(2)
    val dest = tmpDir("ret3-arch")
    Archive.archiveBatch(spark, dest, segmentEvents = 40, chunkThreshold = 1 << 20,
      layout = Layout.GroupedByDate, topic = "pages", date = "2026-08-17")(df, 0L)
    val before = Layout.listUnder(dest, Layout.GroupedByDate)
    assert(before.size >= 6)
    // truncate partition 0 below offset 100; partition 1 untouched
    val n = Retention.expireArchive(dest, Layout.GroupedByDate,
      Map(("pages", 0) -> 100L))
    assert(n > 0)
    val after = Layout.listUnder(dest, Layout.GroupedByDate)
    assert(after.size == before.size - n)
    assert(after.filter(_._1.partition == 0).forall { case (_, sf) => sf.endOffset > 100L })
    assert(after.count(_._1.partition == 1) == before.count(_._1.partition == 1))
    // idempotent; an unrelated topic key deletes nothing
    assert(Retention.expireArchive(dest, Layout.GroupedByDate, Map(("pages", 0) -> 100L)) == 0)
    assert(Retention.expireArchive(dest, Layout.GroupedByDate, Map(("other", 1) -> 999L)) == 0)
    // the kept tail is still fully readable through the layout listing
    val back = after.flatMap { case (_, sf) => Segment.read(sf, sf.startOffset) }
    assert(back.nonEmpty && back.forall(e => e.partition == 1 || e.offset >= 80L))
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
