package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.streaming.FlushWindows.{EventLite, GracedChunk}

/** W2: the reference's EXACT wall-clock flush with grace
  * (`sink/.../S3SinkTask.java:277-298`): flush the open chunk when
  * `now − firstProduced ≥ interval + grace ∧ now − lastReceive > grace`.
  * Mirrors the shape of the reference's wall-time IT
  * (`S3SinkConnectorIT.java` testSinkWithWallTimeFlushingAndRewind) and its
  * lagging-consumer deferral clause. */
class GracedFlushSpec extends SparkSpec {

  test("shouldWallFlush is the reference predicate, verbatim") {
    import FlushWindows.shouldWallFlush
    val (interval, grace) = (1000L, 500L)
    // now − first ≥ interval + grace AND now − lastReceive > grace
    assert(shouldWallFlush(nowMs = 2000, firstRecordTsMs = 500, lastReceiveMs = 1000, interval, grace))
    assert(shouldWallFlush(2000, 500, 2000, interval, grace) === false) // just received → defer
    // second clause boundary: exactly grace since last receive → NOT yet (>)
    assert(shouldWallFlush(2000, 0, 1500, interval, grace) === false)
    assert(shouldWallFlush(2001, 0, 1500, interval, grace) === true)
    // first clause boundary: one ms short of interval + grace → not yet
    assert(shouldWallFlush(1499, 0, 0, interval, grace) === false)
    assert(shouldWallFlush(1500, 0, 0, interval, grace) === true)
    // default grace is half the interval (Configure default)
    assert(FlushWindows.defaultGraceMs(1000) === 500)
    assert(FlushWindows.defaultGraceMs(-1) === -1)
  }

  test("quiet partition wall-flushes after interval+grace; lagging partition defers while receiving") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val intervalMs = 1400L
    val graceMs = FlushWindows.defaultGraceMs(intervalMs) // 700
    val mem = MemoryStream[EventLite]
    val q = FlushWindows.gracedChunks(mem.toDS(), intervalMs, graceMs)
      .writeStream.outputMode("update").format("memory").queryName("gf_out")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      def chunks(): Seq[GracedChunk] =
        spark.table("gf_out").as[GracedChunk].collect().toSeq

      // both partitions open a chunk anchored at "now" in EVENT time (the
      // reference IT produces records with broker ≈ wall timestamps)
      val t0us = System.currentTimeMillis() * 1000L
      mem.addData(
        EventLite(0, 0, t0us, 10), EventLite(0, 1, t0us + 1000, 10), EventLite(0, 2, t0us + 2000, 10),
        EventLite(1, 0, t0us, 10), EventLite(1, 1, t0us + 1000, 10), EventLite(1, 2, t0us + 2000, 10))

      // partition 0 goes QUIET; partition 1 keeps receiving lagging backlog
      // (same event timestamps — no event-time flush) well inside each grace
      // window, which must DEFER its wall flush (the reference's second
      // clause). Feed until p0's wall flush lands.
      var off = 3L
      val deadline = System.currentTimeMillis() + 30000
      while (chunks().isEmpty && System.currentTimeMillis() < deadline) {
        mem.addData(EventLite(1, off, t0us + 3000, 10))
        off += 1
        Thread.sleep(100)
      }
      val afterP0 = chunks()
      assert(afterP0.exists(c => c.partition == 0 && c.wallFlush && c.numRecords == 3),
        s"p0 open chunk must wall-flush whole: $afterP0")
      assert(!afterP0.exists(_.partition == 1),
        s"p1 was receiving within grace the whole time — no flush yet: $afterP0")

      // stop feeding p1: its grace elapses and the whole accumulated chunk
      // wall-flushes too (records 0..off-1, none lost, none split)
      val fed = off
      val deadline2 = System.currentTimeMillis() + 30000
      while (!chunks().exists(_.partition == 1) && System.currentTimeMillis() < deadline2)
        Thread.sleep(100)
      val p1 = chunks().filter(_.partition == 1)
      assert(p1.size == 1 && p1.head.wallFlush && p1.head.numRecords == fed &&
        p1.head.startOffset == 0, s"p1 must flush once, whole: $p1")
    } finally q.stop()
  }

  test("binlog stream: historical backlog drains, then wall-flushes whole per partition") {
    import graft.binlog.{ChangeEventGen, GenProfile}
    import spark.implicits._
    // historical event times (the reference's rewind IT shape): now − firstProduced
    // is huge, so the first wall-flush clause holds from the start and the flush
    // waits only on the receive-grace; the interval is too large for any
    // event-time flush, so each partition closes as exactly ONE wall chunk
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 100)
    val dir = tmpDir("gfb")
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 1000)
    // interval = 1 day: far above the backlog's ~100 s event-time span (no
    // event-time flush) yet far below now − firstProduced (historical base),
    // so the first wall clause holds throughout and only the grace gates
    val q = FlushWindows.gracedChunkStream(spark, dir.toString,
      flushIntervalMs = 24L * 3600 * 1000, graceMs = 500L)
      .writeStream.outputMode("update").format("memory").queryName("gfb_out")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      def chunks() = spark.table("gfb_out")
        .as[FlushWindows.GracedChunk].collect().toSeq
      val deadline = System.currentTimeMillis() + 30000
      while (chunks().size < 2 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val got = chunks()
      assert(got.size == 2 && got.map(_.partition).toSet == Set(0, 1), got.toString)
      assert(got.forall(c => c.wallFlush && c.numRecords == 100 && c.startOffset == 0),
        s"each partition must wall-flush whole: $got")
    } finally q.stop()
  }
}
