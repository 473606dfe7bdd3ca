package graft.cdc

import java.nio.file.Path

import graft.{Oracle, SparkSpec}
import graft.binlog.{ChangeEventGen, GenProfile}
import graft.lake.{LakeTable, Maintain}

/** Merge-on-read mode: same replay-equivalence guarantees as COW (oracle
  * equality, batch-split invariance, idempotence, restart), plus the
  * MOR-specific mechanics — delta accumulation, incremental compaction,
  * resolve-on-read, and Maintain.compact over multi-version files. */
class MorPipelineSpec extends SparkSpec {

  private def engineState(table: LakeTable): Map[String, (Long, String)] =
    table.read(spark).collect().map { r =>
      r.getAs[String]("url") ->
        ((Oracle.micros(r.getAs[java.sql.Timestamp]("warc_ts")), r.getAs[String]("text")))
    }.toMap

  private def oracleOf(p: GenProfile): Map[String, (Long, String)] =
    Oracle.finalState(p).map { case (u, (ts, text, _, _)) => u -> ((ts, text)) }

  private def gen(p: GenProfile): Path = {
    val dir = tmpDir("morbl")
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 1000)
    dir
  }

  test("MOR replay equals oracle; deltas accumulate then compact incrementally") {
    val p = GenProfile.uniformSmall().copy(eventsPerPartition = 2500)
    val binlog = gen(p)
    // many small batches on few buckets → guaranteed > MaxFilesPerBucket
    // deltas per bucket → the incremental compaction path runs
    val table = Ingest.replayBatch(spark, binlog.toString, tmpDir("mortbl"),
      eventsPerBatch = 400, nBuckets = 4, mode = Mor)
    val filesPerBucket = table.currentSnapshot.files.groupBy(_.bucket).values.map(_.size)
    assert(filesPerBucket.max <= Merge.MaxFilesPerBucket + 1,
      s"compaction must bound delta count, got ${filesPerBucket.toSeq.sorted}")
    val got = engineState(table)
    val want = oracleOf(p)
    assert(got.size == want.size)
    want.foreach { case (u, (ts, text)) =>
      assert(got(u)._1 == ts, s"ts mismatch at $u")
      assert(got(u)._2 == text, s"text mismatch at $u")
    }
  }

  test("incremental read (CDC-out): per-batch increments are the batch winners") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 900)
    val binlog = gen(p)
    val root = tmpDir("incrtbl")
    val table = LakeTable.create(root, nBuckets = 4)
    val snapIds = scala.collection.mutable.ArrayBuffer(table.currentSnapshotId)
    (0 until 3).foreach { b =>
      Ingest.applyBatch(spark, table, mode = Mor)(
        graft.binlog.BinlogRead.range(spark, binlog.toString, b * 300L, (b + 1) * 300L), b.toLong)
      snapIds += table.currentSnapshotId
    }
    // each increment = that batch's post-dedup winners (upserts + tombstones)
    (0 until 3).foreach { b =>
      val inc = table.readIncrement(spark, snapIds(b), Some(snapIds(b + 1)))
      val marker = table.currentSnapshot.batches.find(_.batchId == b.toLong).get
      assert(inc.count() == marker.upserts + marker.deletes)
      // winner per url: matches a direct fold of that batch's events
      val want = Oracle.fold(graft.binlog.Segment.readRange(binlog, 0, b * 300L, (b + 1) * 300L))
      assert(inc.count() == want.size)
      val gotDel = inc.filter(org.apache.spark.sql.functions.col("_deleted")).count()
      assert(gotDel == want.values.count(_.op == "delete"))
    }
    // full-range increment sees all three batches' winners
    val all = table.readIncrement(spark, 0L)
    assert(all.count() == table.currentSnapshot.batches.map(m => m.upserts + m.deletes).sum)
  }

  test("MOR state invariant to batch split; duplicate batch is a no-op") {
    val p = GenProfile.adversarialOrder().copy(partitions = 2, eventsPerPartition = 1000)
    val binlog = gen(p)
    val want = oracleOf(p)
    val t1 = Ingest.replayBatch(spark, binlog.toString, tmpDir("m1"), 170, nBuckets = 4, mode = Mor)
    val t2 = Ingest.replayBatch(spark, binlog.toString, tmpDir("m2"), 100000, nBuckets = 4, mode = Mor)
    assert(engineState(t1) == want && engineState(t2) == want)
    // duplicate delivery of batch 0
    val before = t1.currentSnapshotId
    Ingest.applyBatch(spark, t1, mode = Mor)(
      graft.binlog.BinlogRead.range(spark, binlog.toString, 0, 170), 0L)
    assert(t1.currentSnapshotId == before)
    assert(engineState(t1) == want)
  }

  test("IngestMetrics listener reports per-batch rows, durations, and marker counts") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1000)
    val binlog = gen(p)
    val root = tmpDir("metrtbl")
    val log = tmpDir("metrlog").resolve("metrics.jsonl")
    val table = LakeTable.create(root, nBuckets = 4)
    val listener = new graft.cdc.IngestMetrics(table, Some(log))
    spark.streams.addListener(listener)
    try {
      val q = Ingest.startStream(spark, binlog.toString, root, tmpDir("metrck").toString,
        maxEventsPerBatch = 600, nBuckets = 4, mode = Mor)
      q.awaitTermination()
      // listener events are async — wait briefly for the last progress event
      val deadline = System.currentTimeMillis() + 10000
      while (listener.batches.count(_.inputRows > 0) < 4 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val ms = listener.batches.filter(_.inputRows > 0)
      assert(ms.size >= 4, s"expected >=4 batches, got $ms")
      assert(ms.map(_.inputRows).sum == 2000)
      assert(ms.forall(m => m.upserts >= 0 && m.deletes >= 0 && m.durationMs > 0))
      val lines = new String(java.nio.file.Files.readAllBytes(log)).trim.split("\n")
      assert(lines.length >= ms.size)
      assert(lines.forall(_.contains("\"total_rows\"")))
    } finally spark.streams.removeListener(listener)
  }

  test("MOR streaming with kill/restart; Maintain.compact folds deltas + GCs tombstones") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1500)
    val binlog = tmpDir("morbl3")
    val root = tmpDir("mortbl3")
    val ckpt = tmpDir("morck").toString
    ChangeEventGen.writeSegments(p.copy(eventsPerPartition = 800), binlog, segmentEvents = 400)
    val q1 = Ingest.startStream(spark, binlog.toString, root, ckpt,
      maxEventsPerBatch = 500, nBuckets = 4, mode = Mor)
    q1.awaitTermination()
    (0 until p.partitions).foreach { part =>
      val w = new graft.binlog.SegmentWriter(binlog, part, 800L)
      (800L until p.eventsPerPartition).foreach(o => w.writeEvent(ChangeEventGen.event(p, part, o)))
      w.close()
    }
    val q2 = Ingest.startStream(spark, binlog.toString, root, ckpt,
      maxEventsPerBatch = 500, nBuckets = 4, mode = Mor)
    q2.awaitTermination()
    val table = LakeTable.load(root)
    val want = oracleOf(p)
    assert(engineState(table) == want)
    // full compaction + tombstone GC: one file per bucket, state preserved
    Maintain.compact(spark, table, dropTombstonesOlderThanMicros = Long.MaxValue)
    assert(table.currentSnapshot.files.groupBy(_.bucket).values.forall(_.size == 1))
    assert(table.readRaw(spark).count() == want.size) // no tombstones, no dups
    assert(engineState(table) == want)
  }
}
