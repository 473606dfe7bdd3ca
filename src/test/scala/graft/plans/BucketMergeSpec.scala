package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.binlog.{BinlogRead, ChangeEventGen, GenProfile}
import graft.cdc.{Cow, Ingest, Merge, Mor}
import graft.lake.LakeTable

/** The co-located COW merge's structural guarantees:
  *  - the TABLE side is read in-place (no Exchange above BucketTableScan) —
  *    only the batch is shuffled, so per-batch shuffle bytes are O(batch)
  *    regardless of table size;
  *  - results are identical to the shuffle (union+max_by) formulation.
  */
class BucketMergeSpec extends SparkSpec {

  private def mkBinlog(n: Int) = {
    val work = tmpDir("bmspec")
    val binlog = work.resolve("binlog")
    ChangeEventGen.writeSegments(
      GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = n), binlog)
    (work, binlog)
  }

  test("table side reads without an Exchange; exactly one Exchange in the merge plan") {
    val (work, binlog) = mkBinlog(1500) // per-partition offsets 0..1499
    val table = LakeTable.create(work.resolve("t1"), nBuckets = 8)
    Ingest.applyBatch(spark, table)(BinlogRead.range(spark, binlog.toString, 0, 750), 0L)

    // capture the second batch's physical plan via the explain hook
    Merge.explainNext = true
    Ingest.applyBatch(spark, table)(BinlogRead.range(spark, binlog.toString, 750, 1500), 1L)
    val plan = Merge.lastPlan
    assert(plan.contains("BucketMerge"), plan.take(2000))
    assert(plan.contains("BucketTableScan"))
    // one Exchange total (the batch side), none between scan and merge
    val exchanges = "(?m)^.*Exchange.*$".r.findAllIn(plan).size
    val planTree = plan.linesIterator.takeWhile(!_.startsWith("(1)")).mkString("\n")
    assert(planTree.split("Exchange").length - 1 == 1,
      s"expected exactly ONE Exchange in the tree:\n$planTree")
    // in the tree rendering the scan must hang directly under BucketMerge
    val scanLine = planTree.linesIterator.find(_.contains("BucketTableScan")).get
    val mergeLine = planTree.linesIterator.find(_.contains("BucketMerge")).get
    assert(planTree.indexOf(mergeLine) < planTree.indexOf(scanLine))
    assert(exchanges >= 1)
  }

  test("co-located merge state == shuffle-merge state, including tombstones and seq columns") {
    val (work, binlog) = mkBinlog(2000)

    def replay(root: java.nio.file.Path, colocated: Boolean) = {
      Merge.useColocatedCow = colocated
      try {
        val t = LakeTable.create(root, nBuckets = 8)
        var b = 0L
        (0L until 2000L by 500L).foreach { from =>
          Ingest.applyBatch(spark, t)(
            BinlogRead.range(spark, binlog.toString, from, from + 500), b)
          b += 1
        }
        t.readRaw(spark)
          .select(col("url"), unix_micros(col("warc_ts")).as("ts"), col("text"),
            col("content_len"), col("_seq_part"), col("_seq_offset"), col("_deleted"))
          .collect().map(_.toString).sorted
      } finally Merge.useColocatedCow = true
    }

    val co = replay(work.resolve("co"), colocated = true)
    val sh = replay(work.resolve("sh"), colocated = false)
    assert(co.length == sh.length)
    assert(co.sameElements(sh))
  }

  test("COW apply over MOR delta history k-way folds cross-file LWW (no duplicates)") {
    val (work, binlog) = mkBinlog(1500)

    def replay(root: java.nio.file.Path, colocated: Boolean) = {
      Merge.useColocatedCow = colocated
      try {
        val t = LakeTable.create(root, nBuckets = 4)
        // two MOR batches leave multi-file buckets (delta history) …
        Ingest.applyBatch(spark, t, mode = Mor)(BinlogRead.range(spark, binlog.toString, 0, 500), 0L)
        Ingest.applyBatch(spark, t, mode = Mor)(BinlogRead.range(spark, binlog.toString, 500, 1000), 1L)
        // … then a COW batch on overlapping urls must LWW-fold those files,
        // not concatenate them (concat wrote duplicate urls with stale
        // versions into the rewritten single-file bucket, which then skips
        // resolve-on-read and exposes them to every reader)
        Ingest.applyBatch(spark, t, mode = Cow)(BinlogRead.range(spark, binlog.toString, 1000, 1500), 2L)
        t.readRaw(spark)
          .select(col("url"), unix_micros(col("warc_ts")).as("ts"), col("text"),
            col("content_len"), col("_seq_part"), col("_seq_offset"), col("_deleted"))
          .collect().map(_.toString).sorted
      } finally Merge.useColocatedCow = true
    }

    val co = replay(work.resolve("co"), colocated = true)
    val urls = co.map(_.takeWhile(_ != ','))
    assert(urls.length == urls.distinct.length, "duplicate urls after COW over MOR history")
    val sh = replay(work.resolve("sh"), colocated = false)
    assert(co.sameElements(sh))
  }

  test("single hot bucket with many distinct urls completes (no per-bucket memory ceiling)") {
    // nBuckets=1 forces every url through one task: the old hash-map resolve
    // had an admission bound here; the sorted-merge resolve is O(1) state
    // with Spark's own spillable sort on the batch side.
    val (work, binlog) = mkBinlog(3000)
    val t = LakeTable.create(work.resolve("hot"), nBuckets = 1)
    Ingest.applyBatch(spark, t)(BinlogRead.range(spark, binlog.toString, 0, 1500), 0L)
    Ingest.applyBatch(spark, t)(BinlogRead.range(spark, binlog.toString, 1500, 3000), 1L)
    val t2 = LakeTable.create(work.resolve("wide"), nBuckets = 8)
    Ingest.applyBatch(spark, t2)(BinlogRead.range(spark, binlog.toString, 0, 1500), 0L)
    Ingest.applyBatch(spark, t2)(BinlogRead.range(spark, binlog.toString, 1500, 3000), 1L)
    val a = t.readRaw(spark).select("url", "warc_ts", "_seq_offset", "_deleted")
      .collect().map(_.toString).sorted
    val b = t2.readRaw(spark).select("url", "warc_ts", "_seq_offset", "_deleted")
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("tie on (warc_ts, offset, partition) keeps stored row; strict winner replaces") {
    val (work, binlog) = mkBinlog(500)
    val t = LakeTable.create(work.resolve("t3"), nBuckets = 4)
    Ingest.applyBatch(spark, t)(BinlogRead.range(spark, binlog.toString, 0, 500), 0L)
    val before = t.readRaw(spark).select("url", "warc_ts", "_seq_offset").collect()
    // re-apply the SAME offset range under a NEW batch id: every event ties
    // with its stored self → final state must be unchanged
    Ingest.applyBatch(spark, t)(BinlogRead.range(spark, binlog.toString, 0, 500), 1L)
    val after = t.readRaw(spark).select("url", "warc_ts", "_seq_offset").collect()
    assert(before.map(_.toString).sorted.sameElements(after.map(_.toString).sorted))
  }
}
