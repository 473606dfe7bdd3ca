package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.binlog.{BinlogRead, ChangeEventGen, GenProfile}
import graft.cdc.{Ingest, Merge}
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
