package graft.app

import graft.binlog.GenProfile

/** Print the physical plan of one late-materialized MOR merge (plan audit —
  * the PlanCheck pattern): expect ONE meta exchange (reused by both
  * consumers), a BroadcastHashJoin LeftSemi admitting winner payloads, ONE
  * payload exchange, and a co-partitioned attach join with NO further
  * exchange. */
object LateMatPlan {
  def main(args: Array[String]): Unit = {
    val spark = BenchUtil.newSession(8, shufflePartitions = 8)
    val p = GenProfile.skewed(seed = 42L, partitions = 2, perPartition = 5000)
    val binlog = BenchUtil.ensureBinlog(p)
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(BenchUtil.scratch), "lmplan")
    graft.cdc.Merge.lateMaterialize = true
    graft.cdc.Merge.explainNext = true
    graft.cdc.Ingest.replayBatch(spark, binlog.toString, work.resolve("table"),
      eventsPerBatch = 5000, nBuckets = 8, mode = graft.cdc.Mor)
    graft.cdc.Merge.lateMaterialize = false
    // bitmap admission: events/8 bytes, never O(winners × 16 B)
    println(s"[latemat-plan] admitBitmapBytes=${graft.cdc.Merge.lastAdmitBitmapBytes} (events=10000 -> ${10000 / 8} expected ceiling)")
    graft.lake.SinkIO.rmDir(work)
    spark.stop()
  }
}
