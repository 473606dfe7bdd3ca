package graft.app

import org.apache.spark.sql.functions._

import graft.ops.LshIndex

/** Cost evidence for the LSH index GC path ([[graft.ops.LshIndex.rebuild]]):
  * incremental appends are O(batch) — flat per-increment cost as the index
  * grows — while the GC rebuild is O(corpus) by design (the periodic price
  * of an append-only index). Also shows the GC actually reclaiming space:
  * a re-indexed span's stale duplicate rows are dropped by the rebuild
  * (rows and on-disk bytes shrink back to the live corpus's).
  *
  * Env: GRAFT_AB_SF_DIR (default /root/testdata/sf0.01). */
object GcRebuildAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_AB_SF_DIR", "/root/testdata/sf0.01")
    val spark = BenchUtil.newSession(8, shufflePartitions = 8)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).cache()
    val n = docs.count()

    import BenchUtil.dirBytes
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(BenchUtil.scratch), "gcab")
    val idx = work.resolve("index")
    LshIndex.create(idx, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 16))

    // warm the whole path once (JIT + codec init) on a small slice
    val warm = work.resolve("warm-idx")
    LshIndex.create(warm, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 16))
    LshIndex.probeAndAppend(spark, docs.limit(200), "text", "doc_id",
      warm, span = Some("w")).count(): Unit

    // 4 increments: per-increment cost must stay flat as the index grows
    println(s"[gc-ab] corpus=$n docs ($sfDir)")
    (0 until 4).foreach { b =>
      val batch = docs.filter(pmod(col("doc_id"), lit(4)) === b)
      val (_, sec) = time {
        LshIndex.probeAndAppend(spark, batch, "text", "doc_id", idx,
          span = Some(s"$b-${b + 1}")).count()
      }
      println(f"[gc-ab] increment $b: probe+append ${sec}%.2f s")
    }

    // staleness: re-index one quarter under a later span (the shape updates
    // produce — same urls, second signature rows)
    LshIndex.append(docs.filter(pmod(col("doc_id"), lit(4)) === 0),
      "text", "doc_id", idx, span = Some("4-5")): Unit
    val bands = idx.resolve("bands")
    val rowsBefore = spark.read.parquet(bands.toString).count()
    val bytesBefore = dirBytes(idx)

    val (_, rebuildSec) = time(LshIndex.rebuild(spark, docs, "text", "doc_id", idx))
    val rowsAfter = spark.read.parquet(bands.toString).count()
    val bytesAfter = dirBytes(idx)
    println(f"[gc-ab] rebuild: ${rebuildSec}%.2f s over $n docs (O(corpus) by design)")
    println(f"[gc-ab] rows $rowsBefore -> $rowsAfter, bytes $bytesBefore -> $bytesAfter " +
      f"(${bytesBefore.toDouble / bytesAfter}%.2fx reclaimed)")
    graft.lake.SinkIO.rmDir(work)
    spark.stop()
  }
}
