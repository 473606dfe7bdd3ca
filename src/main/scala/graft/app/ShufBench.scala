package graft.app
import org.apache.spark.sql.functions._
/** Hardware/runtime-ceiling microbench: a minimal Spark shuffle+agg job with
  * NO engine code, run at each parallelism level to measure what this host +
  * Spark local mode can scale at all (memory bandwidth, GC, local-mode
  * contention). scripts/scaling_bench.sh divides the engine's efficiency by
  * this ceiling to isolate engine-added serial cost. */
object ShufBench {

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val spark = BenchUtil.newSession(cores, cores)
    import spark.implicits._
    // ~1KB payload rows, shuffle + sort + agg — the merge-write shape
    val n = 12000000L
    val df = spark.range(n).select(col("id"),
      concat_ws("", (0 until 16).map(i => md5((col("id") + i).cast("string"))): _*).as("payload"))
    def run(): Double = {
      val t0 = System.nanoTime()
      df.repartition(64, col("id")).groupBy(col("id") % 500000)
        .agg(max(struct(col("payload"), col("id"))).as("w")).count()
      (System.nanoTime() - t0) / 1e9
    }
    run() // warm
    val best = (1 to 3).map(_ => run()).min
    println(f"[shuf] cores=$cores n=$n best=$best%.1f s rate=${n/best}%.0f rows/s")
    spark.stop()
  }
}
