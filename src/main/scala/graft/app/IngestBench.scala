package graft.app

/** Single-parallelism timed CDC ingest (fresh table each rep, same cached
  * binlog), best-of-N — the quick A/B harness for ingest-path knobs
  * (GRAFT_PARQUET_CODEC, GRAFT_PARQUET_DICT, GRAFT_SHUFFLE_COMPRESS,
  * GRAFT_MERGE_MODE). The graded two-level scaling evidence lives in
  * [[ScalingBench]]; this main is one level only.
  *
  * Usage: runMain graft.app.IngestBench <totalEvents> <cores> [reps]
  */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val total = args(0).toLong
    val cores = args(1).toInt
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val binlog = BenchUtil.ensureBinlog(BenchUtil.skewedProfile(total))
    val maxBatch = math.max(250000L, total / 4)

    val spark = BenchUtil.newSession(cores, shufflePartitions = cores)
    val warmDir = BenchUtil.ensureBinlog(BenchUtil.skewedProfile(400000L))
    BenchUtil.timedIngest(spark, warmDir, 100000L, 64)

    val runs = (1 to reps).map { i =>
      val (ev, sec, eps) = BenchUtil.timedIngest(spark, binlog, maxBatch, 64)
      System.err.println(f"[ingest] local[$cores] rep $i: $ev events in $sec%.1f s = $eps%.0f ev/s")
      (ev, sec, eps)
    }
    val best = runs.maxBy(_._3)
    println(
      s"""{"metric":"ingest_eps","cores":$cores,"events":${best._1},"best_sec":${f"${best._2}%.2f"},""" +
        s""""best_eps":${f"${best._3}%.0f"},"reps":$reps,"max_batch":$maxBatch}""")
    spark.stop()
  }
}
