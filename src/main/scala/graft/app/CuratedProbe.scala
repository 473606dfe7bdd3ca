package graft.app

/** Per-batch cost attribution for the one-call curated stream: runs a
  * 16-batch curated replay (the `cdc_curated_16b` shape) with GRAFT_TIMING
  * breakdowns — merge vs lsh/probe vs lsh/append — so the curated metric's
  * delta over plain MOR is attributable, not a blob. Args: [events]. */
object CuratedProbe {
  def main(args: Array[String]): Unit = {
    val events = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = BenchUtil.newSession(cpus, shufflePartitions = cpus)
    val binlog = BenchUtil.ensureBinlog(BenchUtil.skewedProfile(events))
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(BenchUtil.scratch), "curprobe")
    val idx = work.resolve("lsh")
    graft.ops.LshIndex.create(idx,
      graft.ops.LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 16))
    val t0 = System.nanoTime()
    val q = graft.ops.Curate.startCuratedStream(spark, binlog.toString,
      work.resolve("table"), work.resolve("ckpt").toString, idx,
      maxEventsPerBatch = math.max(1L, events / 16), nBuckets = 64,
      mode = graft.cdc.Mor)
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    val applied = graft.lake.LakeTable.load(work.resolve("table"))
      .currentSnapshot.batches.flatMap(_.lineage).map(_.count).sum
    println(f"""{"curated_probe":{"events":$applied,"sec":$sec%.2f,"eps":${applied / sec}%.0f}}""")
    graft.lake.SinkIO.rmDir(work)
    spark.stop()
  }
}
