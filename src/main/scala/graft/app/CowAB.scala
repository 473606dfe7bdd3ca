package graft.app

/** A/B the COW merge formulations at steady state: co-located BucketMergeExec
  * vs the round-1 union+max_by shuffle. Env: GRAFT_AB_EVENTS (default 2M),
  * GRAFT_AB_CORES (default 16). GRAFT_TIMING=1 prints per-batch timings. */
object CowAB {
  def main(args: Array[String]): Unit = {
    val events = sys.env.getOrElse("GRAFT_AB_EVENTS", "2000000").toLong
    val cores = sys.env.getOrElse("GRAFT_AB_CORES", "16").toInt
    val spark = BenchUtil.newSession(cores, shufflePartitions = cores)
    val binlog = BenchUtil.ensureBinlog(BenchUtil.skewedProfile(events))
    // replayBatch slices in PER-PARTITION offset units; 16 steady-state
    // batches over 8 partitions
    val batch = math.max(1L, events / 8 / 16)

    // shuffle-bytes listener: wall clock on tmpfs-local shuffle understates
    // the co-location win (no network, no disk); bytes moved per run is the
    // quantity that becomes the bottleneck on a real cluster.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
      }
    })

    def run(colocated: Boolean): (Double, Long) = {
      graft.cdc.Merge.useColocatedCow = colocated
      // drain the async listener bus around the reset AND the read — late
      // task-end events from the previous run must not bleed into this one
      org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark)
      shuffleBytes.set(0L)
      val (_, sec, eps) = timedCow(spark, binlog, batch)
      org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark)
      val sb = shuffleBytes.get()
      System.err.println(f"[cow-ab] colocated=$colocated $sec%.1f s  $eps%.0f ev/s  shuffle=${sb / 1e6}%.0f MB")
      (eps, sb)
    }

    // warm once (JIT, page cache), then measure each twice, report best
    run(colocated = true)
    val co = Seq(run(true), run(true)).maxBy(_._1)
    val sh = Seq(run(false), run(false)).maxBy(_._1)
    println(f"""{"cow_ab":{"colocated_eps":${co._1}%.0f,"shuffle_eps":${sh._1}%.0f,"speedup":${co._1 / sh._1}%.2f,"colocated_shuffle_mb":${co._2 / 1e6}%.0f,"shuffle_shuffle_mb":${sh._2 / 1e6}%.0f}}""")
    spark.stop()
  }

  private def timedCow(spark: org.apache.spark.sql.SparkSession,
      binlog: java.nio.file.Path, batch: Long): (Long, Double, Double) = {
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(BenchUtil.scratch), "cowab")
    val t0 = System.nanoTime()
    val table = graft.cdc.Ingest.replayBatch(spark, binlog.toString, work.resolve("table"),
      eventsPerBatch = batch, nBuckets = 64, mode = graft.cdc.Cow)
    val events = table.currentSnapshot.batches.flatMap(_.lineage).map(_.count).sum
    val sec = (System.nanoTime() - t0) / 1e9
    def rm(p: java.nio.file.Path): Unit = {
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.forEach(rm) finally s.close()
      }
      java.nio.file.Files.deleteIfExists(p)
    }
    rm(work)
    (events, sec, events / sec)
  }
}
