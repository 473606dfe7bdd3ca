package graft.app

import java.nio.file.{Files, Paths}

/** A/B the storage-partitioned join against the shuffled join it replaces:
  * two graft tables ingested from the same binlog (same 64-bucket layout),
  * joined on url with `spark.sql.sources.v2.bucketing.enabled` on vs off.
  * Wall clock on tmpfs-local shuffle understates the win (no network, no
  * disk) — shuffle BYTES moved is the quantity that becomes the bottleneck
  * on a real cluster, and SPJ's is zero by construction.
  * Env: GRAFT_AB_EVENTS (default 2M), GRAFT_AB_CORES (default 16). */
object SpjAB {
  def main(args: Array[String]): Unit = {
    val events = sys.env.getOrElse("GRAFT_AB_EVENTS", "2000000").toLong
    val cores = sys.env.getOrElse("GRAFT_AB_CORES", "16").toInt
    val spark = BenchUtil.newSession(cores, shufflePartitions = cores)
    val binlog = BenchUtil.ensureBinlog(BenchUtil.skewedProfile(events))

    val wh = Files.createTempDirectory(Paths.get(BenchUtil.scratch), "spjab-wh")
    graft.sql.GraftSql.enable(spark, wh.toString)
    // two independent tables in the catalog warehouse, same bucket layout
    for (name <- Seq("spja", "spjb"))
      graft.cdc.Ingest.replayBatch(spark, binlog.toString, wh.resolve(name),
        eventsPerBatch = math.max(250000L, events / 4), nBuckets = 64,
        mode = graft.cdc.Cow)

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten): Unit
      }
    })

    // the audit join: full-width equality on url plus a payload-bearing
    // aggregate, so both sides read real columns (not a key-only probe)
    val joinSql =
      """SELECT count(*) AS n, sum(length(a.text) + length(b.text)) AS s
        |FROM graft.spja a JOIN graft.spjb b ON a.url = b.url""".stripMargin
    val aggSql =
      """SELECT max(c) AS m FROM (
        |  SELECT url, count(*) AS c FROM graft.spja GROUP BY url)""".stripMargin

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    def run(spj: Boolean, sql: String): (Double, Long) = {
      spark.conf.set("spark.sql.sources.v2.bucketing.enabled", spj.toString)
      spark.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", spj.toString)
      // drain the async listener bus around BOTH the reset and the read:
      // a previous run's late task-end events must not bleed into this
      // run's byte count (nor this run's trail be missed)
      org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark)
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      spark.sql(sql).collect(): Unit
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.GraftBridge.waitListenerBusEmpty(spark)
      (sec, shuffleBytes.get())
    }

    def best(spj: Boolean, sql: String, label: String): (Double, Long) = {
      run(spj, sql): Unit // warm
      val r = Seq(run(spj, sql), run(spj, sql)).minBy(_._1)
      System.err.println(f"[spj-ab] $label spj=$spj ${r._1}%.2f s  shuffle=${r._2 / 1e6}%.1f MB")
      r
    }

    val jOn = best(spj = true, joinSql, "join")
    val jOff = best(spj = false, joinSql, "join")
    val gOn = best(spj = true, aggSql, "groupBy")
    val gOff = best(spj = false, aggSql, "groupBy")
    println(f"""{"spj_ab":{"join_spj_sec":${jOn._1}%.2f,"join_shuffled_sec":${jOff._1}%.2f,"join_speedup":${jOff._1 / jOn._1}%.2f,"join_spj_shuffle_mb":${jOn._2 / 1e6}%.1f,"join_shuffled_shuffle_mb":${jOff._2 / 1e6}%.1f,"agg_spj_sec":${gOn._1}%.2f,"agg_shuffled_sec":${gOff._1}%.2f,"agg_spj_shuffle_mb":${gOn._2 / 1e6}%.1f,"agg_shuffled_shuffle_mb":${gOff._2 / 1e6}%.1f}}""")
    spark.stop()
  }
}
