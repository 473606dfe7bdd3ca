package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time prune A/B: the manifest's per-file warc_ts bounds + parquet
  * row-group skipping vs the SAME predicate with pushdown defeated (wrapped
  * in `unix_micros(...)`, which no source filter matches) — identical
  * semantics, so the delta is pure scan-cost saved by the prune.
  *
  * Table shape: 16 MOR era-batches of the skewed 1M-event binlog with
  * compaction disabled, so each bucket holds 16 delta files with nearly
  * disjoint time ranges — the binlog reality (warc_ts tracks offset) the
  * prune is designed for. Cuts at the last 1/2, 1/4 and 1/16 of the time
  * range. The LWW-resolved read prunes on the LOWER bound only (the only
  * direction that commutes with winner resolution — TimeFilterSpec).
  *
  * Env: GRAFT_TPRUNE_EVENTS (default 1M), GRAFT_TPRUNE_CORES (16). */
object TimePruneAB {
  def main(args: Array[String]): Unit = {
    val events = sys.env.getOrElse("GRAFT_TPRUNE_EVENTS", "1000000").toLong
    val cores = sys.env.getOrElse("GRAFT_TPRUNE_CORES", "16").toInt
    val spark = BenchUtil.newSession(cores, shufflePartitions = cores)
    val binlog = BenchUtil.ensureBinlog(BenchUtil.skewedProfile(events))
    val perPart = events / 8
    val batches = 16
    val step = math.max(1L, perPart / batches)

    val saved = graft.cdc.Merge.MaxFilesPerBucket
    graft.cdc.Merge.MaxFilesPerBucket = Int.MaxValue // keep the eras distinct
    try {
      val work = Files.createTempDirectory(Paths.get(BenchUtil.scratch), "tprune")
      val table = graft.lake.LakeTable.create(work.resolve("t"), nBuckets = 64)
      var b = 0L
      var from = 0L
      while (from < perPart) {
        graft.cdc.Ingest.applyBatch(spark, table, mode = graft.cdc.Mor)(
          graft.binlog.BinlogRead.range(spark, binlog.toString, from, from + step), b)
        b += 1; from += step
      }
      val snap = table.currentSnapshot
      val lo = snap.files.map(_.tsMinMicros).min
      val hi = snap.files.map(_.tsMaxMicros).max
      require(lo != graft.lake.DataFile.NoTsMin && hi != graft.lake.DataFile.NoTsMax,
        "manifest carries no ts bounds — INT96 regression?")

      def filesScanned(df: DataFrame): Int =
        df.queryExecution.executedPlan.collectLeaves().collectFirst {
          case s: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
            s.inputPartitions.collect {
              case p: graft.sql.GraftBucketPartition => p.files.size
            }.sum
        }.getOrElse(-1)
      def once(df: DataFrame): Double = {
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }

      // build every variant, warm ALL of them (the host's cold window spans
      // whole runs — Bench lesson), then ALTERNATE timed attempts so one bad
      // stretch can't eat every attempt of one variant; best-of-3 per variant
      val cases = Seq(0.5, 0.75, 15.0 / 16).map { frac =>
        val cutMicros = lo + ((hi - lo) * frac).toLong
        val cut = new java.sql.Timestamp(cutMicros / 1000)
        cut.setNanos(((cutMicros % 1000000L) * 1000L).toInt)
        val pruned = table.read(spark).filter(col("warc_ts") >= lit(cut))
        // pushdown defeated: same rows, every file read
        val control = table.read(spark).filter(unix_micros(col("warc_ts")) >= cutMicros)
        require(pruned.count() == control.count(), "A/B semantics diverged")
        (frac, pruned, control)
      }
      cases.foreach { case (_, p, c) => once(p); once(c): Unit }
      val timings = (1 to 3).map { _ =>
        cases.map { case (_, p, c) => (once(p), once(c)) }
      }
      val out = cases.zipWithIndex.map { case ((frac, pruned, control), i) =>
        val sa = timings.map(_(i)._1).min
        val sb = timings.map(_(i)._2).min
        val (fa, fb) = (filesScanned(pruned), filesScanned(control))
        System.err.println(f"[tprune] keepLast=${1 - frac}%.4f files $fa/$fb " +
          f"pruned=$sa%.2f s control=$sb%.2f s (${sb / sa}%.1fx)")
        f"""{"keep_last_frac":${1 - frac}%.4f,"files_pruned":$fa,"files_all":$fb,"pruned_sec":$sa%.3f,"control_sec":$sb%.3f}"""
      }
      println(s"""{"time_prune_ab":${out.mkString("[", ",", "]")}}""")
      graft.lake.SinkIO.rmDir(work)
    } finally graft.cdc.Merge.MaxFilesPerBucket = saved
    spark.stop()
  }
}
