package graft

import org.apache.spark.sql.SparkSession

import graft.app.BenchUtil

/** Per-round benchmark: headline queries on SPARK_GRAFT_SF_DIR plus a timed
  * CDC ingest of a deterministic skewed binlog. Prints ONE JSON line.
  *
  * Measurement discipline (round-2 lesson: a one-shot, cold, last-in-JVM
  * ingest run was 3–4× its reproducible value and corrupted the only
  * cross-round perf signal):
  *  - a small warmup ingest JITs the whole pipeline before anything is timed;
  *  - the ingest headline and the three merge queries are best-of-2 — the
  *    reproducible number, not the GC-noise envelope;
  *  - steady-state multi-batch COW and MOR ingests (the CowAB shape) are
  *    reported so the per-batch O(batch) merge cost is visible in round
  *    diffs; their attempts alternate modes across the window, best-of-3
  *    per mode (drift-resistant — the ScalingBench protocol).
  *
  * Env knobs: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS
  * (default 32), GRAFT_BENCH_EVENTS (default 1,000,000 CDC events).
  */
object Bench {
  // headline queries: the scale-relevant subset (skip tiny-dimension ones)
  private val headline = Seq(
    "cdc_merge_final_state", "cdc_merge_final_state_mor", "cdc_sql_merge",
    "cdc_latest_per_key",
    "cdc_dedup_salted", "cdc_window_tumbling", "cdc_flush_windows",
    "q1_pricing", "q3_shipping", "q_semi_join",
    "w_topn_per_group", "doc_exact_dedup", "doc_minhash_neardup",
    "doc_ngram_neardup", "doc_simhash_neardup", "doc_quality", "doc_langid",
    "doc_minhash_incremental", "emb_cosine_topk", "emb_lsh_pairs",
    "emb_ivf_topk", "emb_ivf_incremental", "mm_features")

  // merge queries build + merge a table per run: GC/page-cache sensitive, so
  // they get the same best-of-2 treatment as the ingest headline
  private val bestOf2 = Set(
    "cdc_merge_final_state", "cdc_merge_final_state_mor", "cdc_sql_merge")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString).toInt
    val cdcEvents = sys.env.getOrElse("GRAFT_BENCH_EVENTS", "1000000").toLong
    val spark = BenchUtil.newSession(cpus, shufflePartitions = cpus)

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime()
      f
      (System.nanoTime() - t0) / 1e9
    }

    // warmup: a small end-to-end ingest JITs codec, source, merge and commit
    // paths before ANY timed work (ScalingBench pattern)
    val warmDir = BenchUtil.ensureBinlog(BenchUtil.skewedProfile(40000L))
    BenchUtil.timedIngest(spark, warmDir, 20000L, 16)

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    headline.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = try time(fn(spark, sfDir).count())
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1.0 }
      // min over SUCCESSFUL runs only: a transient failure (-1) must not
      // discard the other run's valid measurement
      val sec = if (bestOf2(name)) Seq(once(), once()).filter(_ >= 0).minOption.getOrElse(-1.0)
      else once()
      results(name) = sec
    }

    // CDC ingest throughput (the north-star metric, at this parallelism).
    // FULL-SIZE untimed warmup first: this host's cold window is measured in
    // WHOLE 1M-event runs, not JIT time — back-to-back probes of identical
    // code ran 186 s → 56 s → 23.4 s (round-4 diagnosis; the small warmup
    // above tames JIT but not the first big run), so one full-profile run
    // is burned before ANY large metric is timed, and the timed metrics are
    // best-of-2.
    val profile = BenchUtil.skewedProfile(cdcEvents)
    val binlog = BenchUtil.ensureBinlog(profile)
    def ingestOnce(): (Long, Double, Double) = BenchUtil.timedIngest(spark, binlog,
      maxEventsPerBatch = math.max(250000L, cdcEvents / 8), nBuckets = 64)
    ingestOnce(): Unit // full-size warmup — discarded
    val (ev, ingestSec, eps) = Seq(ingestOnce(), ingestOnce()).minBy(_._2)
    results("cdc_ingest_1m") = ingestSec

    // steady-state COW + MOR: 16 growing-table batches each (per-batch cost
    // must stay O(batch), independent of table size — the co-located merge
    // invariant; MOR is the DECLARED 10^10-scale path whose number must stay
    // flat as the table grows). The two modes' attempts ALTERNATE across the
    // measurement window, best-of-3 per mode — the ScalingBench discipline:
    // shared-host noise only ever SLOWS a run, so the per-mode best
    // approaches the quiet-host capability, and alternation keeps one bad
    // stretch from eating every attempt of one mode (observed: back-to-back
    // best-of-2 scored steady COW 94.8 s in a window where an adjacent run
    // measured 36.9 s).
    val steadyBatch = math.max(1L, cdcEvents / 8 / 16) // per-partition units
    val steadyAttempts = (1 to 3).flatMap(_ =>
      Seq(graft.cdc.Cow, graft.cdc.Mor).map(m =>
        m -> steadyReplay(spark, binlog, steadyBatch, m)))
    val (sev, ssec, seps) = steadyAttempts.collect { case (graft.cdc.Cow, r) => r }.minBy(_._2)
    results("cdc_steady_cow_16b") = ssec
    val (mev, msec, meps) = steadyAttempts.collect { case (graft.cdc.Mor, r) => r }.minBy(_._2)
    results("cdc_steady_mor_16b") = msec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"cdc_events":$ev,"cdc_eps":${f"$eps%.0f"},"steady_events":$sev,"steady_eps":${f"$seps%.0f"},"steady_mor_events":$mev,"steady_mor_eps":${f"$meps%.0f"}}""")
    spark.stop()
  }

  /** 16-batch growing-table replay (the CowAB shape, single run). */
  private def steadyReplay(spark: SparkSession, binlog: java.nio.file.Path,
      eventsPerBatch: Long, mode: graft.cdc.MergeMode): (Long, Double, Double) = {
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(BenchUtil.scratch), "steady")
    val t0 = System.nanoTime()
    val table = graft.cdc.Ingest.replayBatch(spark, binlog.toString,
      work.resolve("table"), eventsPerBatch = eventsPerBatch, nBuckets = 64,
      mode = mode)
    val events = table.currentSnapshot.batches.flatMap(_.lineage).map(_.count).sum
    val sec = (System.nanoTime() - t0) / 1e9
    graft.lake.SinkIO.rmDir(work)
    (events, sec, events / sec)
  }
}
