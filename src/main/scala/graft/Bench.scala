package graft

import org.apache.spark.sql.SparkSession

import graft.app.BenchUtil

/** Per-round benchmark: headline queries on SPARK_GRAFT_SF_DIR plus a timed
  * CDC ingest of a deterministic skewed binlog. Prints ONE JSON line.
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
    "emb_cosine_topk", "emb_lsh_pairs", "emb_ivf_topk", "mm_features")

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

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    headline.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm once at small scale to exclude first-query JIT noise? No — each
      // query timed cold-ish, matching how the driver compares rounds.
      val sec = try time(fn(spark, sfDir).count())
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); -1.0 }
      results(name) = sec
    }

    // CDC ingest throughput (the north-star metric, at this parallelism)
    val profile = BenchUtil.skewedProfile(cdcEvents)
    val binlog = BenchUtil.ensureBinlog(profile)
    val (ev, ingestSec, eps) = BenchUtil.timedIngest(spark, binlog,
      maxEventsPerBatch = math.max(250000L, cdcEvents / 8), nBuckets = 64)
    results("cdc_ingest_1m") = ingestSec

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,"sf":"$sfDir","cpus":$cpus,"cdc_events":$ev,"cdc_eps":${f"$eps%.0f"}}""")
    spark.stop()
  }
}
