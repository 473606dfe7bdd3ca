package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-deduplication operators for training-data pipelines.
  *
  * Scale design notes (100 TB):
  *  - exact dedup is a hash-aggregate on a fingerprint — map-side partial
  *    aggregation collapses duplicates before the shuffle;
  *  - MinHash-LSH never materializes the O(n²) pair space: candidates come
  *    from an equi-join on (band, bucket) keys, so shuffle volume is
  *    O(n · bands), and verification runs only on candidates;
  *  - all hashes are portable MD5/xxhash64 expressions — no UDFs, fully
  *    codegen'd, identical plan on every executor.
  */
object DedupOps {

  /** Exact dedup: canonical doc per identical (normalized) text. */
  def exactGroups(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.groupBy(TextOps.fingerprintMd5(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("canonical_id"))

  /** One MinHash value: min over shingles of md5(seed_i ++ shingle).
    * Using the md5 hex string itself as the hash domain keeps it portable to
    * the SQL oracle; min over a uniform hash is a valid permutation proxy. */
  def minhash(shinglesCol: Column, seed: Int): Column =
    array_min(transform(shinglesCol, s => md5(to_binary(concat(lit(seed.toString), lit("|"), s), lit("utf-8")))))

  /** MinHash signature as k columns named mh0..mh{k-1}.
    *
    * ONE native tokenize+shingle+hash pass (`NativeKernels.minhashUTF8`) —
    * the round-1 `aggregate`-HOF fold was interpreted (CodegenFallback);
    * the hash domain (hex md5 of `"i|" ++ shingle`) is unchanged, so the
    * DuckDB oracles grade it bit-for-bit. mh columns are null for docs with
    * fewer than n tokens, as before. */
  def withMinhashes(docs: DataFrame, textCol: String, n: Int, k: Int): DataFrame = {
    val withSig = docs.withColumn("_sig",
      graft.functions.NativeFns.minhashSig(col(textCol), n, k))
    (0 until k).foldLeft(withSig) { (d, i) =>
      d.withColumn(s"mh$i", element_at(col("_sig"), i + 1))
    }.drop("_sig")
  }

  /** MinHash-LSH candidate pairs: band the k minhashes into `bands` groups
    * of `rowsPerBand`, bucket-join on (band, md5(band minhashes)), emit
    * candidate (id1 < id2) pairs, then verify with EXACT n-gram Jaccard.
    * Returns pairs with jaccard ≥ threshold.
    *
    * `maxBucketSize` caps band-bucket membership (viral-boilerplate
    * defense): a bucket holding > cap docs would emit O(cap²) candidate
    * pairs, so oversized buckets are DROPPED from candidate generation —
    * their members still pair through their other `bands−1` band keys when
    * genuinely similar. The windowed count shares the self-join's
    * (band,bucket) hash partitioning — no extra shuffle. 0 disables. */
  def minhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 2,
      threshold: Double = 0.6, maxBucketSize: Int = 1000): DataFrame = {
    val bandKeys0 = bandKeysOf(docs, textCol, idCol, n, bands, rowsPerBand)
    val bandKeys = capBuckets(bandKeys0, Seq("band", "bucket"), maxBucketSize)
    val a = bandKeys.alias("a")
    val b = bandKeys.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"))
      .distinct()
    verifyJaccard(candidates, docs, textCol, idCol, n, threshold)
  }

  /** LSH band keys: one row per (doc, band) with the band's bucket hash. */
  private def bandKeysOf(docs: DataFrame, textCol: String, idCol: String,
      n: Int, bands: Int, rowsPerBand: Int): DataFrame = {
    val k = bands * rowsPerBand
    val sigs = withMinhashes(docs.select(col(idCol).as("id"), col(textCol).as("txt")), "txt", n, k)
    sigs.select(
      col("id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(to_binary(concat_ws("|", (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*), lit("utf-8"))).as("bucket"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
  }

  /** Caps derived from the corpus itself (see [[tuneCaps]]). */
  final case class TunedCaps(maxBucketSize: Int, maxDf: Int)

  /** Sample-quantile → full-corpus cap: quantile × headroom in the sample
    * domain (floor applied there too), scaled by 1/sampleFraction — a hot
    * key's count grows linearly with corpus size while the p≪hot quantile
    * tracks the normal population. ONE formula for every tuned cap
    * (bucket sizes, shingle dfs): a future correction applies everywhere. */
  private def scaleCap(q: Double, headroom: Double, floorCap: Int, f: Double): Int =
    math.ceil(math.max(floorCap.toDouble, math.ceil(q * headroom)) / f).toInt

  /** Derive `maxBucketSize` / `maxDf` from a corpus SAMPLE instead of fixed
    * defaults: a high quantile of the observed band-bucket-size and
    * shingle-df distributions, a headroom factor so genuine near-dup
    * clusters clear the cap, then scaled by `1/sampleFraction` — a
    * boilerplate bucket's membership grows linearly with corpus size, so
    * the sample quantile under-states the full-corpus bucket by exactly the
    * sampling rate, while the quantile itself (taken at p≪hot) tracks the
    * NORMAL population.
    *
    * Scale: ONE pass over an (e.g. 1%) sample; only two approximate
    * quantiles cross to the driver. At 10⁹ docs a 1% sample still holds
    * every pathological bucket at ~1% of its true size — far above the
    * normal-population quantile — so the derived cap separates the two
    * populations the same way it does at test scale. */
  def tuneCaps(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, bands: Int = 4, rowsPerBand: Int = 2,
      sampleFraction: Double = 0.01, seed: Long = 42L,
      quantile: Double = 0.99, headroom: Double = 4.0,
      floorCap: Int = 16): TunedCaps = {
    val f = math.min(1.0, sampleFraction)
    val sample = (if (f >= 1.0) docs else docs.sample(withReplacement = false, f, seed))
      .select(col(idCol), col(textCol)).persist()
    try {
      val keys = bandKeysOf(sample, textCol, idCol, n, bands, rowsPerBand)
      val qb = keys.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("size"))
        .stat.approxQuantile("size", Array(quantile), 0.001).headOption.getOrElse(1.0)
      val maxBucket = scaleCap(qb, headroom, floorCap, f)
      val qd = sample
        .select(explode(array_distinct(TextOps.shingles(col(textCol), n))).as("s"))
        .groupBy(col("s")).agg(count(lit(1)).as("df"))
        .stat.approxQuantile("df", Array(quantile), 0.001).headOption.getOrElse(1.0)
      val maxDf = scaleCap(qd, headroom, floorCap, f)
      TunedCaps(maxBucket, maxDf)
    } finally { sample.unpersist(): Unit }
  }

  /** Drop rows whose bucket (the given key columns) holds more than
    * `maxBucketSize` members. The count window partitions on the same keys
    * as the downstream self-join, so its one shuffle is reused by the join
    * (plan: single Exchange feeding Window then SortMergeJoin/HashJoin). */
  private def capBuckets(df: DataFrame, keys: Seq[String], maxBucketSize: Int): DataFrame =
    if (maxBucketSize <= 0) df
    else {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(keys.map(col): _*)
      df.withColumn("_bsz", count(lit(1)).over(w))
        .filter(col("_bsz") <= maxBucketSize)
        .drop("_bsz")
    }

  /** Observability for the cap: per-bucket membership counts, largest first
    * (run on a sample to size `maxBucketSize` for a corpus). */
  def bucketSizeStats(bandKeys: DataFrame, keys: Seq[String]): DataFrame =
    bandKeys.groupBy(keys.map(col): _*).agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc)

  /** Exact n-gram Jaccard over candidate pairs (id1, id2). */
  def verifyJaccard(pairs: DataFrame, docs: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("jid"),
      array_distinct(TextOps.shingles(col(textCol), n)).as("jsh"))
    pairs
      .join(sh.withColumnRenamed("jid", "id1").withColumnRenamed("jsh", "sh1"), "id1")
      .join(sh.withColumnRenamed("jid", "id2").withColumnRenamed("jsh", "sh2"), "id2")
      .withColumn("inter", size(array_intersect(col("sh1"), col("sh2"))).cast("double"))
      .withColumn("uni", (size(col("sh1")) + size(col("sh2")) - col("inter")).cast("double"))
      .withColumn("jaccard", round(when(col("uni") === 0.0, 0.0).otherwise(col("inter") / col("uni")), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Exact all-pairs n-gram Jaccard ≥ threshold via an inverted shingle
    * index (the SQL-oracle-able baseline; LSH is the scale path). The join
    * fans out by shingle, so shuffle is O(Σ shingles), never O(n²). */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
      n: Int, threshold: Double, pruneUniqueShingles: Boolean = false,
      maxDf: Int = 0,
      dfAudit: Option[org.apache.spark.sql.Observation] = None): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      array_distinct(TextOps.shingles(col(textCol), n)).as("sh"))
    // CAREFUL: do NOT carry `sh` (or anything derived from it) through the
    // explode — Catalyst collapses projections into the Generate and would
    // re-evaluate the whole shingle-construction pipeline per POSTING row
    // (measured 14x slowdown). Sizes are a separate per-doc projection,
    // broadcast-joined onto the aggregated pairs at the end.
    val sizes = sh.select(col("id"), size(col("sh")).as("n"))
    val inv0 = sh.select(col("id"), explode(col("sh")).as("s"))
    // prunes: df=1 postings form no pair (exactness-preserving); a df
    // CEILING (maxDf > 0) additionally drops postings of hot shingles — a
    // shingle in d docs emits d² join rows, so an uncapped viral-boilerplate
    // shingle goes quadratic at web scale. The ceiling UNDERCOUNTS
    // intersections through dropped shingles (jaccard becomes a lower
    // bound → possible false negatives, never false positives). Keep 0 for
    // the exact oracle baseline; set it when running as a scale operator.
    // the audit rides the df aggregate the prune computes: with NO prune
    // there is no df pass to observe, and an unattached Observation would
    // block its caller's .get FOREVER — reject the wiring error loudly
    require(dfAudit.isEmpty || pruneUniqueShingles || maxDf > 0,
      "dfAudit requires a prune (pruneUniqueShingles or maxDf > 0); " +
        "without one the Observation would never resolve")
    val inv = {
      val needDf = pruneUniqueShingles || maxDf > 0
      if (!needDf) inv0
      else {
        val lo = if (pruneUniqueShingles) 1L else 0L
        val hi = if (maxDf > 0) maxDf.toLong else Long.MaxValue
        val dfs0 = inv0.groupBy(col("s")).agg(count(lit(1)).as("df"))
        // NO SILENT TRUNCATION: the caller can observe exactly what the
        // ceiling dropped — metrics ride the df aggregate the prune already
        // computes (CollectMetrics over dfs: zero extra passes, resolved
        // after the first action on the returned pairs)
        val dfs = dfAudit.fold(dfs0)(obs => dfs0.observe(obs,
          sum(when(col("df") > hi, lit(1)).otherwise(lit(0))).as("hot_shingles"),
          sum(when(col("df") > hi, col("df")).otherwise(lit(0))).as("dropped_postings"),
          sum(col("df")).as("total_postings")))
        val shared = dfs.filter(col("df") > lo && col("df") <= hi).select(col("s"))
        inv0.join(shared, Seq("s"), "left_semi")
      }
    }
    val a = inv.select(col("id").as("id1"), col("s"))
    val b = inv.select(col("id").as("id2"), col("s"))
    a.join(b, Seq("s")).filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.withColumnRenamed("id", "id1").withColumnRenamed("n", "n1")), "id1")
      .join(broadcast(sizes.withColumnRenamed("id", "id2").withColumnRenamed("n", "n2")), "id2")
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n1") + col("n2") - col("inter")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), col("jaccard"))
  }

  /** Corpus-derived df ceiling for [[ngramJaccardPairs]] — the [[tuneCaps]]
    * discipline applied to the shingle-df distribution ALONE (no minhash
    * pass): a high quantile of a sample's observed df distribution, a
    * headroom factor so legitimate shared boilerplate clears the cap, scaled
    * by 1/sampleFraction (a hot shingle's df grows linearly with corpus
    * size; the p≪hot quantile tracks the normal population). One pass over
    * the sample; one approximate quantile crosses to the driver. */
  def tuneMaxDf(docs: DataFrame, textCol: String, n: Int = 3,
      sampleFraction: Double = 0.01, seed: Long = 42L,
      quantile: Double = 0.99, headroom: Double = 4.0,
      floorCap: Int = 16): Int = {
    val f = math.min(1.0, sampleFraction)
    val sample = if (f >= 1.0) docs else docs.sample(withReplacement = false, f, seed)
    val qd = sample
      .select(explode(array_distinct(TextOps.shingles(col(textCol), n))).as("s"))
      .groupBy(col("s")).agg(count(lit(1)).as("df"))
      .stat.approxQuantile("df", Array(quantile), 0.001).headOption.getOrElse(1.0)
    scaleCap(qd, headroom, floorCap, f)
  }

  /** [[ngramJaccardPairs]] as a SCALE operator: the df ceiling is derived
    * from the corpus itself ([[tuneMaxDf]] — no fixed default to outgrow)
    * and the prune is always observable. Returns (pairs, derived maxDf,
    * audit); the audit Observation's metrics — `hot_shingles`,
    * `dropped_postings`, `total_postings` — resolve after the first action
    * on the pairs, so a caller can log exactly what the ceiling cost (the
    * dropped postings UNDERCOUNT intersections: jaccard is a lower bound,
    * false negatives possible, false positives never). The exact
    * oracle-graded baseline stays `maxDf = 0` [[ngramJaccardPairs]]. */
  def ngramJaccardPairsTuned(docs: DataFrame, textCol: String, idCol: String,
      n: Int = 3, threshold: Double, pruneUniqueShingles: Boolean = false,
      sampleFraction: Double = 0.01, seed: Long = 42L,
      quantile: Double = 0.99, headroom: Double = 4.0, floorCap: Int = 16)
      : (DataFrame, Int, org.apache.spark.sql.Observation) = {
    val maxDf = tuneMaxDf(docs, textCol, n, sampleFraction, seed, quantile,
      headroom, floorCap)
    val audit = org.apache.spark.sql.Observation()
    val pairs = ngramJaccardPairs(docs, textCol, idCol, n, threshold,
      pruneUniqueShingles, maxDf, Some(audit))
    (pairs, maxDf, audit)
  }

  /** 64-bit SimHash over tokens: per-bit weighted majority of xxhash64(token).
    * ONE native tokenize+hash pass (StaticInvoke kernel) — the round-1
    * 64-separate-interpreted-HOF formulation recomputed the token pipeline
    * 64× per row. Near-dup = small Hamming distance; pairs found by
    * exact-match banding on 16-bit sub-blocks (any pair within Hamming ≤ 3
    * shares ≥1 of 4 blocks). */
  def simhash64(text: Column): Column = graft.functions.NativeFns.simhash64(text)

  /** md5-domain SimHash — slower per token than [[simhash64]] but exactly
    * reproducible in portable SQL (the DuckDB oracle grades the full
    * near-dup pipeline bit-for-bit). */
  def simhash64Md5(text: Column): Column = graft.functions.NativeFns.simhash64Md5(text)

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b)).cast("int")

  /** SimHash near-dup pairs with Hamming ≤ maxDist via 4×16-bit block
    * banding (exact for maxDist ≤ 3, then verified). `maxBucketSize` caps
    * block-bucket membership like [[minhashNearDups]] — a 16-bit block key
    * gathers n/65536 docs on average, quadratic at 10⁹ docs without a cap. */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
      maxDist: Int = 3, maxBucketSize: Int = 1000,
      sigFn: Column => Column = simhash64): DataFrame = {
    val sigs = docs.select(col(idCol).as("id"), sigFn(col(textCol)).as("sig"))
    val blocks0 = sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("blk"), shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL).as("key"))): _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.blk").as("blk"), col("bk.key").as("key"))
    val blocks = capBuckets(blocks0, Seq("blk", "key"), maxBucketSize)
    val a = blocks.alias("a")
    val b = blocks.alias("b")
    a.join(b, col("a.blk") === col("b.blk") && col("a.key") === col("b.key") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        hamming64(col("a.sig"), col("b.sig")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
