package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.util.Rng

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the correctness baseline (O(q·n) dot
  * products, all codegen'd HOF arithmetic — `zip_with` + `aggregate`, no
  * UDF). The scale paths are:
  *  - random-hyperplane LSH bucketing: shuffle O(n), candidates only within
  *    buckets — recall tunable by #tables/#bits;
  *  - IVF: coarse-quantize to deterministic centroids, probe the nearest
  *    `nprobe` lists — the FAISS-style layout for cluster-scale ANN.
  */
object Similarity {

  /** Dot product of two float-array columns (sequential double accumulation
    * — deterministic order, identical on every engine). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n === 0.0, 0.0).otherwise(d / n)
  }

  /** Brute-force cosine top-k: for each query vector (by id), the k nearest
    * others. Ranking on (rounded cosine desc, neighbor id) is fully
    * deterministic. Queries are broadcast — n stays partitioned. */
  def bruteForceTopK(vecs: DataFrame, queryIds: Seq[Long], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val queries = vecs.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val joined = vecs.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"))
      .join(broadcast(queries), col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }

  /** Deterministic random hyperplanes: dim × nBits doubles from SplitMix64. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(nBits)(b => Array.tabulate(dim)(d =>
      Rng.uniform(Rng.key(seed, b.toLong, d.toLong)) * 2.0 - 1.0))

  /** Sign-random-projection LSH bucket id (nBits ≤ 63). Planes are inlined
    * as array literals — constant-folded by Catalyst, no broadcast needed. */
  def lshBucket(vecCol: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (p, i) =>
      val planeLit = array(p.map(lit): _*)
      val d = aggregate(zip_with(vecCol, planeLit, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, v) => acc + v)
      when(d > 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** LSH-bucketed near-neighbor pairs with cosine ≥ threshold: candidates
    * only inside identical buckets across `tables` independent hash tables. */
  def lshNearPairs(vecs: DataFrame, threshold: Double, nBits: Int = 12,
      tables: Int = 4, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val dim = vecs.select(size(col(vecCol))).head().getInt(0)
    val keyed = (0 until tables).map { t =>
      val planes = hyperplanes(dim, nBits, Rng.key(seed, t.toLong))
      vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
        lit(t).as("tbl"), lshBucket(col(vecCol), planes).as("bkt"))
    }.reduce(_.unionByName(_))
    val a = keyed.alias("a")
    val b = keyed.alias("b")
    a.join(b, col("a.tbl") === col("b.tbl") && col("a.bkt") === col("b.bkt") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"),
        round(cosine(col("a.v"), col("b.v")), 4).as("cos"))
      .distinct()
      .filter(col("cos") >= threshold)
  }

  /** IVF index: deterministic coarse centroids = the vectors whose ids hash
    * lowest (seeded sample), one Lloyd refinement pass, then assignment.
    * Returns (assignments DF with `list` column, centroids). */
  def ivfAssign(vecs: DataFrame, nLists: Int, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): (DataFrame, Array[(Int, Array[Double])]) = {
    // seed centroids: nLists rows with smallest mix64(seed ^ id)
    val seeded = vecs
      .withColumn("_rk", xxhash64(lit(seed), col(idCol)))
      .orderBy(col("_rk")).limit(nLists)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val cents = seeded.zipWithIndex.map { case (v, i) => (i, v) }
    val assigned = assignToCentroids(vecs, cents, idCol, vecCol)
    (assigned, cents)
  }

  private def centroidDots(vecCol: Column, cents: Array[(Int, Array[Double])]): Column =
    array(cents.map { case (i, c) =>
      struct(dot(vecCol, array(c.map(lit): _*)).as("d"), lit(i).as("list"))
    }: _*)

  def assignToCentroids(vecs: DataFrame, cents: Array[(Int, Array[Double])],
      idCol: String, vecCol: String): DataFrame =
    vecs.withColumn("list", array_max(centroidDots(col(vecCol), cents)).getField("list"))

  /** IVF top-k: probe the `nprobe` nearest lists per query, brute-force
    * within them. At scale the per-list scan is a partition-pruned read. */
  def ivfTopK(vecs: DataFrame, queryIds: Seq[Long], k: Int, nLists: Int,
      nprobe: Int, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (assigned, cents) = ivfAssign(vecs, nLists, seed, idCol, vecCol)
    val queries = assigned.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("probes", slice(reverse(array_sort(centroidDots(col("qv"), cents))), 1, nprobe))
      .withColumn("probe", explode(col("probes.list")))
      .select(col("query_id"), col("qv"), col("probe"))
    val cands = assigned.select(col(idCol).as("neighbor_id"), col(vecCol).as("nv"), col("list"))
      .join(broadcast(queries), col("list") === col("probe") && col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", round(cosine(col("qv"), col("nv")), 4))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cands.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rank"))
  }
}
