package graft.app

import graft.ops.Similarity

/** A/B the IVF index's list-file payload: raw `array<float>` vectors vs
  * 8-bit scalar-quantized codes ([[Similarity.writeIvfIndexSq8]]). Builds
  * both inverted files over the same corpus with the same codebook and
  * prints on-disk bytes — the ratio is the per-vector probe-scan footprint
  * saved at 10⁹–10¹⁰-embedding scale, where the inverted file IS the
  * storage bill and the probe reads it on every query. Also cross-checks
  * that the SQ8 path's exact re-rank reproduces the raw index's top-k.
  *
  * Env: GRAFT_AB_SF_DIR (default /root/testdata/sf0.01). */
object IvfBytesAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_AB_SF_DIR", "/root/testdata/sf0.01")
    val spark = BenchUtil.newSession(8, shufflePartitions = 8)
    import org.apache.spark.sql.functions._
    // 40x deterministically-perturbed copies: enough rows that parquet
    // framing stops dominating (see BenchUtil.perturbedCopies for why the
    // perturbation must be per-dimension)
    val embs = BenchUtil.perturbedCopies(
      spark.read.parquet(s"$sfDir/embeddings.parquet"), 40)

    import BenchUtil.dirBytes
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(BenchUtil.scratch), "ivfbytes")
    val rawDir = work.resolve("raw").toString
    val sq8Dir = work.resolve("sq8").toString
    Similarity.writeIvfIndex(embs, rawDir, nLists = 16)
    Similarity.writeIvfIndexSq8(embs, sq8Dir, nLists = 16)
    val (rb, qb) = (dirBytes(java.nio.file.Paths.get(rawDir)),
      dirBytes(java.nio.file.Paths.get(sq8Dir)))
    // the vector column alone: subtract an id-only baseline from both to
    // strip fixed parquet framing (dominant at toy scale, negligible at 10^9)
    val baseDir = work.resolve("base").toString
    spark.read.parquet(rawDir).select(
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("list"))
      .write.partitionBy("list").parquet(baseDir)
    val bb = dirBytes(java.nio.file.Paths.get(baseDir))

    val qids = Seq(0L, 1L, 2L, 3L, 4L)
    val raw = Similarity.ivfTopKIndexed(spark, rawDir, qids, k = 5, nprobe = 4)
      .collect().map(_.toString).sorted
    val sq8 = Similarity.ivfTopKIndexedSq8(spark, sq8Dir, embs, qids, k = 5, nprobe = 4)
      .collect().map(_.toString).sorted
    val identical = raw.sameElements(sq8)

    val n = embs.count()
    println(f"""{"ivf_bytes_ab":{"rows":$n,"raw_bytes":$rb,"sq8_bytes":$qb,"base_bytes":$bb,"index_ratio":${rb.toDouble / math.max(1L, qb)}%.2f,"vector_column_ratio":${(rb - bb).toDouble / math.max(1L, qb - bb)}%.2f,"topk_identical":$identical}}""")
    graft.lake.SinkIO.rmDir(work)
    spark.stop()
  }
}
