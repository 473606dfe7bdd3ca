package graft.app

import org.apache.spark.sql.functions._

import graft.functions.NativeFns

/** A/B the LSH index's signature storage: full 32-char hex md5 strings vs
  * the low-64 truncated `array<long>` form ([[graft.ops.LshIndex]] stores
  * the latter). Writes both band-row layouts for the same corpus and prints
  * on-disk bytes — the ratio is the per-(doc, band) index footprint saved
  * at 10^10-doc scale, where the signature column dominates index size.
  *
  * Env: GRAFT_AB_SF_DIR (default /root/testdata/sf0.01). */
object LshBytesAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("GRAFT_AB_SF_DIR", "/root/testdata/sf0.01")
    val spark = BenchUtil.newSession(8, shufflePartitions = 8)
    val (bands, rowsPerBand, k, shards) = (4, 2, 8, 16)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val sigs = docs
      .select(col("doc_id").as("id"), NativeFns.minhashSig(col("text"), 3, k).as("sigHex"))
      .filter(col("sigHex").isNotNull)
    val banded = sigs.select(
      col("id"), col("sigHex"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          md5(to_binary(concat_ws("|", (0 until rowsPerBand).map(r =>
            element_at(col("sigHex"), b * rowsPerBand + r + 1)): _*), lit("utf-8"))).as("bucket"))
      }: _*)).as("bk"))
      .select(col("id"), col("sigHex"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
      .withColumn("pb", pmod(hash(col("bucket")), lit(shards)))

    import BenchUtil.dirBytes
    val work = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(BenchUtil.scratch), "lshbytes")
    val hexDir = work.resolve("hex"); val longDir = work.resolve("low64")
    banded.withColumnRenamed("sigHex", "sig")
      .write.partitionBy("pb").parquet(hexDir.toString)
    banded.select(col("id"), NativeFns.sigLow64(col("sigHex")).as("sig"),
        col("band"), col("bucket"), col("pb"))
      .write.partitionBy("pb").parquet(longDir.toString)
    val (hb, lb) = (dirBytes(hexDir), dirBytes(longDir))
    // the sig column alone: drop it from both to isolate its share
    val baseDir = work.resolve("base")
    banded.select(col("id"), col("band"), col("bucket"), col("pb"))
      .write.partitionBy("pb").parquet(baseDir.toString)
    val bb = dirBytes(baseDir)
    val ratioAll = hb.toDouble / math.max(1L, lb)
    val ratioSig = (hb - bb).toDouble / math.max(1L, lb - bb)
    println(f"""{"lsh_bytes_ab":{"rows":${banded.count()},"hex_bytes":$hb,"low64_bytes":$lb,"no_sig_bytes":$bb,"index_ratio":$ratioAll%.2f,"sig_column_ratio":$ratioSig%.2f}}""")
    graft.lake.SinkIO.rmDir(work)
    spark.stop()
  }
}
