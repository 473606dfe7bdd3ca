package graft.lake

import java.nio.file.{Files, Path}

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Per-data-file url bloom filters for point-lookup pruning.
  *
  * Within a bucket, every delta file tends to span most of the bucket's url
  * range, so manifest [urlMin, urlMax] bounds rarely prune MOR delta files —
  * a point lookup still opens all k of them. A small per-file bloom
  * (sidecar `<data>.bloom`, ~10 bits/url, 4 probes ⇒ ~1% FP) lets the scan
  * skip delta files that cannot contain the key.
  *
  * Design choices (scale + safety):
  *  - blooms are SIDECARS, not manifest payload: snapshot JSON stays small,
  *    no format migration; presence is probed per candidate file (≤
  *    MaxFilesPerBucket of ONE bucket per lookup);
  *  - built by [[Maintain.buildBlooms]] as a MAINTENANCE pass (a
  *    column-pruned cluster scan of files lacking sidecars, hashes
  *    aggregated per file) — the ingest hot path is untouched, lookups use
  *    blooms opportunistically and fall back to bounds where absent;
  *  - a bloom can only SKIP (membership "no"); false positives just read a
  *    file the bounds would have read anyway — correctness never depends
  *    on the sidecar;
  *  - hash = XXH64(url, seed 42), the exact `xxhash64` the cluster side
  *    computes, double-hashed into 4 probes.
  */
object Bloom {

  val Probes = 4
  val BitsPerKey = 10

  def sidecar(dataFile: Path): Path =
    dataFile.resolveSibling(dataFile.getFileName.toString + ".bloom")

  /** m (bits) for n keys, power of two ≥ 1024 (so probe = h & (m−1)). */
  def bitsFor(n: Long): Int = {
    var m = 1024
    while (m < n * BitsPerKey && m < (1 << 30)) m = m << 1
    m
  }

  def hashOf(url: String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
      org.apache.spark.unsafe.types.UTF8String.fromString(url), 42L)

  private def set(bits: Array[Byte], h: Long): Unit = {
    val m = bits.length * 8
    val h1 = h
    val h2 = (h >>> 32) | (h << 32) | 1L // odd → full-period double hashing
    var i = 0
    while (i < Probes) {
      val idx = (((h1 + i * h2) % m + m) % m).toInt
      bits(idx >> 3) = (bits(idx >> 3) | (1 << (idx & 7))).toByte
      i += 1
    }
  }

  private def get(bits: Array[Byte], h: Long): Boolean = {
    val m = bits.length * 8
    val h1 = h
    val h2 = (h >>> 32) | (h << 32) | 1L
    var i = 0
    while (i < Probes) {
      val idx = (((h1 + i * h2) % m + m) % m).toInt
      if ((bits(idx >> 3) & (1 << (idx & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Cluster-side per-file bloom aggregation: (rowCountHint → bitset). */
  final class BloomAgg(mBits: Int) extends Aggregator[Long, Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = new Array[Byte](mBits / 8)
    override def reduce(b: Array[Byte], h: Long): Array[Byte] = { set(b, h); b }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
      a
    }
    override def finish(r: Array[Byte]): Array[Byte] = r
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Build sidecars for the given data files (absolute path → expected
    * rows); skips files that already have one. Returns #built. */
  def build(spark: SparkSession, files: Seq[(Path, Long)]): Int = {
    val missing = files.filterNot(f => Files.exists(sidecar(f._1)))
    if (missing.isEmpty) return 0
    val maxRows = missing.map(_._2).max
    val m = bitsFor(maxRows) // one size per batch of files — simple, safe
    val agg = udaf(new BloomAgg(m), Encoders.scalaLong)
    val rows: Array[(String, Array[Byte])] =
      spark.read.parquet(missing.map(_._1.toString): _*)
        .select(input_file_name().as("f"), xxhash64(col("url")).as("h"))
        .groupBy(col("f")).agg(agg(col("h")).as("bits"))
        .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1)))
    val byName = missing.map(f => f._1.toUri.toString -> f._1).toMap
    var built = 0
    rows.foreach { case (uri, bits) =>
      // input_file_name returns a URI form; match on the tail
      byName.find { case (u, _) => uri == u || uri.endsWith(u) || u.endsWith(uri) }
        .orElse(byName.find { case (_, p) => uri.endsWith(p.getFileName.toString) })
        .foreach { case (_, p) =>
          val tmp = p.resolveSibling(p.getFileName.toString + ".bloom.tmp")
          Files.write(tmp, bits)
          Files.move(tmp, sidecar(p),
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          built += 1
        }
    }
    built
  }

  // tiny driver-side cache: point lookups hit the same few sidecars
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  /** Might ANY of the urls be in this data file? True when no sidecar
    * exists (bloom absent → cannot skip). */
  def mightContainAny(dataFile: Path, urls: Seq[String]): Boolean = {
    val sc = sidecar(dataFile)
    if (!Files.exists(sc)) return true
    if (cache.size() > 4096) cache.clear()
    val bits = cache.computeIfAbsent(sc.toString, _ => Files.readAllBytes(sc))
    if (bits.isEmpty) return true
    urls.exists(u => get(bits, hashOf(u)))
  }
}
