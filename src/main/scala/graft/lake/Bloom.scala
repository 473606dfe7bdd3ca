package graft.lake

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession

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
  *  - built by [[Maintain.buildBlooms]] as a MAINTENANCE pass (one task per
  *    file lacking a sidecar: column-pruned url read, per-file-sized bitset
  *    written executor-side) — the ingest hot path is untouched, lookups use
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

  /** Build sidecars for the given data files (absolute path → expected
    * rows); skips files that already have one. Returns #built.
    *
    * Fully distributed: one task per missing file — each task reads ITS
    * file's url column (column-pruned vectorized parquet read), folds the
    * hashes into a bitset sized for THAT file's own row count
    * (`bitsFor(rows)`, not one global maximum), and renames the sidecar
    * into place next to the file it describes. Nothing but the built-count
    * crosses to the driver — at 10^5 files the old groupBy+collect design
    * funneled every bitset (up to 2^27 bytes each) through driver memory
    * and paired them back to paths by URI-suffix heuristics. */
  def build(spark: SparkSession, files: Seq[(Path, Long)]): Int = {
    val missing = files.filterNot(f => Files.exists(sidecar(f._1)))
      .map { case (p, rows) => (p.toString, rows) }
    if (missing.isEmpty) return 0
    val urlOnly = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url", org.apache.spark.sql.types.StringType, nullable = false)))
    // Spark's own parquet reader closure (driver-built, executor-shippable —
    // same pattern as the bucket scans); requiredSchema prunes to `url`
    val readFile = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
      .buildReaderWithPartitionValues(
        sparkSession = spark,
        dataSchema = urlOnly,
        partitionSchema = new org.apache.spark.sql.types.StructType(),
        requiredSchema = urlOnly,
        filters = Nil,
        options = Map(org.apache.spark.sql.execution.datasources.FileFormat.OPTION_RETURNING_BATCH -> "false"),
        hadoopConf = spark.sessionState.newHadoopConf())
    val slices = math.max(1, math.min(missing.size, spark.sparkContext.defaultParallelism * 2))
    spark.sparkContext.parallelize(missing, slices).map { case (pathStr, rows) =>
      val p = java.nio.file.Paths.get(pathStr)
      if (Files.exists(sidecar(p))) 0
      else {
        val bits = new Array[Byte](bitsFor(rows) / 8)
        val pf = org.apache.spark.sql.execution.datasources.PartitionedFile(
          org.apache.spark.sql.catalyst.InternalRow.empty,
          org.apache.spark.paths.SparkPath.fromPathString(pathStr), 0L, Files.size(p))
        val it = readFile(pf)
        while (it.hasNext) set(bits,
          org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String(
            it.next().getUTF8String(0), 42L))
        // attempt-unique tmp + atomic rename: retried/speculative tasks
        // never tear each other's sidecar
        val tmp = p.resolveSibling(
          p.getFileName.toString + s".bloom.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
        Files.write(tmp, bits)
        Files.move(tmp, sidecar(p),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        1
      }
    }.sum().toInt
  }

  /** Build blooms for the subset of `newFiles` a (possibly rebased or
    * no-op'd) commit actually kept — shared by automatic (MOR hot-path) and
    * maintenance compaction so "rebuild coverage for replacement files"
    * stays one code path. */
  def inherit(spark: SparkSession, table: LakeTable, committed: Snapshot,
      newFiles: Seq[DataFile]): Int = {
    val kept = committed.files.map(_.path).toSet
    val keep = newFiles.filter(f => kept.contains(f.path))
    if (keep.isEmpty) 0
    else build(spark, keep.map(f => (table.root.resolve(f.path), f.rowCount)))
  }

  /** Driver-side sidecar cache, bounded LRU (access-ordered): point lookups
    * hit the same few sidecars, so evict only the coldest entry at capacity —
    * a clear-all would re-read every hot sidecar right after crossing the
    * bound (a periodic latency cliff under lookup-heavy workloads). */
  private val CacheEntries = 4096
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, Array[Byte]](CacheEntries, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[String, Array[Byte]]): Boolean =
        size() > CacheEntries
    })

  /** Might ANY of the urls be in this data file? True when no sidecar
    * exists (bloom absent → cannot skip). */
  def mightContainAny(dataFile: Path, urls: Seq[String]): Boolean = {
    val sc = sidecar(dataFile)
    if (!Files.exists(sc)) return true
    val bits = cache.computeIfAbsent(sc.toString, _ => Files.readAllBytes(sc))
    if (bits.isEmpty) return true
    urls.exists(u => get(bits, hashOf(u)))
  }
}
