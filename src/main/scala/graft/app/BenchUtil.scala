package graft.app

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession

import graft.binlog.{ChangeEventGen, GenProfile, Segment}
import graft.cdc.Ingest

/** Shared benchmark plumbing: deterministic skewed binlog generation (cached
  * on disk keyed by profile shape) and a timed ingest run at a given
  * parallelism. */
object BenchUtil {

  def skewedProfile(totalEvents: Long, partitions: Int = 8): GenProfile =
    GenProfile.skewed(seed = 42L, partitions = partitions,
      perPartition = totalEvents / partitions)

  /** RAM-backed scratch (tmpfs) for benches: the sandbox's /tmp is a slow
    * virtual disk that saturates around the shuffle rates of a 16-core run,
    * which would measure the disk, not the engine. A production executor
    * has NVMe-class local storage; tmpfs stands in for it here (noted in
    * BENCH_SCALING.md). */
  val scratch: String = {
    val shm = Paths.get("/dev/shm")
    if (Files.isDirectory(shm) && Files.isWritable(shm)) "/dev/shm/graft-bench"
    else "/tmp/graft-bench"
  }

  /** Generate (or reuse cached) binlog segments for a profile. */
  def ensureBinlog(p: GenProfile, baseDir: String = scratch): Path = {
    val dir = Paths.get(baseDir,
      s"binlog-${p.name}-p${p.partitions}-n${p.eventsPerPartition}-s${p.seed}-h${p.htmlMeanBytes}-u${p.urlPoolPerPartition}")
    val marker = dir.resolve("_COMPLETE")
    if (Files.exists(marker)) return dir
    if (Files.exists(dir)) { // partial from a crashed run — rebuild
      Segment.listAll(dir).foreach { f => Files.deleteIfExists(f.path); Files.deleteIfExists(f.indexPath) }
    }
    val t0 = System.nanoTime()
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 100000, chunkThreshold = 8L * 1024 * 1024)
    Files.createFile(marker)
    System.err.println(f"[bench] generated ${p.partitions * p.eventsPerPartition} events in ${(System.nanoTime() - t0) / 1e9}%.1f s → $dir")
    dir
  }

  def newSession(cores: Int, shufflePartitions: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .config("spark.local.dir", s"$scratch/spark-local")
      // lz4 shuffle compression wins even on tmpfs (fewer bytes through the
      // memory bus beats the codec cost — measured 40.6s vs 58.6s at 4M/16c)
      .config("spark.shuffle.compress", sys.env.getOrElse("GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress", sys.env.getOrElse("GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.memory.offHeap.enabled", sys.env.getOrElse("GRAFT_OFFHEAP", "false"))
      .config("spark.memory.offHeap.size", "16g")
      // parquet writer A/B knobs (html/url/text are unique-ish — dictionary
      // encoding is mostly overhead on this table; snappy is the default)
      .config("spark.sql.parquet.compression.codec",
        sys.env.getOrElse("GRAFT_PARQUET_CODEC", "snappy"))
      .config("spark.hadoop.parquet.enable.dictionary",
        sys.env.getOrElse("GRAFT_PARQUET_DICT", "true"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Merge mode under test: GRAFT_MERGE_MODE=cow|mor (default mor — the
    * 10^10-scale strategy is what the north-star metric grades). */
  def mergeMode: graft.cdc.MergeMode =
    sys.env.getOrElse("GRAFT_MERGE_MODE", "mor").toLowerCase match {
      case "cow" => graft.cdc.Cow
      case _ => graft.cdc.Mor
    }

  /** One timed CDC ingest of the binlog into a fresh LakeTable via the
    * streaming pipeline. Returns (events, seconds, events/sec). */
  /** `n` deterministically-perturbed copies of an embeddings frame — the
    * corpus-scaling fixture for storage A/Bs. The perturbation is
    * PER-DIMENSION: SQ8 codes are invariant under affine maps `x → a·x + b`
    * (vmin/vmax rescale with the data), so pure-scale copies would emit
    * identical code words that dictionary-collapse and fake the ratio. One
    * definition serves IvfBytesAB and the specs — a future change to the
    * perturbation cannot leave one copy measuring a faked ratio. */
  def perturbedCopies(embs: org.apache.spark.sql.DataFrame, n: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    embs.sparkSession.range(n).crossJoin(embs).select(
      (col(idCol) + col("id") * 1000000L).as(idCol),
      transform(col(vecCol), (x, i) =>
        (x * (lit(1.0f) + col("id").cast("float") * (i.cast("float") + lit(1.0f))
          / lit(2048.0f))).cast("float")).as(vecCol))
  }

  /** Total bytes of regular files under `p` (on-disk footprint A/Bs). */
  def dirBytes(p: Path): Long = {
    val w = Files.walk(p)
    try w.filter(Files.isRegularFile(_)).mapToLong(Files.size(_)).sum()
    finally w.close()
  }

  def timedIngest(spark: SparkSession, binlog: Path, maxEventsPerBatch: Long,
      nBuckets: Int): (Long, Double, Double) = {
    Files.createDirectories(Paths.get(scratch))
    val work = Files.createTempDirectory(Paths.get(scratch), "run")
    val events = Segment.listAll(binlog).map(_.index.totalRecords).sum
    val t0 = System.nanoTime()
    val q = Ingest.startStream(spark, binlog.toString, work.resolve("table"),
      work.resolve("ckpt").toString, maxEventsPerBatch = maxEventsPerBatch,
      nBuckets = nBuckets, mode = mergeMode)
    q.awaitTermination()
    val sec = (System.nanoTime() - t0) / 1e9
    // clean up the table (bench tables are large)
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(rm) finally s.close()
      }
      Files.deleteIfExists(p)
    }
    rm(work)
    (events, sec, events / sec)
  }
}
