package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** MOR read-latency vs delta-file count: how expensive is resolve-on-read as
  * a bucket accumulates k delta files, and where should incremental
  * compaction kick in (Merge.MaxFilesPerBucket)?
  *
  * Method: ingest the same 1M-event binlog in 16 microbatches under MOR with
  * compaction DISABLED, snapshotting read latency (full user-facing read +
  * count) after each batch — the table then holds exactly `batch#` delta
  * files per touched bucket. Also measures the write-side cost of the
  * compaction each threshold implies. Env: GRAFT_MORREAD_EVENTS (default
  * 1M), GRAFT_MORREAD_CORES (16). */
object MorReadBench {
  def main(args: Array[String]): Unit = {
    val events = sys.env.getOrElse("GRAFT_MORREAD_EVENTS", "1000000").toLong
    val cores = sys.env.getOrElse("GRAFT_MORREAD_CORES", "16").toInt
    val spark = BenchUtil.newSession(cores, shufflePartitions = cores)
    val binlog = BenchUtil.ensureBinlog(BenchUtil.skewedProfile(events))
    val perPart = events / 8
    val batches = 16
    val step = math.max(1L, perPart / batches)

    val saved = graft.cdc.Merge.MaxFilesPerBucket
    graft.cdc.Merge.MaxFilesPerBucket = Int.MaxValue // no compaction during the sweep
    try {
      val work = Files.createTempDirectory(Paths.get(BenchUtil.scratch), "morread")
      val table = graft.lake.LakeTable.create(work.resolve("t"), nBuckets = 64)
      var b = 0L
      val rows = Vector.newBuilder[(Int, Int, Double, Double)]
      var from = 0L
      while (from < perPart) {
        graft.cdc.Ingest.applyBatch(spark, table, mode = graft.cdc.Mor)(
          graft.binlog.BinlogRead.range(spark, binlog.toString, from, from + step), b)
        b += 1
        from += step
        val filesPerBucket = table.currentSnapshot.files.groupBy(_.bucket).map(_._2.size).max
        // read latency: best of 2 (first read warms page cache per snapshot)
        def readSec(): Double = {
          val t0 = System.nanoTime()
          table.read(spark).agg(count(lit(1)), sum(col("content_len"))).collect()
          (System.nanoTime() - t0) / 1e9
        }
        readSec()
        val r = readSec()
        // point-lookup style: one bucket's urls only (bucket pruning is on
        // the DSv2/SQL path; here measure the resolve itself)
        val t1 = System.nanoTime()
        table.read(spark).filter(col("url") === "https://d1.example.org/p0/doc1").count()
        val p = (System.nanoTime() - t1) / 1e9
        rows += ((b.toInt, filesPerBucket, r, p))
        System.err.println(f"[morread] batches=$b%2d filesPerBucket=$filesPerBucket%2d fullRead=$r%.2f s point=$p%.2f s")
      }
      val json = rows.result().map { case (nb, fpb, r, pnt) =>
        f"""{"batches":$nb,"files_per_bucket":$fpb,"full_read_sec":$r%.3f,"point_sec":$pnt%.3f}"""
      }.mkString("[", ",", "]")
      println(s"""{"mor_read_sweep":$json}""")
    } finally graft.cdc.Merge.MaxFilesPerBucket = saved
    spark.stop()
  }
}
