package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.binlog.{ChangeEventGen, GenProfile}
import graft.cdc.Ingest
import graft.lake.LakeTable

/** Smoke entry point: generate a deterministic change stream, run the real
  * streaming ingest (DSv2 binlog source → dedup → MERGE → LakeTable), print
  * the resulting snapshot + a sample of the table.
  *
  * Usage: runMain graft.app.IngestDemo [workDir]
  */
object IngestDemo {
  def main(args: Array[String]): Unit = {
    val work = Paths.get(args.headOption.getOrElse(
      Files.createTempDirectory("graft-demo").toString))
    Files.createDirectories(work)
    val binlog = work.resolve("binlog")
    val table = work.resolve("table")
    val ckpt = work.resolve("ckpt")

    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ingest-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val profile = GenProfile.uniformSmall()
    println(s"[demo] generating ${profile.partitions}x${profile.eventsPerPartition} events → $binlog")
    ChangeEventGen.writeSegments(profile, binlog, segmentEvents = 2000, chunkThreshold = 256 * 1024)

    println(s"[demo] streaming ingest (maxEventsPerBatch=3000) → $table")
    val q = Ingest.startStream(spark, binlog.toString, table,
      ckpt.toString, maxEventsPerBatch = 3000, nBuckets = 8)
    q.awaitTermination()

    val t = LakeTable.load(table)
    val snap = t.currentSnapshot
    println(s"[demo] snapshot=${snap.snapshotId} rows=${snap.totalRows} files=${snap.files.size} batches=${snap.batches.map(_.batchId).mkString(",")}")
    snap.batches.foreach(b => println(s"[demo]   batch ${b.batchId}: upserts=${b.upserts} deletes=${b.deletes} lineage=" +
      b.lineage.map(l => s"p${l.partition}@${l.startOffset}+${l.count}").mkString(" ")))
    val df = t.read(spark)
    println(s"[demo] live rows = ${df.count()}, stored rows (incl tombstones) = ${t.readRaw(spark).count()}")
    df.orderBy("url").show(5, truncate = 60)

    // anchored flush windows (reference W1 semantics) over the same stream
    graft.streaming.FlushWindows.runToMemory(spark, binlog.toString,
      flushIntervalUs = 300L * 1000000, queryName = "demo_chunks", maxEventsPerBatch = 2000)
    val chunks = spark.table("demo_chunks")
    println(s"[demo] anchored flush chunks = ${chunks.count()}")
    chunks.orderBy("partition", "startOffset").show(4)
    spark.stop()
  }
}
