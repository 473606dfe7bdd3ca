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

    // declarative pipeline: same binlog through the NATIVE streaming sink
    // (no foreachBatch) into a second table — same final state expected
    val table2 = work.resolve("table-sink")
    val q2 = spark.readStream.format("graft-binlog")
      .option("path", binlog.toString).option("maxEventsPerBatch", 3000)
      .load()
      .writeStream.format("graft-lake")
      .option("path", table2.toString).option("nBuckets", 8).option("mode", "mor")
      .option("checkpointLocation", work.resolve("ckpt-sink").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q2.awaitTermination()
    val viaSink = LakeTable.load(table2).read(spark).count()
    println(s"[demo] graft-lake sink live rows = $viaSink (match=${viaSink == df.count()})")

    // declarative SQL surface over the same data
    graft.sql.GraftSql.enable(spark, work.resolve("warehouse").toString)
    spark.sql("DROP TABLE IF EXISTS graft.demo")
    spark.sql("CREATE TABLE graft.demo (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, content_len BIGINT, lang STRING) USING graft TBLPROPERTIES('buckets'='8')")
    df.select("url", "warc_ts", "html", "text", "content_len", "lang")
      .createOrReplaceTempView("demo_src")
    spark.sql(
      """MERGE INTO graft.demo t USING demo_src s ON t.url = s.url
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val viaSql = spark.sql("SELECT count(*) FROM graft.demo").head().getLong(0)
    println(s"[demo] SQL MERGE row count = $viaSql (match=${viaSql == df.count()})")
    spark.stop()
  }
}
