package graft.app

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.binlog.{BinlogRead, ChangeEventGen, GenProfile}
import graft.cdc.Ingest
import graft.lake.LakeTable

/** Physical-plan audit: prints `.explain("formatted")` for the load-bearing
  * plans (merge aggregation, a headline query) so shuffle count, partial
  * aggregation, broadcast choice and parquet pushdown can be inspected.
  *
  * Usage: runMain graft.app.PlanCheck
  */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = BenchUtil.newSession(cores = 4, shufflePartitions = 4)
    val work = Files.createTempDirectory("plancheck")
    val binlog = work.resolve("binlog")
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 2000)
    ChangeEventGen.writeSegments(p, binlog)

    // seed a table with one batch, then show the plan of a second merge
    val table = LakeTable.create(work.resolve("table"), nBuckets = 8)
    Ingest.applyBatch(spark, table)(BinlogRead.range(spark, binlog.toString, 0, 1000), 0L)

    println("==== COW MERGE physical plan (expect ONE Exchange) ====")
    graft.cdc.Merge.explainNext = true
    Ingest.applyBatch(spark, table)(BinlogRead.range(spark, binlog.toString, 1000, 2000), 1L)

    println("==== MOR MERGE physical plan (expect ONE Exchange, NO table scan) ====")
    val morTable = LakeTable.create(work.resolve("mor-table"), nBuckets = 8)
    Ingest.applyBatch(spark, morTable, mode = graft.cdc.Mor)(
      BinlogRead.range(spark, binlog.toString, 0, 1000), 0L)
    graft.cdc.Merge.explainNext = true
    Ingest.applyBatch(spark, morTable, mode = graft.cdc.Mor)(
      BinlogRead.range(spark, binlog.toString, 1000, 2000), 1L)

    println("==== headline query plan: q3_shipping (broadcast joins expected) ====")
    graft.SparkEntry.queries("q3_shipping")(spark, "/root/testdata/sf0.001").explain("formatted")

    println("==== headline query plan: cdc_latest_per_key ====")
    graft.SparkEntry.queries("cdc_latest_per_key")(spark, "/root/testdata/sf0.001").explain("formatted")

    println("==== SQL surface plans (catalog scan + point-lookup pushdown) ====")
    val wh = Files.createTempDirectory("plancheck-wh").toString
    graft.sql.GraftSql.enable(spark, wh)
    spark.sql("CREATE TABLE graft.pc (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, content_len BIGINT, lang STRING) USING graft TBLPROPERTIES('buckets'='8')")
    spark.sql(
      """INSERT INTO graft.pc
        |SELECT concat('u', id), timestamp_micros(1700000000000000 + id),
        |  cast('<p>x</p>' AS BINARY), CAST(NULL AS STRING), CAST(NULL AS BIGINT), 'en'
        |FROM range(1000)""".stripMargin)
    println("-- full scan (expect GraftLakeScan, one partition per bucket, NO Exchange):")
    spark.sql("SELECT url, content_len FROM graft.pc").explain("formatted")
    println("-- point lookup (expect urlKeys annotation; 1 input partition):")
    spark.sql("SELECT * FROM graft.pc WHERE url = 'u7'").explain("formatted")

    spark.stop()
  }
}
