package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** SQL surface: CREATE TABLE … USING graft, MERGE INTO, SELECT — all on a
  * plain session (runtime enablement, no extensions needed). */
class GraftSqlSpec extends SparkSpec {

  private lazy val wh = tmpDir("graft-wh").toString

  private def enable(): Unit = GraftSql.enable(spark, wh)

  test("CREATE TABLE / SELECT empty / DROP round-trip") {
    enable()
    spark.sql("CREATE TABLE graft.t0 (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, content_len BIGINT, lang STRING) USING graft TBLPROPERTIES('buckets'='4')")
    assert(spark.sql("SELECT * FROM graft.t0").count() == 0)
    assert(spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1)).contains("t0"))
    spark.sql("DROP TABLE graft.t0")
    intercept[Exception](spark.sql("SELECT * FROM graft.t0").collect())
  }

  test("MERGE INTO drives the engine: upserts, LWW, deletes, exactly-once batches") {
    enable()
    spark.sql("CREATE TABLE graft.pages (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, content_len BIGINT, lang STRING) USING graft TBLPROPERTIES('buckets'='4')")

    spark.range(100).createOrReplaceTempView("seed")
    def src(tsBase: Long, deleteMod: Int): String =
      s"""SELECT concat('u', id % 40) AS url,
         |  timestamp_micros(${tsBase} + id) AS warc_ts,
         |  cast(concat('<p>doc ', id, '</p>') AS BINARY) AS html,
         |  CAST(NULL AS STRING) AS text, CAST(NULL AS BIGINT) AS content_len,
         |  'en' AS lang, CAST(id AS LONG) AS offset, CAST(0 AS INT) AS partition,
         |  CASE WHEN id % $deleteMod = 3 THEN 'delete' ELSE 'upsert' END AS op
         |FROM seed""".stripMargin

    spark.sql(
      s"""MERGE INTO graft.pages t USING (${src(1700000000000000L, 10)}) s
         |ON t.url = s.url
         |WHEN MATCHED AND s.op = 'delete' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val after1 = spark.sql("SELECT * FROM graft.pages").collect()
    // 40 urls from ids 0..99: url k gets ids {k, k+40} plus {k+80} when k<20.
    // The WINNER (max warc_ts ≡ max id) decides; a winning delete tombstones.
    def winner(k: Int): Int = if (k < 20) k + 80 else k + 40
    val deleted1 = (0 until 40).count(k => winner(k) % 10 == 3)
    assert(after1.length == 40 - deleted1)

    // second merge: later timestamps win; different delete pattern
    spark.sql(
      s"""MERGE INTO graft.pages t USING (${src(1800000000000000L, 7)}) s
         |ON t.url = s.url
         |WHEN MATCHED AND s.op = 'delete' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)

    val after2 = spark.sql("SELECT url, text FROM graft.pages").collect()
    val deleted2 = (0 until 40).count(k => winner(k) % 7 == 3)
    assert(after2.length == 40 - deleted2)
    // text extraction ran engine-side on the html payload (u1's winner is
    // id 81, which neither delete pattern hits)
    val t = after2.find(_.getString(0) == "u1").map(_.getString(1))
    assert(t.contains("doc 81"))

    // exactly-once markers: two SQL merges → two batches
    val lake = new GraftCatalog {
      initialize("graft", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("warehouse", wh)))
    }.loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "pages"))
      .asInstanceOf[GraftSqlTable].lake
    assert(lake.currentSnapshot.batches.map(_.batchId) == Seq(0L, 1L))
  }

  test("SELECT equals the library read() path, including MOR delta resolve") {
    enable()
    spark.sql("CREATE TABLE graft.morpages (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, content_len BIGINT, lang STRING) USING graft TBLPROPERTIES('buckets'='4')")
    GraftSql.sqlMergeMode = graft.cdc.Mor
    try {
      spark.range(60).createOrReplaceTempView("seed2")
      (0 until 3).foreach { round =>
        spark.sql(
          s"""MERGE INTO graft.morpages t USING (
             |  SELECT concat('u', id % 25) AS url,
             |    timestamp_micros(${1700000000000000L + round * 1000000L} + id) AS warc_ts,
             |    cast(concat('<b>r$round-', id, '</b>') AS BINARY) AS html,
             |    CAST(NULL AS STRING) AS text, CAST(NULL AS BIGINT) AS content_len,
             |    'en' AS lang, CAST(id AS LONG) AS offset, CAST(0 AS INT) AS partition,
             |    CASE WHEN id % 11 = 5 THEN 'delete' ELSE 'upsert' END AS op
             |  FROM seed2) s
             |ON t.url = s.url
             |WHEN MATCHED AND s.op = 'delete' THEN DELETE
             |WHEN MATCHED THEN UPDATE SET *
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      }
    } finally GraftSql.sqlMergeMode = graft.cdc.Cow

    val viaSql = spark.sql("SELECT url, text, content_len FROM graft.morpages")
      .collect().map(_.toString).sorted
    val lakeRoot = java.nio.file.Paths.get(wh, "morpages")
    val viaLib = graft.lake.LakeTable.load(lakeRoot).read(spark)
      .select(col("url"), col("text"), col("content_len"))
      .collect().map(_.toString).sorted
    assert(viaSql.nonEmpty)
    assert(viaSql.sameElements(viaLib),
      s"only-sql=${viaSql.diff(viaLib).take(5).mkString(";")} only-lib=${viaLib.diff(viaSql).take(5).mkString(";")}")
  }

  test("url point-lookup pushdown prunes to one bucket; results identical") {
    enable()
    // reuse morpages (4 buckets, multiple delta files per bucket)
    val full = spark.sql("SELECT * FROM graft.morpages WHERE url = 'u7'").collect()
    assert(full.length == 1)
    // plan shows the pushed key and reads strictly fewer partitions
    val df = spark.sql("SELECT * FROM graft.morpages WHERE url = 'u7'")
    val scans = df.queryExecution.executedPlan.collectLeaves()
    val desc = scans.map(_.toString).mkString("\n")
    assert(desc.contains("urlKeys=u7"), desc.take(500))
    val allParts = spark.sql("SELECT * FROM graft.morpages").queryExecution
      .executedPlan.collectLeaves().head.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputPartitions.size
    val pointParts = df.queryExecution
      .executedPlan.collectLeaves().head.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
      .inputPartitions.size
    assert(pointParts == 1 && allParts == 4, s"point=$pointParts all=$allParts")
    // IN-list across several urls: at most one bucket per key
    val in3 = spark.sql("SELECT url FROM graft.morpages WHERE url IN ('u1','u2','u7')")
    assert(in3.collect().map(_.getString(0)).sorted.sameElements(Array("u1", "u2", "u7")))
    // a key that hashes to an existing bucket but matches no row: pruned read, empty result
    assert(spark.sql("SELECT * FROM graft.morpages WHERE url = 'nope'").count() == 0)
  }

  test("time travel: SELECT ... VERSION AS OF reads an earlier snapshot") {
    enable()
    spark.sql("DROP TABLE IF EXISTS graft.tt2")
    spark.sql("CREATE TABLE graft.tt2 (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, content_len BIGINT, lang STRING) USING graft TBLPROPERTIES('buckets'='2')")
    spark.sql(
      """INSERT INTO graft.tt2
        |SELECT concat('v', id), timestamp_micros(1700000000000000 + id),
        |  cast('<p>a</p>' AS BINARY), CAST(NULL AS STRING), CAST(NULL AS BIGINT), 'en'
        |FROM range(10)""".stripMargin)
    val lake = graft.lake.LakeTable.load(java.nio.file.Paths.get(wh, "tt2"))
    val v1 = lake.currentSnapshotId
    spark.sql(
      """INSERT INTO graft.tt2
        |SELECT concat('v', id + 100), timestamp_micros(1800000000000000 + id),
        |  cast('<p>b</p>' AS BINARY), CAST(NULL AS STRING), CAST(NULL AS BIGINT), 'en'
        |FROM range(5)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft.tt2").head().getLong(0) == 15)
    assert(spark.sql(s"SELECT count(*) FROM graft.tt2 VERSION AS OF $v1").head().getLong(0) == 10)
    intercept[Exception](
      spark.sql("SELECT * FROM graft.tt2 VERSION AS OF 99999").collect())
  }

  test("INSERT INTO appends as an upsert MERGE batch (LWW against stored rows)") {
    enable()
    spark.sql("CREATE TABLE graft.ins (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, content_len BIGINT, lang STRING) USING graft TBLPROPERTIES('buckets'='4')")
    spark.sql(
      """INSERT INTO graft.ins
        |SELECT concat('w', id) AS url, timestamp_micros(1700000000000000 + id) AS warc_ts,
        |  cast(concat('<i>v1-', id, '</i>') AS BINARY) AS html,
        |  CAST(NULL AS STRING) AS text, CAST(NULL AS BIGINT) AS content_len, 'en' AS lang
        |FROM range(30)""".stripMargin)
    assert(spark.sql("SELECT * FROM graft.ins").count() == 30)
    // second insert with LATER timestamps for half the urls → LWW replace
    spark.sql(
      """INSERT INTO graft.ins
        |SELECT concat('w', id) AS url, timestamp_micros(1800000000000000 + id) AS warc_ts,
        |  cast(concat('<i>v2-', id, '</i>') AS BINARY) AS html,
        |  CAST(NULL AS STRING) AS text, CAST(NULL AS BIGINT) AS content_len, 'en' AS lang
        |FROM range(15)""".stripMargin)
    val rows = spark.sql("SELECT url, text FROM graft.ins").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rows.size == 30)
    assert(rows("w3") == "v2-3" && rows("w20") == "v1-20")
    // text/content_len are engine-derived from html (extraction ran)
    val cl = spark.sql("SELECT content_len FROM graft.ins WHERE url = 'w3'").head().getLong(0)
    assert(cl == "<i>v2-3</i>".length)
    // each INSERT committed as one exactly-once batch
    val lake = graft.lake.LakeTable.load(java.nio.file.Paths.get(wh, "ins"))
    assert(lake.currentSnapshot.batches.map(_.batchId) == Seq(0L, 1L))
    // staging cleaned up
    assert(!java.nio.file.Files.isDirectory(lake.root.resolve("staging")) ||
      { val s = java.nio.file.Files.list(lake.root.resolve("staging"))
        try !s.findFirst().isPresent finally s.close() })
  }
}
