package graft.sql

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.binlog.{BinlogRead, ChangeEventGen, GenProfile, Segment}
import graft.cdc.{Ingest, Mor}
import graft.lake.{LakeTable, Resolve, TableSchemas}

/** The co-located k-way read over a MIXED-version table: v1-era delta files
  * (no lang, int content_len) and v2 files in the SAME bucket must resolve
  * together, with the reader's generic alignment (cast + null-fill from
  * bound references) matching the shuffle-resolve reference exactly. */
class MixedSchemaReadSpec extends SparkSpec {

  test("k-way resolve over mixed v1+v2 delta files == shuffle resolve; SQL read agrees") {
    val p = GenProfile.evolving().copy(partitions = 2, eventsPerPartition = 800)
    val binlog = tmpDir("msbl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 500)
    val boundary = (p.eventsPerPartition * p.v2FromFraction).toLong

    val root = tmpDir("mstbl")
    val table = LakeTable.create(root, nBuckets = 4, schemaVersion = 1)
    // v1-era MOR deltas, then evolve, then v2-era MOR deltas — buckets now
    // hold v1 AND v2 delta files simultaneously
    Ingest.applyBatch(spark, table, mode = Mor)(
      BinlogRead.range(spark, binlog.toString, 0L, boundary), 0L)
    table.evolveSchema(2)
    Ingest.applyBatch(spark, table, mode = Mor)(
      BinlogRead.range(spark, binlog.toString, boundary, p.eventsPerPartition), 1L)
    val snap = table.currentSnapshot
    assert(snap.files.map(_.schemaVersion).toSet == Set(1, 2))
    assert(snap.files.groupBy(_.bucket).exists(_._2.map(_.schemaVersion).toSet.size == 2),
      "need a bucket holding BOTH schema versions")

    // reference: the shuffle resolve (align + Resolve.lww), same snapshot
    val dataCols = TableSchemas.forVersion(snap.schemaVersion)
      .fieldNames.toSeq.filterNot(TableSchemas.internalNames.contains)
    // html is binary — project to md5 so Row.toString is value-comparable
    def canon(df: org.apache.spark.sql.DataFrame): Array[String] = df
      .select(col("url"), unix_micros(col("warc_ts")).as("ts"), md5(col("html")).as("h"),
        col("text"), col("content_len"), col("lang"))
      .collect().map(_.toString).sorted
    val reference = canon(Resolve.lww(
      table.readFiles(spark, snap, snap.files).repartition(4, col("url")), dataCols)
      .filter(!col("_deleted")).drop(TableSchemas.internalNames: _*))

    val viaRead = canon(table.read(spark))
    assert(viaRead.sameElements(reference),
      s"read-diff=${viaRead.diff(reference).take(3).mkString(";")} ref-diff=${reference.diff(viaRead).take(3).mkString(";")}")

    // SQL path over the same table
    val wh = root.getParent.toString
    GraftSql.enable(spark, wh)
    val viaSql = canon(spark.sql(s"SELECT * FROM graft.`${root.getFileName}`"))
    assert(viaSql.sameElements(reference))

    // v1-era winners carry null lang; v2-era winners carry one
    val byLang = table.read(spark).groupBy(col("lang").isNull.as("noLang")).count()
      .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byLang.getOrElse(true, 0L) > 0 && byLang.getOrElse(false, 0L) > 0)
  }
}
