package graft.lake

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sql.GraftSql

/** Per-file bloom sidecars: maintenance build, point-lookup file skipping,
  * false-positive safety, GC ride-along. */
class BloomSpec extends SparkSpec {

  test("blooms skip delta files a point lookup cannot hit; correctness unchanged; GC removes sidecars") {
    val wh = tmpDir("bloom-wh").toString
    GraftSql.enable(spark, wh)
    spark.sql("DROP TABLE IF EXISTS graft.bl")
    spark.sql("CREATE TABLE graft.bl (url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, content_len BIGINT, lang STRING) USING graft TBLPROPERTIES('buckets'='2')")
    // 3 MOR batches over DISJOINT url ranges → each bucket holds 3 delta
    // files; a given url exists in exactly ONE of them
    spark.conf.set(GraftSql.MergeModeConf, "mor")
    try {
      // url scheme u<id>-r<r>: every delta file's [min,max] bounds span the
      // whole id range (bounds can NOT discriminate), yet each url lives in
      // exactly one file — the case only a bloom can prune
      (0 until 3).foreach { r =>
        spark.sql(
          s"""INSERT INTO graft.bl
             |SELECT concat('u', lpad(CAST(id AS STRING), 4, '0'), '-r$r') AS url,
             |  timestamp_micros(${1700000000000000L + r} + id) AS warc_ts,
             |  cast('<p>x</p>' AS BINARY), CAST(NULL AS STRING), CAST(NULL AS BIGINT), 'en'
             |FROM range(200)""".stripMargin)
      }
    } finally spark.conf.unset(GraftSql.MergeModeConf)

    val lake = LakeTable.load(java.nio.file.Paths.get(wh, "bl"))
    val snap = lake.currentSnapshot
    assert(snap.files.groupBy(_.bucket).forall(_._2.size == 3))

    def filesPlanned(key: String): Int = {
      val scan = new graft.sql.GraftLakeScan(lake, None)
      scan.pushFilters(Array(org.apache.spark.sql.sources.EqualTo("url", key)))
      scan.planInputPartitions()
        .map(_.asInstanceOf[graft.sql.GraftBucketPartition].files.size).sum
    }

    val key = "u0077-r1"
    val before = filesPlanned(key)
    assert(before >= 2, s"bounds alone should admit several delta files (got $before)")

    assert(Maintain.buildBlooms(spark, lake) == snap.files.size)
    assert(Maintain.buildBlooms(spark, lake) == 0) // idempotent
    val after = filesPlanned(key)
    assert(after < before, s"bloom should skip files ($before -> $after)")
    assert(after >= 1)

    // results identical with blooms active (and residual filters re-applied)
    val row = spark.sql(s"SELECT url FROM graft.bl WHERE url = '$key'").collect()
    assert(row.map(_.getString(0)).toSeq == Seq(key))
    assert(spark.sql("SELECT * FROM graft.bl WHERE url = 'absent'").count() == 0)
    assert(spark.sql("SELECT count(*) FROM graft.bl").head().getLong(0) == 600)

    // AUTOMATIC (MOR) compaction inherits coverage: replaced files had
    // sidecars, so the compacted replacements come out covered inline
    graft.cdc.Merge.compactBuckets(spark, lake, Set(0))
    assert(lake.currentSnapshot.files.filter(_.bucket == 0).forall(f =>
      java.nio.file.Files.exists(Bloom.sidecar(lake.root.resolve(f.path)))))
    assert(spark.sql("SELECT count(*) FROM graft.bl").head().getLong(0) == 600)

    // compaction with inline blooms: the fresh files come out covered
    Maintain.compact(spark, lake, withBlooms = true)
    assert(lake.currentSnapshot.files.forall(f =>
      java.nio.file.Files.exists(Bloom.sidecar(lake.root.resolve(f.path)))))
    // another compaction WITHOUT blooms + expiry: orphaned data files take
    // their sidecars with them, fresh files are bloom-less
    Maintain.compact(spark, lake)
    val (_, deleted) = Maintain.expireSnapshots(lake, keepLast = 1)
    assert(deleted > 0)
    val leftover = {
      val s = java.nio.file.Files.walk(lake.root)
      try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.count(_.getFileName.toString.endsWith(".bloom"))
      finally s.close()
    }
    // only blooms of still-referenced files may remain (compact output has
    // none until the next buildBlooms)
    assert(leftover == 0)
  }

  implicit class IterOps[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = scala.jdk.CollectionConverters.IteratorHasAsScala(it).asScala
  }
}
