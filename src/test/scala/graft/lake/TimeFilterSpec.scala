package graft.lake

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Event-time statistics in the manifest and the time-range prune.
  *
  * The prune's soundness is ASYMMETRIC on the LWW-resolved read: winner
  * resolution (max (warc_ts, offset, partition) per url) commutes with a
  * LOWER bound on warc_ts — skipping all-older files either skips a url
  * whose winner the residual filter drops anyway, or promotes an older
  * loser the residual filter drops — but NOT with an upper bound: skipping
  * an all-newer file would un-shadow an older version (or un-delete a
  * tombstoned url). The raw change feed does no resolution, so both bounds
  * prune there. These tests nail both directions.
  */
class TimeFilterSpec extends SparkSpec {

  private def ts(micros: Long): Timestamp = {
    val t = new Timestamp(micros / 1000)
    t.setNanos(((micros % 1000000) * 1000).toInt)
    t
  }

  /** changelog batch: (url, op, tsMicros) rows at sequential offsets. */
  private def batch(rows: Seq[(String, String, Long)], partition: Int = 0,
      startOffset: Long = 0L): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((url, op, m), i) =>
      (partition, startOffset + i, op, url, ts(m),
        if (op == "delete") null else s"<html>$url@$m</html>".getBytes("UTF-8"), "en")
    }.toDF("partition", "offset", "op", "url", "warc_ts", "html", "lang")
  }

  private def fileCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec =>
        b.inputPartitions.collect {
          case p: graft.sql.GraftBucketPartition => p.files.size
        }.sum
    }.getOrElse(fail("no BatchScanExec"))

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")

  private val Day = 86400L * 1000000L
  private val T0 = 1700000000L * 1000000L // stable epoch-micros anchor

  /** Two-era MOR table: batch 0 all-old rows, batch 1 all-new rows, so every
    * bucket holds one old delta file and one new one. u-shadow gets updated
    * across the eras; u-tomb gets tombstoned in the new era. */
  private def twoEraTable(): LakeTable = {
    val root = tmpDir("tfilter")
    val t = LakeTable.create(root, nBuckets = 2)
    val old = batch(
      (0 until 20).map(i => (s"old$i", "upsert", T0 + i)) ++
        Seq(("u-shadow", "upsert", T0 + 50), ("u-tomb", "upsert", T0 + 60)),
      startOffset = 0L)
    graft.cdc.Ingest.applyBatch(spark, t, mode = graft.cdc.Mor)(old, 0L)
    val fresh = batch(
      (0 until 20).map(i => (s"new$i", "upsert", T0 + 10 * Day + i)) ++
        Seq(("u-shadow", "upsert", T0 + 10 * Day + 50),
          ("u-tomb", "delete", T0 + 10 * Day + 60)),
      startOffset = 100L)
    graft.cdc.Ingest.applyBatch(spark, t, mode = graft.cdc.Mor)(fresh, 1L)
    t
  }

  test("manifest records warc_ts bounds from the footers (TIMESTAMP_MICROS write)") {
    val t = twoEraTable()
    val files = t.currentSnapshot.files
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(f.tsMinMicros != DataFile.NoTsMin && f.tsMaxMicros != DataFile.NoTsMax,
        s"file ${f.path} has no ts stats — INT96 write regression?")
      assert(f.tsMinMicros <= f.tsMaxMicros)
    }
    // the two eras' files are disjoint in time
    val oldMax = files.filter(_.tsMaxMicros < T0 + Day).map(_.tsMaxMicros)
    val newMin = files.filter(_.tsMinMicros > T0 + Day).map(_.tsMinMicros)
    assert(oldMax.nonEmpty && newMin.nonEmpty)
    assert(oldMax.max < newMin.min)
  }

  test("lower-bound filter prunes old files; result identical to filter-above-read") {
    val t = twoEraTable()
    val cut = ts(T0 + Day) // between the eras
    val pruned = t.read(spark).filter(col("warc_ts") >= lit(cut))
    val control = t.read(spark).select(col("url"), unix_micros(col("warc_ts")))
      .collect().filter(_.getLong(1) >= T0 + Day).map(_.getString(0))
    val desc = scanDesc(pruned)
    assert(desc.contains("tsLower>="), desc.take(600))
    assert(fileCount(pruned) < fileCount(t.read(spark)),
      s"no files pruned: ${fileCount(pruned)}")
    val got = pruned.collect()
    assert(got.map(_.getString(0)).sorted.sameElements(control.sorted))
    // the winners: all new-era urls + the updated u-shadow; u-tomb is deleted
    val urls = got.map(_.getString(0)).toSet
    assert(urls.contains("u-shadow") && !urls.contains("u-tomb"))
    assert((0 until 20).forall(i => urls.contains(s"new$i")))
    assert((0 until 20).forall(i => !urls.contains(s"old$i")))
  }

  test("upper-bound filter must NOT prune: un-shadow and un-delete hazards") {
    val t = twoEraTable()
    val cut = ts(T0 + Day)
    val upper = t.read(spark).filter(col("warc_ts") <= lit(cut))
    // files are NOT pruned on an upper bound (and the plan says so)
    assert(fileCount(upper) == fileCount(t.read(spark)),
      s"upper bound pruned files: ${scanDesc(upper).take(600)}")
    assert(!scanDesc(upper).contains("tsLower"), scanDesc(upper).take(600))
    val urls = upper.collect().map(_.getString(0)).toSet
    // u-shadow's winner is NEW-era (filtered out) — the old version must not
    // re-emerge; u-tomb is deleted — the pre-delete version must not re-emerge
    assert(!urls.contains("u-shadow"), "upper-bound prune un-shadowed an old version")
    assert(!urls.contains("u-tomb"), "upper-bound prune un-deleted a tombstoned url")
    assert((0 until 20).forall(i => urls.contains(s"old$i")))
  }

  test("EqualTo(warc_ts) contributes only its lower bound, never a row equality") {
    val t = twoEraTable()
    // u-shadow's OLD version sits exactly at T0+50; its winner is newer.
    // An (unsound) pushed equality would resurface the old version.
    val eq = t.read(spark).filter(col("warc_ts") === lit(ts(T0 + 50)))
    assert(eq.collect().isEmpty,
      "equality on a shadowed version's timestamp must return nothing")
    // but the implied lower bound still prunes nothing incorrectly: an
    // equality INSIDE the new era still finds its winner
    val hit = t.read(spark).filter(col("warc_ts") === lit(ts(T0 + 10 * Day + 50)))
    assert(hit.collect().map(_.getString(0)).toSeq == Seq("u-shadow"))
  }

  test("change feed prunes on BOTH bounds (raw rows, no resolution)") {
    val t = twoEraTable()
    val feed = spark.read.format("graft-feed")
      .option("path", t.root.toString).option("fromSnapshot", "genesis").load()
    val cut = ts(T0 + Day)
    val older = feed.filter(col("warc_ts") <= lit(cut))
    val newer = feed.filter(col("warc_ts") > lit(cut))
    val allFiles = feedFileCount(feed)
    assert(feedFileCount(older) < allFiles, scanDesc(older).take(600))
    assert(feedFileCount(newer) < allFiles, scanDesc(newer).take(600))
    assert(scanDesc(older).contains("ts<="), scanDesc(older).take(600))
    assert(scanDesc(newer).contains("ts>"), scanDesc(newer).take(600))
    // value parity with filter-above-full-feed; the feed keeps tombstones
    val full = feed.select(col("url"), unix_micros(col("warc_ts"))).collect()
    assert(older.collect().map(_.getString(0)).sorted.sameElements(
      full.filter(_.getLong(1) <= T0 + Day).map(_.getString(0)).sorted))
    assert(newer.collect().map(_.getString(0)).sorted.sameElements(
      full.filter(_.getLong(1) > T0 + Day).map(_.getString(0)).sorted))
    assert(newer.filter(col("url") === "u-tomb").count() == 1) // the tombstone row
  }

  test("fromTimestamp attaches the feed at a wall-clock point (strictly-after)") {
    val t = twoEraTable()
    val ids = t.snapshotIds
    assert(ids.size >= 3, ids) // create + 2 MOR batches at least
    val mid = ids(ids.size / 2)
    val stamp = t.snapshot(mid).commitTsMs
    def rows(df: DataFrame): Set[(String, Long)] =
      df.select(col("url"), col("_feed_snapshot")).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
    def feed(opts: (String, String)*): DataFrame =
      opts.foldLeft(spark.read.format("graft-feed").option("path", t.root.toString))(
        (r, o) => r.option(o._1, o._2)).load()

    // at mid's exact stamp == fromSnapshot=mid (changes strictly after it)
    val byId = rows(feed("fromSnapshot" -> mid.toString))
    assert(byId.nonEmpty)
    assert(rows(feed("fromTimestamp" -> stamp.toString)) == byId)
    // 1ms earlier resolves to mid's parent — mid's own changes re-enter the
    // span; ISO-8601 form accepted
    val prev = ids(ids.indexOf(mid) - 1)
    val iso = java.time.Instant.ofEpochMilli(stamp - 1).toString
    assert(rows(feed("fromTimestamp" -> iso)) ==
      rows(feed("fromSnapshot" -> prev.toString)))
    // both options together rejected; pre-genesis timestamp fails loudly
    intercept[Exception](
      feed("fromTimestamp" -> stamp.toString, "fromSnapshot" -> "genesis").collect())
    val genesisStamp = t.snapshot(ids.head).commitTsMs
    intercept[Exception](feed("fromTimestamp" -> (genesisStamp - 1).toString).collect())

    // STREAMING attach: lazy resolution in initialOffset (fresh start) —
    // drained rows equal the batch span from the same wall-clock point
    val got = scala.collection.mutable.Set[(String, Long)]()
    val q = spark.readStream.format("graft-feed")
      .option("path", t.root.toString)
      .option("fromTimestamp", stamp.toString)
      .load()
      .writeStream
      .option("checkpointLocation", tmpDir("ftck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (df: DataFrame, _: Long) =>
        got.synchronized { got ++= rows(df) }: Unit
      }
      .start()
    q.awaitTermination()
    assert(got.toSet == byId)
  }

  private def feedFileCount(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case b: BatchScanExec => b.inputPartitions.length
    }.getOrElse(fail("no BatchScanExec in feed plan"))

  test("pre-stats manifests read as unbounded and are never pruned") {
    val json =
      """{"snapshot_id":3,"parent_id":2,"schema_version":1,"n_buckets":2,
        |"total_rows":1,
        |"files":[{"path":"data/s3/bucket=0/x.parquet","bucket":0,"row_count":1,
        |"url_min":"a","url_max":"a","schema_version":1,"bytes":10,"tier":2}],
        |"batches":[]}""".stripMargin
    val s = Snapshot.fromJson(json)
    val f = s.files.head
    assert(f.tsMinMicros == DataFile.NoTsMin && f.tsMaxMicros == DataFile.NoTsMax)
    // unbounded admits every range
    assert(FeedSource.fileAdmitsTime(f, Some((123L, false)), Some((456L, true))))
    // and bounded files round-trip through JSON exactly
    val g = f.copy(tsMinMicros = 5L, tsMaxMicros = 9L)
    val rt = Snapshot.fromJson(s.copy(files = Vector(g)).toJson).files.head
    assert(rt.tsMinMicros == 5L && rt.tsMaxMicros == 9L)
    assert(!FeedSource.fileAdmitsTime(g, Some((10L, false)), None)) // tsMax 9 < 10
    assert(!FeedSource.fileAdmitsTime(g, Some((9L, true)), None)) // strict > 9
    assert(FeedSource.fileAdmitsTime(g, Some((9L, false)), None))
    assert(!FeedSource.fileAdmitsTime(g, None, Some((5L, true)))) // tsMin 5 !< 5
    assert(FeedSource.fileAdmitsTime(g, None, Some((5L, false))))
  }
}
