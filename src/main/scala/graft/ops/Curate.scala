package graft.ops

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.LakeTable

/** The CDC → curation loop: the composition a training-data pipeline runs
  * on top of this engine. As change batches MERGE into the url-keyed
  * LakeTable, each curation increment
  *
  *  1. reads the table's CHANGE FEED for a snapshot span
  *     ([[LakeTable.readIncrement]] — under merge-on-read exactly the span's
  *     post-dedup winners: upserts + tombstones, no table rescan),
  *  2. keeps live upserts and scores them (language ID + quality heuristics,
  *     [[TextOps]] — codegen'd column expressions),
  *  3. probes the quality-passing docs against the PERSISTED near-dup index
  *     and appends them to it ([[LshIndex.probeAndAppend]] — partition-pruned
  *     probe, O(increment) index growth),
  *
  * so curation cost per increment is O(changed docs), never O(table) — the
  * property that matters at 10^10 rows. Deletes need no index maintenance:
  * a tombstoned url's stale index entries can only surface as near-dup
  * evidence against OLD content, and downstream joins back to the live
  * table drop them (documented contract; a periodic index rebuild GCs them).
  *
  * A long-lived curator should [[LakeTable.pin]] its `from` snapshot so
  * expiry retains the span (see readIncrement's pin contract).
  */
object Curate {

  /** Scored live docs of the span `(fromSnapshotId, toSnapshotId]`:
    * url, text, lang_guess, quality, token count. */
  def scoredIncrement(spark: SparkSession, table: LakeTable,
      fromSnapshotId: Long, toSnapshotId: Option[Long] = None): DataFrame = {
    val feed = table.readIncrement(spark, fromSnapshotId, toSnapshotId)
    feed.filter(!col("_deleted") && col("text").isNotNull)
      .select(col("url"), col("text"), col("warc_ts"),
        TextOps.langId(col("text")).as("lang_guess"),
        TextOps.qualityScore(col("text")).as("quality"),
        TextOps.tokenCount(col("text")).as("tokens"))
  }

  /** Result of one curation increment: the quality-passing docs of the span
    * and their near-dup hits against everything curated BEFORE the span. */
  final case class Increment(kept: DataFrame, nearDups: DataFrame)

  /** Run one increment end to end: score the span's winners, keep docs
    * passing the quality/length gate, probe-then-append the LSH index.
    * `nearDups` columns: (new_id = url, old_id = previously indexed url,
    * match_frac).
    *
    * EXACTLY-ONCE REPLAY: the index append is keyed by the resolved span
    * `(fromSnapshotId, to]`, so re-running the same increment after a crash
    * (between the index append and the caller's own downstream commit)
    * OVERWRITES the span's rows instead of duplicating them — duplicate
    * index rows would inflate the bucket-cap counts and silently drop a
    * genuinely-hot bucket from candidate generation. The open-ended `to` is
    * pinned to the CURRENT head here so the replayed span is identical. */
  def curateIncrement(spark: SparkSession, table: LakeTable, lshDir: Path,
      fromSnapshotId: Long, toSnapshotId: Option[Long] = None,
      minQuality: Double = 0.0, minTokens: Int = 3,
      minMatchFrac: Double = 0.5): Increment = {
    val to = toSnapshotId.getOrElse(table.currentSnapshotId)
    val scored = scoredIncrement(spark, table, fromSnapshotId, Some(to))
    val kept = scored.filter(col("quality") >= minQuality && col("tokens") >= minTokens)
    val dups = LshIndex.probeAndAppend(spark, kept, "text", "url", lshDir,
      minMatchFrac = minMatchFrac, span = Some(s"$fromSnapshotId-$to"))
    Increment(kept, dups)
  }
}
