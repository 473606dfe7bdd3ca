package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.lake._
import graft.model.TextExtract

/** Copy-on-write MERGE INTO for the url-keyed LakeTable.
  *
  * The reference has no joins; its analog of this operator is the
  * cursor→index→data dereference plus idempotent overwrite-on-replay
  * (`/root/reference/sink/src/main/java/com/spredfast/kafka/connect/s3/S3Writer.java:47-109`,
  * proven idempotent by the rewind IT,
  * `sink/src/test/.../S3SinkConnectorIT.java:474-612`). Here MERGE is a real
  * equi-join with last-writer-wins resolution:
  *
  *  1. prune — only target files whose `bucket` (and url bounds) intersect
  *     the batch are rewritten; everything else is carried forward untouched
  *     (manifest skip-scan ≙ chunk-index skip-scan),
  *  2. full-outer join target(touched) ↔ batch on (url, bucket); per url the
  *     winner is the side with greater `(warc_ts, offset, partition)` — the
  *     `S3Offset` total order — so a late event can never clobber a newer
  *     row, regardless of which microbatch it arrived in (SURVEY.md §2.9 T7),
  *  3. a winning delete is persisted as a TOMBSTONE row (`_deleted = true`):
  *     final state must be independent of how the log was split into
  *     batches, and only a durable tombstone beats a late upsert replayed
  *     after it,
  *  4. write per-bucket, sorted by url (deterministic replay), commit a new
  *     snapshot with the `(batchId, lineage)` marker.
  *
  * Scale: shuffle bounded by (touched target rows + batch rows); `nBuckets`
  * sizes rewrite granularity; AQE splits skewed buckets in the join; text
  * extraction runs only on post-dedup winners.
  */
object Merge {

  /** Apply one deduped batch. `batch` columns: url, op, warc_ts, html, lang,
    * partition, offset (one row per url). Returns the committed snapshot. */
  def apply(spark: SparkSession, table: LakeTable, batch: DataFrame,
      batchId: Long, lineage: Seq[PartLineage]): Snapshot = {
    val snap = table.currentSnapshot
    if (snap.committedBatchIds.contains(batchId)) return snap // exactly-once replay skip

    val nBuckets = snap.nBuckets
    val timing = sys.env.contains("GRAFT_TIMING")
    var tMark = System.nanoTime()
    def mark(what: String): Unit = if (timing) {
      val now = System.nanoTime()
      System.err.println(f"[timing]   merge/$what ${(now - tMark) / 1e9}%.1f s")
      tMark = now
    }
    val withBucket = batch.withColumn("bucket", LakeTable.bucketOf(col("url"), nBuckets))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // batch-side stats: touched buckets, url bounds, upsert/delete counts —
      // one small aggregate, O(nBuckets) on the driver.
      val stats = withBucket.groupBy(col("bucket")).agg(
        count(lit(1)).as("n"),
        min(col("url")).as("umin"), max(col("url")).as("umax"),
        sum(when(col("op") === "upsert", 1L).otherwise(0L)).as("ups"))
        .collect()
      mark("batch-stats")
      if (stats.isEmpty) return snap
      val srcBuckets = stats.map(r => r.getInt(0)).toSet
      val bounds = stats.map(r => r.getInt(0) -> (r.getString(2), r.getString(3))).toMap
      val upserts = stats.map(_.getLong(4)).sum
      val total = stats.map(_.getLong(1)).sum
      val deletes = total - upserts

      // 1. prune
      val (touched, untouched) = snap.files.partition { f =>
        srcBuckets.contains(f.bucket) && {
          val (umin, umax) = bounds(f.bucket)
          f.urlMin <= umax && umin <= f.urlMax
        }
      }

      val logical = TableSchemas.forVersion(snap.schemaVersion)
      val dataCols = logical.fieldNames.toSeq.filterNot(TableSchemas.internalNames.contains)

      // 2. batch side in table shape: text recomputed from html (the
      //    invariant: text is ALWAYS extractor(html), never trusted from the
      //    wire), deletes become tombstone candidates.
      val srcRows = withBucket
        .withColumn("text",
          when(col("op") === "upsert", TextExtract.udf(col("html"))).otherwise(lit(null)))
        .withColumn("content_len",
          when(col("html").isNull, lit(null)).otherwise(length(col("html")).cast("long")))
        .withColumn("_seq_part", col("partition"))
        .withColumn("_seq_offset", col("offset"))
        .withColumn("_deleted", col("op") === "delete")
      // align to the logical schema's types (v1 tables store content_len
      // narrow; v1 has no lang — dataCols already reflects that)
      val typeOf = logical.fields.map(f => f.name -> f.dataType).toMap
      val srcCols = (dataCols ++ TableSchemas.internalNames).map(c => col(c).cast(typeOf(c)).as(c)) :+ col("bucket")
      val source = srcRows.select(srcCols: _*)

      // 3. conditional LWW resolution via full-outer join on (url, bucket)
      val target = table.readFiles(spark, snap, touched)
        .withColumn("bucket", LakeTable.bucketOf(col("url"), nBuckets))
      val t = target.alias("t")
      val s = source.alias("s")
      val joined = t.join(s, col("t.url") === col("s.url"), "full_outer")
      val tSeq = struct(col("t.warc_ts"), col("t._seq_offset"), col("t._seq_part"))
      val sSeq = struct(col("s.warc_ts"), col("s._seq_offset"), col("s._seq_part"))
      val takeSource = col("t.url").isNull || (col("s.url").isNotNull && sSeq > tSeq)
      def pick(c: String): Column = when(takeSource, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
      val allCols = dataCols ++ TableSchemas.internalNames :+ "bucket"
      val merged = joined.select(allCols.map(pick): _*)

      // 4. per-bucket stats for the manifest, then deterministic write.
      // `merged` is persisted so the join + text extraction run ONCE (the
      // stats pass and the write pass would otherwise both compute it).
      val mergedP = merged.persist(StorageLevel.MEMORY_AND_DISK)
      val nextId = snap.snapshotId + 1
      val newFiles = try {
        val mergedStats = mergedP.groupBy(col("bucket")).agg(
          count(lit(1)).as("n"), min(col("url")).as("umin"), max(col("url")).as("umax"))
          .collect()
          .map(r => r.getInt(0) -> (r.getLong(1), r.getString(2), r.getString(3))).toMap
        mark("join+extract+stats")
        val writePartitions = math.max(1, mergedStats.size)
        val out = mergedP
          .repartition(writePartitions, col("bucket"))
          .sortWithinPartitions(col("bucket"), col("url"))
        val nf = table.writeDataFiles(out, nextId, snap.schemaVersion, mergedStats)
        mark("write+footers")
        nf
      } finally mergedP.unpersist()

      val newTotal = untouched.map(_.rowCount).sum + newFiles.map(_.rowCount).sum
      val next = snap.copy(
        snapshotId = nextId,
        parentId = snap.snapshotId,
        files = untouched ++ newFiles,
        batches = snap.batches :+ BatchMarker(batchId, lineage, upserts, deletes),
        totalRows = newTotal)
      table.commit(next)
      next
    } finally withBucket.unpersist()
  }
}
