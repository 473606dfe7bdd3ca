package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-microbatch last-writer-wins dedup (operator A3 of SURVEY.md §2.4:
  * "keep max offset per partition" generalized to max `(warc_ts, offset)`
  * per `url`, mirroring `S3Offset.compareTo` total order —
  * `/root/reference/source/src/main/java/com/spredfast/kafka/connect/s3/source/S3Offset.java:46-49`).
  *
  * Implemented as `groupBy(url).agg(max_by(payload, orderKey))`, NOT a
  * ranking window: a hash aggregate does map-side partial aggregation, so a
  * hot url (Zipf head domain) is pre-collapsed on each executor before the
  * shuffle — the window form (`row_number over (partition by url)`) would
  * ship every duplicate of the hot key to one task. This is the first line
  * of skew defense required by the north rule; AQE skew handling covers the
  * join side.
  */
object Dedup {

  /** Order key: warc_ts, then offset, then partition (total order — ties in
    * (warc_ts, offset) across partitions broken deterministically). */
  private def orderKey = struct(col("warc_ts"), col("offset"), col("partition"))

  /** events(partition, offset, op, url, warc_ts, html, lang) →
    * one row per url: the winning event, keeping its envelope. */
  def latestPerUrl(events: DataFrame): DataFrame = {
    events
      .groupBy(col("url"))
      .agg(max_by(
        struct(col("op"), col("warc_ts"), col("html"), col("lang"),
          col("partition"), col("offset")), orderKey).as("w"))
      .select(col("url"), col("w.op").as("op"), col("w.warc_ts").as("warc_ts"),
        col("w.html").as("html"), col("w.lang").as("lang"),
        col("w.partition").as("partition"), col("w.offset").as("offset"))
  }
}
