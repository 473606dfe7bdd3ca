package graft.cdc

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Explicit hot-key (skew) defense for keyed aggregations.
  *
  * The default dedup ([[Dedup.latestPerUrl]]) already survives hot urls via
  * hash-aggregate partial aggregation (map-side collapse before the
  * shuffle). This operator adds the classic SALTED two-phase form for
  * engines/paths where partial aggregation is unavailable or insufficient
  * (e.g. sort-based aggregation over very wide payloads, or a Zipf head so
  * extreme that even combined partials skew the reduce side):
  *
  *   phase 1 — groupBy(url, salt) where salt = pmod(xxhash64(offset), S):
  *     a hot url's rows spread over S reducers, each emitting one candidate
  *     winner;
  *   phase 2 — groupBy(url) over ≤ S candidates per url.
  *
  * Result is IDENTICAL to the unsalted dedup for any salt count (max over a
  * set is associative). (north_rule: "salted repartitionByRange on url-hash
  * to defuse hot-domain skew".)
  */
object SkewOps {

  private def orderKey = struct(col("warc_ts"), col("offset"), col("partition"))
  private def payload = struct(col("op"), col("warc_ts"), col("html"), col("lang"),
    col("partition"), col("offset"))

  /** Salted last-writer-wins per url. */
  def saltedLatestPerUrl(events: DataFrame, salts: Int = 16): DataFrame = {
    require(salts > 0)
    val salted = events.withColumn("_salt", pmod(xxhash64(col("offset")), lit(salts.toLong)))
    val partial = salted
      .groupBy(col("url"), col("_salt"))
      .agg(max_by(payload, orderKey).as("w"))
      .select(col("url"), col("w.*"))
    partial
      .groupBy(col("url"))
      .agg(max_by(payload, orderKey).as("w"))
      .select(col("url"), col("w.op").as("op"), col("w.warc_ts").as("warc_ts"),
        col("w.html").as("html"), col("w.lang").as("lang"),
        col("w.partition").as("partition"), col("w.offset").as("offset"))
  }
}
