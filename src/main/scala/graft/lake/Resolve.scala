package graft.lake

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._



/** Shared last-writer-wins resolution: one row per url, winner by the
  * `S3Offset`-style total order `(warc_ts, _seq_offset, _seq_part)`
  * (`/root/reference/source/src/main/java/com/spredfast/kafka/connect/s3/source/S3Offset.java:46-49`).
  * Input rows must already carry the internal columns. */
object Resolve {
  /** Columns resolved (everything in the logical schema). */
  def lww(df: DataFrame, dataCols: Seq[String]): DataFrame = {
    val payloadCols = dataCols.filterNot(_ == "url") ++ TableSchemas.internalNames
    val payload = struct(payloadCols.map(col): _*)
    val seq = struct(col("warc_ts"), col("_seq_offset"), col("_seq_part"))
    df.groupBy(col("url"))
      .agg(max_by(payload, seq).as("w"))
      .select(col("url") +: payloadCols.map(c => col(s"w.$c").as(c)): _*)
  }
}
