package graft.model

import java.sql.Timestamp

import org.apache.spark.sql.types._

/** One CDC change event from the binlog/WAL-style stream.
  *
  * The envelope `(partition, offset)` mirrors the reference's record
  * identity `(topic, partition, offset)` — see
  * `/root/reference/source/src/main/java/com/spredfast/kafka/connect/s3/source/S3SourceRecord.java:3-19`
  * and `common/.../BlockMetadata.java:5-21`. `offset` is contiguous per
  * partition and is the total order within a partition (≙ `S3Offset`,
  * `source/.../S3Offset.java:46-49`).
  *
  * Payload schema per BASELINE.json `input_hint`:
  * (url string, warc_ts timestamp, html binary, lang string); `text` is
  * never carried on the wire — it is always recomputed deterministically
  * from `html` by [[TextExtract]].
  */
final case class ChangeEvent(
    partition: Int,
    offset: Long,
    op: String, // "upsert" | "delete"
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte], // null for deletes
    lang: String)

object ChangeEvent {
  val OpUpsert = "upsert"
  val OpDelete = "delete"

  /** Wire/DataFrame schema of the change stream. */
  val schema: StructType = StructType(Seq(
    StructField("partition", IntegerType, nullable = false),
    StructField("offset", LongType, nullable = false),
    StructField("op", StringType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = true),
    StructField("lang", StringType, nullable = true)))
}

/** One row of the url-keyed lake table (final, deduped state). */
final case class PageRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

object PageRow {
  /** Lake table schema v2 (current). v1 lacked `lang` — see lake.TableSchemas. */
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true)))
}
