package graft.lake

import org.apache.spark.sql.types._

/** Versioned lake-table schemas (Iceberg-style schema evolution, built
  * in-repo because no Iceberg jar exists in this sandbox — SURVEY.md §7.0).
  *
  * Evolution rules supported (per north_rule): added columns (absent rows
  * read as null) and type widening on the payload. Files written under an
  * old schema version are read with that version's physical schema, cast to
  * the current logical schema, and `unionByName`-aligned — so replaying the
  * full change log after a widen yields the same logical rows.
  */
object TableSchemas {

  /** Internal (engine) columns, present in every schema version:
    *  - `_seq_part`/`_seq_offset`: envelope of the winning event — the
    *    MERGE tie-break total order `(warc_ts, _seq_offset, _seq_part)`,
    *    mirroring `S3Offset.compareTo`
    *    (`/root/reference/source/.../S3Offset.java:46-49`);
    *  - `_deleted`: tombstone marker. Deletes must be persisted (not just
    *    dropped) or the final state would depend on how the log is split
    *    into microbatches: a late upsert arriving after the delete's batch
    *    must still lose to the tombstone. Tombstones are filtered from
    *    user-facing reads and can be GC'd once older than the replay
    *    horizon. */
  val internalFields: Seq[StructField] = Seq(
    StructField("_seq_part", IntegerType, nullable = false),
    StructField("_seq_offset", LongType, nullable = false),
    StructField("_deleted", BooleanType, nullable = false))

  val internalNames: Seq[String] = internalFields.map(_.name)

  /** v1: no `lang`; `content_len` stored narrow (int). */
  val v1: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("content_len", IntegerType, nullable = true)) ++ internalFields)

  /** v2 (current): `lang` added; `content_len` widened int → long. */
  val v2: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("warc_ts", TimestampType, nullable = false),
    StructField("html", BinaryType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("content_len", LongType, nullable = true),
    StructField("lang", StringType, nullable = true)) ++ internalFields)

  val current: Int = 2

  def forVersion(v: Int): StructType = v match {
    case 1 => v1
    case 2 => v2
    case other => throw new IllegalArgumentException(s"unknown schema version $other")
  }
}
