package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.LakeTable

/** Iceberg-style METADATA TABLES over a graft table's snapshot state —
  * `SELECT * FROM graft.`t$snapshots`` / `t$files` / `t$batches` — the
  * observability surface a lake user expects (Iceberg's `db.table.history`
  * / `.files` metadata tables re-expressed for this format):
  *
  *  - `$snapshots`: one row per retained snapshot (id, parent, schema
  *    version, bucket count, file/batch tallies, bytes, rows) — the commit
  *    history, time-travel targets included;
  *  - `$files`: one row per live data file of the CURRENT snapshot with its
  *    pruning stats (bucket, tier, row count, bytes, url bounds) — what
  *    manifest pruning sees;
  *  - `$batches`: one row per (committed batch, lineage run) of the current
  *    snapshot — the exactly-once audit trail (SQL/bootstrap batches carry
  *    no lineage and surface as a single null-partition row);
  *  - `$partitions`: per-bucket rollup of the current snapshot (files,
  *    delta depth, bytes, stored rows, url bounds) — the skew/compaction
  *    dashboard: hot buckets by bytes, merge-on-read depth vs the fold
  *    trigger, at a glance.
  *
  * Metadata is O(snapshots + files + batches) — driver-small by the same
  * argument the snapshot JSON itself relies on — so the scan ships the rows
  * in one input partition. Read-only; never listed by SHOW TABLES (resolved
  * only through the `$` suffix in [[GraftCatalog.loadTable]]). */
final class GraftMetaTable(lake: LakeTable, ident: String, kind: String)
    extends Table with SupportsRead {

  override def name(): String = ident
  override def schema(): StructType = GraftMetaTable.schemaOf(kind)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = schema()
      override def description(): String = s"GraftMetaScan($ident)"
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(GraftMetaRows(GraftMetaTable.rowsOf(lake, kind)))
      override def createReaderFactory(): PartitionReaderFactory =
        new PartitionReaderFactory {
          override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
            val rows = p.asInstanceOf[GraftMetaRows].rows.iterator
            new PartitionReader[InternalRow] {
              private var cur: Array[Any] = _
              override def next(): Boolean = {
                if (!rows.hasNext) return false
                cur = rows.next(); true
              }
              override def get(): InternalRow = {
                val r = new GenericInternalRow(cur.length)
                var i = 0
                while (i < cur.length) {
                  r.update(i, cur(i) match {
                    case s: String => UTF8String.fromString(s)
                    case v => v
                  })
                  i += 1
                }
                r
              }
              override def close(): Unit = ()
            }
          }
        }
    }
}

/** The one input partition: metadata rows as plain serializable values
  * (String/Long/Int/null), converted to InternalRow in the reader. */
final case class GraftMetaRows(rows: Seq[Array[Any]]) extends InputPartition

object GraftMetaTable {
  val Kinds: Set[String] =
    Set("snapshots", "files", "batches", "tags", "branches", "partitions")

  def schemaOf(kind: String): StructType = kind match {
    case "snapshots" => StructType(Seq(
      StructField("snapshot_id", LongType, nullable = false),
      StructField("parent_id", LongType, nullable = false),
      // commit wall-clock in epoch millis; null = pre-stamp manifest (not
      // TIMESTAMP AS OF-addressable, only VERSION AS OF)
      StructField("commit_ts_ms", LongType, nullable = true),
      StructField("schema_version", IntegerType, nullable = false),
      StructField("n_buckets", IntegerType, nullable = false),
      StructField("n_files", IntegerType, nullable = false),
      StructField("n_batches", IntegerType, nullable = false),
      StructField("total_bytes", LongType, nullable = false),
      StructField("total_rows", LongType, nullable = false)))
    case "files" => StructType(Seq(
      StructField("path", StringType, nullable = false),
      StructField("bucket", IntegerType, nullable = false),
      StructField("tier", IntegerType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("url_min", StringType, nullable = true),
      StructField("url_max", StringType, nullable = true),
      // event-time bounds in epoch micros; null = unbounded (pre-stats
      // manifest or a stat-less footer) — the time-range prune admits those
      StructField("ts_min", LongType, nullable = true),
      StructField("ts_max", LongType, nullable = true),
      StructField("schema_version", IntegerType, nullable = false)))
    case "batches" => StructType(Seq(
      StructField("batch_id", LongType, nullable = false),
      StructField("upserts", LongType, nullable = false),
      StructField("deletes", LongType, nullable = false),
      StructField("partition", IntegerType, nullable = true),
      StructField("start_offset", LongType, nullable = true),
      StructField("count", LongType, nullable = true),
      StructField("rows", LongType, nullable = true)))
    case "partitions" => StructType(Seq(
      StructField("bucket", IntegerType, nullable = false),
      StructField("n_files", IntegerType, nullable = false),
      // merge-on-read depth: files above tier 0 — the per-bucket read
      // amplification a compaction cadence should keep bounded
      StructField("n_delta_files", IntegerType, nullable = false),
      StructField("bytes", LongType, nullable = false),
      StructField("row_count", LongType, nullable = false),
      StructField("url_min", StringType, nullable = true),
      StructField("url_max", StringType, nullable = true)))
    case "tags" => StructType(Seq(
      StructField("tag", StringType, nullable = false),
      StructField("snapshot_id", LongType, nullable = false),
      StructField("created_ms", LongType, nullable = false)))
    case "branches" => StructType(Seq(
      StructField("branch", StringType, nullable = false),
      StructField("head_snapshot_id", LongType, nullable = false),
      StructField("fork_snapshot_id", LongType, nullable = false),
      StructField("created_ms", LongType, nullable = false)))
    case other => throw new IllegalArgumentException(
      s"unknown metadata table '$other' (have ${Kinds.mkString(", ")})")
  }

  def rowsOf(lake: LakeTable, kind: String): Seq[Array[Any]] = kind match {
    case "snapshots" =>
      lake.snapshotIds.sorted.map(lake.snapshot).map { s =>
        Array[Any](s.snapshotId, s.parentId,
          if (s.commitTsMs < 0) null else s.commitTsMs,
          s.schemaVersion, s.nBuckets,
          s.files.size, s.batches.size, s.files.map(_.bytes).sum, s.totalRows)
      }
    case "files" =>
      lake.currentSnapshot.files.sortBy(f => (f.bucket, f.path)).map { f =>
        Array[Any](f.path, f.bucket, f.tier, f.rowCount, f.bytes,
          f.urlMin, f.urlMax,
          if (f.tsMinMicros == graft.lake.DataFile.NoTsMin) null else f.tsMinMicros,
          if (f.tsMaxMicros == graft.lake.DataFile.NoTsMax) null else f.tsMaxMicros,
          f.schemaVersion)
      }
    case "batches" =>
      lake.currentSnapshot.batches.sortBy(_.batchId).flatMap { b =>
        if (b.lineage.isEmpty)
          Seq(Array[Any](b.batchId, b.upserts, b.deletes, null, null, null, null))
        else b.lineage.map(l =>
          Array[Any](b.batchId, b.upserts, b.deletes, l.partition,
            l.startOffset, l.count, l.rows))
      }
    case "partitions" =>
      // per-bucket rollup of the CURRENT snapshot: the skew / compaction
      // dashboard (hot buckets by bytes, delta depth vs the fold trigger).
      // Stored rows incl. shadowed versions and tombstones — what a scan
      // of the bucket READS, which is the quantity that skews
      lake.currentSnapshot.files.groupBy(_.bucket).toSeq.sortBy(_._1).map {
        case (b, fs) =>
          // bounds folded in unsigned-UTF-8 byte order (the order pruning
          // and parquet stats use — Java String order would mis-rank
          // supplementary-plane urls). A SENTINEL bound on ANY file makes
          // the whole bucket's bound UNKNOWN (null): dropping the sentinel
          // from the fold would report a range NARROWER than the bucket
          // can hold, misleading exactly the pruning/skew reasoning this
          // view exists for
          Array[Any](b, fs.size, fs.count(_.tier > 0),
            fs.map(_.bytes).sum, fs.map(_.rowCount).sum,
            if (fs.exists(_.urlMin == LakeTable.NoStatsMin)) null
            else fs.map(_.urlMin)
              .reduce((x, y) => if (LakeTable.compareUtf8(x, y) <= 0) x else y),
            if (fs.exists(_.urlMax == LakeTable.NoStatsMax)) null
            else fs.map(_.urlMax)
              .reduce((x, y) => if (LakeTable.compareUtf8(x, y) >= 0) x else y))
      }
    case "tags" =>
      lake.tagEntries.map { case (name, id, createdMs) =>
        Array[Any](name, id, createdMs)
      }
    case "branches" =>
      lake.branchEntries.map { case (name, head, fork, createdMs) =>
        Array[Any](name, head, fork, createdMs)
      }
    case other => throw new IllegalArgumentException(s"unknown metadata table '$other'")
  }
}
