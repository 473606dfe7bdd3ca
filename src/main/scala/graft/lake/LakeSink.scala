package graft.lake

import java.nio.file.{Files, Path, Paths}
import java.sql.Timestamp
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.binlog.{Layout, Segment, SegmentWriter}
import graft.model.ChangeEvent

/** Native Structured Streaming SINK for the lake table — the fully
  * declarative pipeline:
  *
  * {{{
  *   spark.readStream.format("graft.binlog.BinlogSourceProvider").option("path", binlog).load()
  *     .writeStream.format("graft-lake")
  *     .option("path", tableRoot).option("nBuckets", 64).option("mode", "mor")
  *     .option("checkpointLocation", ckpt).start()
  * }}}
  *
  * replaces the `foreachBatch` closure: Spark's epoch id IS the engine's
  * exactly-once batch id, so a replayed epoch (crash between sink commit and
  * checkpoint write) is a no-op via the table's `(batchId, lineage)` marker.
  *
  * Each task stages its rows as binlog segments PRESERVING the incoming CDC
  * envelope — a new segment starts whenever the source partition changes or
  * an offset is non-contiguous, so staged chunk metadata reconstructs the
  * true per-partition lineage (the reference's gap-free chain) without an
  * extra data pass. The epoch commit merges the staged envelope through
  * `Merge.apply` and deletes the staging area. Input schema must be the CDC
  * envelope ([[ChangeEvent.schema]]).
  *
  * ONE sink query per table (the engine's single-writer contract): a second
  * concurrent writer would collide in the epoch staging area before the
  * commit CAS could reject it. */
class LakeSinkProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = ChangeEvent.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new LakeSinkTable(properties.get("path"), properties)
}

final class LakeSinkTable(root: String, props: util.Map[String, String])
  extends Table with SupportsWrite {
  require(root != null, "graft-lake sink requires option 'path'")
  override def name(): String = s"graft-lake($root)"
  override def schema(): StructType = ChangeEvent.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.STREAMING_WRITE).asJava

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val fields = info.schema().fieldNames.toSeq
    require(fields == ChangeEvent.schema.fieldNames.toSeq,
      s"graft-lake sink expects the CDC envelope ${ChangeEvent.schema.fieldNames.mkString("(", ",", ")")}, got $fields")
    val nBuckets = Option(props.get("nBuckets")).map(_.toInt).getOrElse(32)
    val mode = Option(props.get("mode")).map(_.toLowerCase).getOrElse("mor") match {
      case "cow" => graft.cdc.Cow
      case _ => graft.cdc.Mor
    }
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toStreaming: StreamingWrite = new LakeStreamingWrite(root, nBuckets, mode)
      }
    }
  }
}

final class LakeStreamingWrite(root: String, nBuckets: Int, mode: graft.cdc.MergeMode,
    userSchemaRows: Boolean = false)
  extends StreamingWrite {

  private def tableRoot = Paths.get(root)
  private def stagingDir(epochId: Long): Path =
    tableRoot.resolve("staging").resolve(s"epoch-$epochId")

  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new LakeSinkWriterFactory(tableRoot.resolve("staging").toString, userSchemaRows)

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    val table =
      if (LakeTable.exists(tableRoot)) LakeTable.load(tableRoot)
      else LakeTable.create(tableRoot, nBuckets)
    val staging = stagingDir(epochId)
    try {
      if (table.currentSnapshot.committedBatchIds.contains(epochId)) return // replayed epoch
      // ingest ONLY the attempt dirs reported by COMMITTED writers — a task
      // attempt that closed segments and then died without abort() (executor
      // crash, killed speculative loser) leaves orphans under staging/epoch-N
      // which must not be read alongside the retry's copy (duplicate lineage
      // runs would break the gap-free audit). Orphans die with the staging
      // dir in the finally.
      val committedDirs = messages.collect { case SegmentsStaged(dir) => Paths.get(dir) }
        .filter(Files.isDirectory(_))
      val staged = committedDirs.flatMap(d => Layout.listUnder(d, Layout.Flat)).toSeq
      if (staged.isEmpty) return
      // lineage from segment metadata (no data pass): one entry per
      // CONTIGUOUS run per partition — the canonical pipeline yields a
      // single gap-free run each; upstream filters that drop records
      // surface as multiple runs instead of a fabricated envelope
      val lineage = staged.map(_._2).groupBy(_.partition).toSeq.sortBy(_._1).flatMap { case (p, fs) =>
        val sorted = fs.sortBy(_.startOffset)
        val runs = Vector.newBuilder[PartLineage]
        var runStart = sorted.head.startOffset
        var runEnd = sorted.head.endOffset
        sorted.tail.foreach { f =>
          if (f.startOffset == runEnd) runEnd = f.endOffset
          else {
            runs += PartLineage(p, runStart, runEnd - runStart, runEnd - runStart)
            runStart = f.startOffset
            runEnd = f.endOffset
          }
        }
        runs += PartLineage(p, runStart, runEnd - runStart, runEnd - runStart)
        runs.result()
      }
      val parts = staged.map(_._2.path.getParent.toString).distinct
      val df = parts.map(d => graft.binlog.BinlogRead.all(spark, d)).reduce(_.unionByName(_))
      graft.cdc.Merge(spark, table, df, epochId, lineage, mode): Unit
    } finally rm(staging)
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    rm(stagingDir(epochId))

  private def rm(p: Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(rm) finally s.close()
    }
    Files.deleteIfExists(p): Unit
  }
}

/** Commit message: the attempt dir whose segments this writer staged and
  * closed. The epoch commit ingests exactly these dirs. */
final case class SegmentsStaged(dir: String) extends WriterCommitMessage

final class LakeSinkWriterFactory(stagingRoot: String, userSchemaRows: Boolean = false)
  extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] = {
    // taskId is unique PER ATTEMPT: speculative/retried attempts get
    // disjoint dirs (no shared tmp paths), and abort can remove the whole
    // attempt dir — including segments already closed by a rolling writer
    val dir = Paths.get(stagingRoot, s"epoch-$epochId", s"task-$partitionId-a$taskId")
    if (userSchemaRows) new LakeSinkUserWriter(dir, partitionId, epochId)
    else new LakeSinkWriter(dir)
  }
}

private[graft] object SinkIO {
  def rmDir(p: java.nio.file.Path): Unit = {
    if (Files.isDirectory(p)) {
      val s = Files.list(p)
      try s.forEach(rmDir) finally s.close()
    }
    Files.deleteIfExists(p): Unit
  }
}

/** `writeStream.toTable("graft.t")` variant: rows arrive in the USER schema
  * (url, warc_ts, html, text, content_len, lang) — every row is an upsert
  * with a synthetic envelope (partition = task id, offsets anchored at
  * `epochId << 32`), resolved LWW by warc_ts like any other batch;
  * text/content_len are engine-derived. Anchoring offsets at the epoch
  * makes the `(warc_ts, offset, partition)` tie-break DETERMINISTIC across
  * epochs: two epochs can never repeat a (partition, offset) pair, so an
  * equal-warc_ts upsert from a later epoch strictly wins. */
final class LakeSinkUserWriter(dir: Path, partitionId: Int, epochId: Long)
  extends DataWriter[InternalRow] {
  private var w: SegmentWriter = _
  private val base: Long = epochId << 32
  private var n = 0L

  override def write(row: InternalRow): Unit = {
    if (w == null) w = new SegmentWriter(dir, partitionId, base)
    val micros = row.getLong(1)
    val ts = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    w.writeEvent(ChangeEvent(
      partition = partitionId,
      offset = base + n,
      op = ChangeEvent.OpUpsert,
      url = row.getUTF8String(0).toString,
      warc_ts = ts,
      html = if (row.isNullAt(2)) null else row.getBinary(2),
      lang = if (row.isNullAt(5)) null else row.getUTF8String(5).toString))
    n += 1
  }

  override def commit(): WriterCommitMessage = {
    if (w != null) w.close()
    SegmentsStaged(dir.toString)
  }
  // the attempt dir is exclusively ours (unique taskId in the path): abort
  // removes it WHOLE, including segments already rolled and closed
  override def abort(): Unit = {
    if (w != null) w.delete()
    SinkIO.rmDir(dir)
  }
  override def close(): Unit = ()
}

/** Streams envelope rows into segments, rolling on source-partition change
  * or offset discontinuity so file names + chunk indexes carry the true
  * (partition, offset-range) coverage. */
final class LakeSinkWriter(dir: Path) extends DataWriter[InternalRow] {
  private var w: SegmentWriter = _
  private var curPart = -1
  private var nextOff = -1L
  private val seenRanges = scala.collection.mutable.Set.empty[(Int, Long)]

  override def write(row: InternalRow): Unit = {
    val part = row.getInt(0)
    val off = row.getLong(1)
    if (w == null || part != curPart || off != nextOff) {
      if (w != null) w.close()
      // a repeated (partition, startOffset) would silently overwrite the
      // earlier segment — refuse: the envelope must not repeat ranges
      require(seenRanges.add((part, off)),
        s"duplicate envelope range p$part@$off in one task — offsets must not repeat")
      curPart = part
      w = new SegmentWriter(dir, part, off)
    }
    val micros = row.getLong(4)
    val ts = new Timestamp(Math.floorDiv(micros, 1000000L) * 1000L)
    ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
    w.writeEvent(ChangeEvent(
      partition = part,
      offset = off,
      op = row.getUTF8String(2).toString,
      url = row.getUTF8String(3).toString,
      warc_ts = ts,
      html = if (row.isNullAt(5)) null else row.getBinary(5),
      lang = if (row.isNullAt(6)) null else row.getUTF8String(6).toString))
    nextOff = off + 1
  }

  override def commit(): WriterCommitMessage = {
    if (w != null) w.close()
    SegmentsStaged(dir.toString)
  }
  // the attempt dir is exclusively ours (unique taskId in the path): abort
  // removes it WHOLE, including segments already rolled and closed
  override def abort(): Unit = {
    if (w != null) w.delete()
    SinkIO.rmDir(dir)
  }
  override def close(): Unit = ()
}
