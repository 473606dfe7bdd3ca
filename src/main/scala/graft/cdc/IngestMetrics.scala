package graft.cdc

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}

import scala.collection.mutable

import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

import graft.lake.LakeTable

/** Ingest observability: the reference's `Metrics` surface
  * (`/root/reference/common/src/main/java/com/spredfast/kafka/connect/s3/Metrics.java:8-79`
  * — meters/gauges per topic-partition, wired through the sink/source
  * tasks) re-expressed as a `StreamingQueryListener` that joins Spark's
  * per-batch progress (rows/sec, durations, source offsets) with the
  * table-side truth (snapshot id, total rows, per-batch upsert/delete
  * markers) and appends one JSON line per batch to a metrics log.
  *
  * The lineage metrics themselves (per-partition startOffset/count) are
  * first-class table metadata (snapshot summary) — this listener is the
  * monitoring view over them.
  */
final class IngestMetrics(table: LakeTable, logFile: Option[Path] = None)
    extends StreamingQueryListener {

  final case class BatchMetric(batchId: Long, inputRows: Long, durationMs: Long,
      snapshotId: Long, totalRows: Long, upserts: Long, deletes: Long)

  private val seen = mutable.ArrayBuffer.empty[BatchMetric]
  def batches: Vector[BatchMetric] = seen.synchronized(seen.toVector)

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    val p = e.progress
    val snap = try table.currentSnapshot catch { case _: Exception => return }
    val marker = snap.batches.find(_.batchId == p.batchId)
    val m = BatchMetric(p.batchId, p.numInputRows, p.batchDuration,
      snap.snapshotId, snap.totalRows,
      marker.map(_.upserts).getOrElse(-1L), marker.map(_.deletes).getOrElse(-1L))
    seen.synchronized(seen += m)
    val line =
      s"""{"batch_id":${m.batchId},"input_rows":${m.inputRows},"duration_ms":${m.durationMs},""" +
        s""""snapshot_id":${m.snapshotId},"total_rows":${m.totalRows},"upserts":${m.upserts},"deletes":${m.deletes}}"""
    logFile.foreach { f =>
      Files.write(f, (line + "\n").getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }
}
