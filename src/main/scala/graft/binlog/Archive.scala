package graft.binlog

import java.nio.file.{Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.ChangeEvent

/** The reference's SINK role: consume a change stream and archive it as
  * chunked block-GZIP segment files with JSON chunk indexes
  * (`/root/reference/sink/src/main/java/com/spredfast/kafka/connect/s3/sink/S3SinkTask.java:152-183`
  * + `BlockGZIPFileWriter`). Executor tasks write whole stream partitions
  * (rows arrive grouped by `partition`, sorted by `offset`), rolling
  * segments every `segmentEvents` records; file names encode
  * `(partition, startOffset)` so replaying a batch overwrites the SAME
  * files with byte-identical content — the reference's rewind-idempotence
  * guarantee (`S3SinkConnectorIT.java:474-612`), testable here because both
  * gzip and our framing are bit-deterministic.
  *
  * Local mode writes to a shared filesystem path; on a cluster the same
  * writer streams to executor-mounted object storage.
  */
object Archive {

  final case class ArchivedSegment(partition: Int, startOffset: Long, records: Long, file: String)

  /** Archive one batch (grouped per partition inside executor tasks). */
  def archiveBatch(spark: SparkSession, destDir: Path, segmentEvents: Long,
      chunkThreshold: Long)(df: DataFrame, batchId: Long): Seq[ArchivedSegment] = {
    import spark.implicits._
    val dest = destDir.toString
    val written = df.as[ChangeEvent]
      .repartition(col("partition"))
      .sortWithinPartitions(col("partition"), col("offset"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[ArchivedSegment]
        var w: SegmentWriter = null
        var curPart = -1
        var curStart = 0L
        var inSeg = 0L
        def closeSeg(): Unit = if (w != null) {
          w.close()
          out += ArchivedSegment(curPart, curStart, inSeg, w.baseName + ".gz")
          w = null
        }
        it.foreach { e =>
          if (e.partition != curPart || inSeg >= segmentEvents) {
            closeSeg()
            curPart = e.partition
            curStart = e.offset
            inSeg = 0L
            w = new SegmentWriter(Paths.get(dest), curPart, curStart, chunkThreshold)
          }
          w.writeEvent(e)
          inSeg += 1
        }
        closeSeg()
        out.iterator
      }
      .collect()
    written.toSeq.sortBy(s => (s.partition, s.startOffset))
  }

  /** Stream a binlog directory into an archive directory (source → sink
    * round trip; ≙ the reference's sink consuming what its source produced,
    * `S3SinkConnectorIT.java:614-675`). */
  def startArchive(spark: SparkSession, srcDir: String, destDir: Path,
      checkpointDir: String, maxEventsPerBatch: Long = 1000000L,
      segmentEvents: Long = 100000L, chunkThreshold: Long = 8L * 1024 * 1024,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val stream = spark.readStream
      .format("graft.binlog.BinlogSourceProvider")
      .option("path", srcDir)
      .option("maxEventsPerBatch", maxEventsPerBatch)
      .load()
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (df: DataFrame, id: Long) =>
        archiveBatch(spark, destDir, segmentEvents, chunkThreshold)(df, id): Unit
      }
      .start()
  }
}
