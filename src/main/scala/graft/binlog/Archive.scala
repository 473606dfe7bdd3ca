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

  /** Archive one batch (grouped per partition inside executor tasks).
    *
    * `layout`/`topic`/`date` select the key layout (≙ the reference's
    * `layout` config — flat, grouped_by_date, grouped_by_topic); `codec`
    * selects the wire format (≙ `format` config); `header` is written as its
    * own gzip member before the first data chunk (≙ `S3RecordsWriter.init`
    * headers, `BlockGZIPFileWriter.java:133-141`). The date is an explicit
    * argument, not wall clock, so replaying a batch rewrites the SAME keys
    * with identical bytes. */
  /** `flushIntervalUs`: the reference's event-time flush policy (W1,
    * `S3SinkTask.shouldFlushBefore`) applied to the ARCHIVE's file
    * boundaries — a segment also rotates before accepting a record whose
    * `warc_ts` is ≥ interval past the segment's FIRST record (the
    * triggering record opens the next file, exactly the reference's
    * `testSinkWithBigFlushInterval` behavior). Pure event time, so replay
    * still rewrites byte-identical files; the micro-batch boundary itself
    * plays the wall-clock-flush role for quiet tails (W2's graced analog —
    * every batch closes its open segments durably). */
  def archiveBatch(spark: SparkSession, destDir: Path, segmentEvents: Long,
      chunkThreshold: Long, layout: Layout = Layout.Flat, topic: String = "events",
      date: String = "1970-01-01", codecSpec: CodecSpec = CodecSpec(),
      header: Array[Byte] = Array.empty, flushIntervalUs: Option[Long] = None)
      (df: DataFrame, batchId: Long): Seq[ArchivedSegment] = {
    import spark.implicits._
    val dest = destDir.toString
    val written = df.as[ChangeEvent]
      .repartition(col("partition"))
      .sortWithinPartitions(col("partition"), col("offset"))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer.empty[ArchivedSegment]
        val codec = codecSpec.codec
        var w: SegmentWriter = null
        var rel: String = null
        var curPart = -1
        var curStart = 0L
        var inSeg = 0L
        var firstTsUs = 0L
        def micros(e: ChangeEvent): Long =
          Math.floorDiv(e.warc_ts.getTime, 1000L) * 1000000L + e.warc_ts.getNanos / 1000L
        def closeSeg(): Unit = if (w != null) {
          w.close()
          out += ArchivedSegment(curPart, curStart, inSeg, rel + ".gz")
          w = null
        }
        it.foreach { e =>
          val timeFlush = flushIntervalUs.exists(iv =>
            w != null && inSeg > 0 && micros(e) - firstTsUs >= iv)
          if (e.partition != curPart || inSeg >= segmentEvents || timeFlush) {
            closeSeg()
            curPart = e.partition
            curStart = e.offset
            inSeg = 0L
            firstTsUs = micros(e)
            rel = layout.blockPath(topic, date, curPart, curStart)
            val full = Paths.get(dest).resolve(rel + ".gz")
            w = new SegmentWriter(full.getParent, curPart, curStart, chunkThreshold,
              header = header, nameOverride = Some(full.getFileName.toString.stripSuffix(".gz")),
              codec = codec)
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

  /** GRACED archive: file boundaries driven by the reference's FULL flush
    * policy — event-time tumbling anchored at each file's first record (W1,
    * `shouldFlushBefore`) PLUS the wall-clock grace close (W2,
    * `S3SinkTask.shouldFlush`, `sink/.../S3SinkTask.java:277-298`) — so an
    * OPEN segment of a partition that goes quiet still lands after
    * `interval + grace` with ZERO new batches, exactly the reference's
    * lagging-partition behavior (`S3SinkConnectorIT.java:235-312`). The
    * plain micro-batch archiver cannot do this: it closes its files at
    * batch boundaries and a stream with no batches never closes anything.
    *
    * Shape: [[graft.streaming.FlushWindows.gracedChunks]] carries the open
    * chunk per partition ACROSS micro-batches (checkpointed state +
    * processing-time timeouts, so Spark schedules empty batches while a
    * grace deadline is armed); each CLOSED chunk decision re-reads exactly
    * its offset range from the binlog (planning-time pruned range GET — the
    * re-archiver) and writes it as one segment file named by (partition,
    * startOffset). Chunk decisions are checkpointed, so a replayed
    * foreachBatch rewrites the SAME files byte-identically (the reference's
    * rewind-idempotence), and boundary decisions never depend on how the
    * tail was split into batches. */
  def startGracedArchive(spark: SparkSession, srcDir: String, destDir: Path,
      checkpointDir: String, flushIntervalMs: Long, graceMs: Long,
      segmentEvents: Long = 100000L, chunkThreshold: Long = 8L * 1024 * 1024,
      maxEventsPerBatch: Long = 100000L, layout: Layout = Layout.Flat,
      topic: String = "events", date: String = "1970-01-01",
      codecSpec: CodecSpec = CodecSpec(), header: Array[Byte] = Array.empty,
      trigger: Trigger = Trigger.ProcessingTime("500 milliseconds")): StreamingQuery = {
    val chunks = graft.streaming.FlushWindows.gracedChunkStream(
      spark, srcDir, flushIntervalMs, graceMs, maxEventsPerBatch)
    chunks.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (ds: org.apache.spark.sql.Dataset[graft.streaming.FlushWindows.GracedChunk], batchId: Long) =>
        // closed-chunk DECISIONS are few per batch (file-boundary events);
        // each drives one pruned range read + one segment write
        val closed = ds.collect().sortBy(c => (c.partition, c.startOffset))
        closed.foreach { c =>
          val range = spark.read.format("graft.binlog.BinlogSourceProvider")
            .option("path", srcDir)
            .option("partitions", c.partition.toString)
            .option("fromOffset", c.startOffset)
            .option("untilOffset", c.startOffset + c.numRecords)
            .load()
          archiveBatch(spark, destDir, segmentEvents, chunkThreshold, layout,
            topic, date, codecSpec, header)(range, batchId): Unit
        }
      }
      .start()
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
