package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The reference's EXACT event-time flush policy (W1), which the built-in
  * `window()` cannot express: a tumbling window ANCHORED AT THE FIRST RECORD
  * of each chunk — flush BEFORE accepting record `r` when
  * `r.timestamp − firstRecord.timestamp ≥ flushInterval`, with the
  * triggering record opening the NEXT chunk
  * (`/root/reference/sink/src/main/java/com/spredfast/kafka/connect/s3/sink/S3SinkTask.java:308-317`,
  * verified by `S3SinkConnectorIT.java:299-308`).
  *
  * Implemented as custom state over `flatMapGroupsWithState`: one state per
  * binlog partition, carried across micro-batches via the checkpoint, rows
  * processed in offset order (the per-partition arrival order, as in the
  * reference's single-threaded sink task). Emitted rows are the closed
  * "chunks" — `(partition, startOffset, firstTsUs, numRecords, bytes)` —
  * i.e. the file-boundary decisions the reference's sink would make.
  * The still-open chunk stays in state (the reference only closes it on a
  * wall-clock grace flush, which is deliberately not modeled — wall time is
  * nondeterministic).
  */
object FlushWindows {

  final case class EventLite(partition: Int, offset: Long, tsUs: Long, bytes: Long)
  final case class OpenChunk(startOffset: Long, firstTsUs: Long, numRecords: Long, bytes: Long)
  final case class Chunk(partition: Int, startOffset: Long, firstTsUs: Long,
      numRecords: Long, bytes: Long)

  /** Pure per-partition fold — shared by the streaming operator and the test
    * oracle. Returns (closed chunks, open tail). */
  def foldEvents(events: Iterator[EventLite], init: Option[OpenChunk],
      flushIntervalUs: Long): (Vector[Chunk], Option[OpenChunk], Int) = {
    var open = init
    var partition = -1
    val out = Vector.newBuilder[Chunk]
    events.foreach { e =>
      partition = e.partition
      open match {
        case Some(c) if e.tsUs - c.firstTsUs >= flushIntervalUs =>
          out += Chunk(e.partition, c.startOffset, c.firstTsUs, c.numRecords, c.bytes)
          open = Some(OpenChunk(e.offset, e.tsUs, 1L, e.bytes))
        case Some(c) =>
          open = Some(c.copy(numRecords = c.numRecords + 1, bytes = c.bytes + e.bytes))
        case None =>
          open = Some(OpenChunk(e.offset, e.tsUs, 1L, e.bytes))
      }
    }
    (out.result(), open, partition)
  }

  /** Streaming chunk-boundary stream over the binlog. */
  def chunkStream(spark: SparkSession, binlogDir: String, flushIntervalUs: Long,
      maxEventsPerBatch: Long = 100000L): Dataset[Chunk] = {
    import spark.implicits._
    val events = spark.readStream
      .format("graft.binlog.BinlogSourceProvider")
      .option("path", binlogDir)
      .option("maxEventsPerBatch", maxEventsPerBatch)
      .load()
      .select(col("partition"), col("offset"), unix_micros(col("warc_ts")).as("tsUs"),
        coalesce(length(col("html")), lit(0)).cast("long").as("bytes"))
      .as[EventLite]
    events
      .groupByKey(_.partition)
      .flatMapGroupsWithState[OpenChunk, Chunk](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (part: Int, it: Iterator[EventLite], state: GroupState[OpenChunk]) =>
          // offset order == the partition's arrival order (reference: the
          // sink task consumes each partition single-threaded in order)
          val ordered = it.toVector.sortBy(_.offset).iterator
          val (closed, open, _) = foldEvents(ordered, state.getOption, flushIntervalUs)
          open match {
            case Some(c) => state.update(c)
            case None => state.remove()
          }
          closed.iterator
      }
  }

  /** Drain into an in-memory table; returns after completion. */
  def runToMemory(spark: SparkSession, binlogDir: String, flushIntervalUs: Long,
      queryName: String, maxEventsPerBatch: Long = 100000L): Unit = {
    val q = chunkStream(spark, binlogDir, flushIntervalUs, maxEventsPerBatch)
      .writeStream
      .outputMode("update")
      .format("memory")
      .queryName(queryName)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
