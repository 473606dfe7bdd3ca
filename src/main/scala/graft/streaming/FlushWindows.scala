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

  // ---------------------------------------------------------------------
  // W2: the reference's EXACT wall-clock flush with grace
  // ---------------------------------------------------------------------

  /** Open chunk + the wall-clock receive instant of its latest record. */
  final case class OpenChunkW(startOffset: Long, firstTsUs: Long, numRecords: Long,
      bytes: Long, lastReceiveMs: Long)

  /** Closed chunk; `wallFlush` = closed by the wall-clock grace policy (the
    * reference's `shouldFlush`) rather than by an arriving record (its
    * `shouldFlushBefore`). */
  final case class GracedChunk(partition: Int, startOffset: Long, firstTsUs: Long,
      numRecords: Long, bytes: Long, wallFlush: Boolean)

  /** The reference's wall-clock flush predicate, verbatim
    * (`sink/.../S3SinkTask.java:277-298`): flush the open chunk when the
    * wall time since the FIRST record was PRODUCED (its record/event
    * timestamp) reaches `interval + grace` — so any record produced now
    * would also satisfy the event-time policy — AND the wall time since the
    * last record was RECEIVED exceeds `grace`, which defers to event-time
    * flushing while lagging backlog is still streaming in. */
  def shouldWallFlush(nowMs: Long, firstRecordTsMs: Long, lastReceiveMs: Long,
      intervalMs: Long, graceMs: Long): Boolean =
    nowMs - firstRecordTsMs >= intervalMs + graceMs &&
      nowMs - lastReceiveMs > graceMs

  /** The reference's default grace: half the flush interval
    * (`common/.../Configure.java` wall-time defaults; `S3SinkTask.java:92`). */
  def defaultGraceMs(flushIntervalMs: Long): Long =
    if (flushIntervalMs > 0) flushIntervalMs / 2 else -1L

  /** Event-time anchored chunks PLUS the reference's wall-clock grace flush:
    * a partition that goes quiet closes its open chunk once
    * `now − firstProduced ≥ interval + grace ∧ now − lastReceive > grace`,
    * exactly as `S3SinkTask.shouldFlush` (verified against the reference's
    * `testSinkWithWallTimeFlushingAndRewind` IT shape). Implemented with a
    * PROCESSING-TIME TIMEOUT per partition: Spark keeps running (empty)
    * micro-batches while armed timeouts are due, so quiet partitions flush
    * without any new data — the analog of Kafka Connect's periodic empty
    * `put()` calls. `lastReceive` is the micro-batch's processing timestamp:
    * deterministic on replay (checkpointed), monotone per group. */
  def gracedChunks(events: Dataset[EventLite], flushIntervalMs: Long,
      graceMs: Long): Dataset[GracedChunk] = {
    import events.sparkSession.implicits._
    val intervalUs = flushIntervalMs * 1000L
    events
      .groupByKey(_.partition)
      .flatMapGroupsWithState[OpenChunkW, GracedChunk](
        OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        (part: Int, it: Iterator[EventLite], state: GroupState[OpenChunkW]) =>
          val nowMs = state.getCurrentProcessingTimeMs()
          if (state.hasTimedOut) {
            state.getOption match {
              case Some(c) if shouldWallFlush(nowMs, c.firstTsUs / 1000L,
                  c.lastReceiveMs, flushIntervalMs, graceMs) =>
                state.remove()
                Iterator.single(GracedChunk(part, c.startOffset, c.firstTsUs,
                  c.numRecords, c.bytes, wallFlush = true))
              case Some(c) =>
                armTimeout(state, c, nowMs, flushIntervalMs, graceMs)
                Iterator.empty
              case None => Iterator.empty
            }
          } else {
            val ordered = it.toVector.sortBy(_.offset).iterator
            val init = state.getOption.map(c =>
              OpenChunk(c.startOffset, c.firstTsUs, c.numRecords, c.bytes))
            val (closed, open, _) = foldEvents(ordered, init, intervalUs)
            open match {
              case Some(c) =>
                val cw = OpenChunkW(c.startOffset, c.firstTsUs, c.numRecords,
                  c.bytes, lastReceiveMs = nowMs)
                state.update(cw)
                armTimeout(state, cw, nowMs, flushIntervalMs, graceMs)
              case None => state.remove()
            }
            closed.iterator.map(k => GracedChunk(part, k.startOffset,
              k.firstTsUs, k.numRecords, k.bytes, wallFlush = false))
          }
      }
  }

  /** Arm the timeout for the EARLIEST instant the wall predicate can hold:
    * both clauses are monotone in `now`, so sleeping until
    * `max(firstProduced + interval + grace, lastReceive + grace)` (plus 1 ms
    * so strict `>` holds) neither misses a flush nor spins. A timeout that
    * fires while the predicate is still false (a fresher record moved
    * `lastReceive`) just re-arms. */
  private def armTimeout(state: GroupState[OpenChunkW], c: OpenChunkW,
      nowMs: Long, intervalMs: Long, graceMs: Long): Unit = {
    val deadline = math.max(c.firstTsUs / 1000L + intervalMs + graceMs,
      c.lastReceiveMs + graceMs + 1L)
    state.setTimeoutDuration(math.max(1L, deadline - nowMs))
  }

  /** Wall-clock graced chunk stream over a binlog dir. */
  def gracedChunkStream(spark: SparkSession, binlogDir: String,
      flushIntervalMs: Long, graceMs: Long,
      maxEventsPerBatch: Long = 100000L): Dataset[GracedChunk] = {
    import spark.implicits._
    val events = spark.readStream
      .format("graft.binlog.BinlogSourceProvider")
      .option("path", binlogDir)
      .option("maxEventsPerBatch", maxEventsPerBatch)
      .load()
      .select(col("partition"), col("offset"), unix_micros(col("warc_ts")).as("tsUs"),
        coalesce(length(col("html")), lit(0)).cast("long").as("bytes"))
      .as[EventLite]
    gracedChunks(events, flushIntervalMs, graceMs)
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
