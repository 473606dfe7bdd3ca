package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming analytics over the change stream: event-time tumbling windows
  * with a watermark — the reference's flush-window semantics (W1/W2,
  * `/root/reference/sink/src/main/java/com/spredfast/kafka/connect/s3/sink/S3SinkTask.java:278-317`)
  * expressed as a real Structured Streaming aggregation. The watermark plays
  * the grace-period role: a window closes (emits, in append mode) once event
  * time passes window end + grace.
  */
object WindowedStats {

  /** Windowed per-op counts + bytes over the binlog stream. */
  def windowedCounts(spark: SparkSession, binlogDir: String,
      windowLen: String = "10 minutes", grace: String = "5 minutes",
      maxEventsPerBatch: Long = 100000L): DataFrame = {
    spark.readStream
      .format("graft.binlog.BinlogSourceProvider")
      .option("path", binlogDir)
      .option("maxEventsPerBatch", maxEventsPerBatch)
      .load()
      .withWatermark("warc_ts", grace)
      .groupBy(window(col("warc_ts"), windowLen), col("op"))
      .agg(count(lit(1)).as("cnt"),
        sum(coalesce(length(col("html")), lit(0)).cast("long")).as("bytes"))
      .select(unix_micros(col("window.start")).as("wstart_us"), col("op"),
        col("cnt"), col("bytes"))
  }

  /** Run to completion into an in-memory table; returns the query. */
  def startToMemory(spark: SparkSession, binlogDir: String, queryName: String,
      windowLen: String = "10 minutes", grace: String = "5 minutes"): StreamingQuery =
    windowedCounts(spark, binlogDir, windowLen, grace)
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
}
