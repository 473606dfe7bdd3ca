package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.binlog.{BinlogRead, ChangeEventGen, GenProfile}

class WindowedStatsSpec extends SparkSpec {

  test("streaming windowed counts equal the batch computation over the same stream") {
    val dir = tmpDir("wstats")
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1500)
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 500)

    val q = WindowedStats.startToMemory(spark, dir.toString, "wstats_out")
    q.awaitTermination()
    val streaming = spark.table("wstats_out")
      .select("wstart_us", "op", "cnt", "bytes")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    val batch = BinlogRead.all(spark, dir.toString)
      .groupBy(window(col("warc_ts"), "10 minutes"), col("op"))
      .agg(count(lit(1)).as("cnt"),
        sum(coalesce(length(col("html")), lit(0)).cast("long")).as("bytes"))
      .select(unix_micros(col("window.start")).as("wstart_us"), col("op"), col("cnt"), col("bytes"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap

    assert(streaming == batch)
    assert(streaming.nonEmpty)
  }
}
