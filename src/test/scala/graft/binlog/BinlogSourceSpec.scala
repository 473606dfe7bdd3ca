package graft.binlog

import java.nio.file.Files

import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSv2 source unit behavior: offset codec, admission control budgeting,
  * new-partition discovery, range planning, batch pushdown. */
class BinlogSourceSpec extends SparkSpec {

  test("offset JSON round-trip, ordered keys") {
    val o = BinlogOffset(Map(2 -> 100L, 0 -> 5L, 1 -> 0L))
    assert(o.json() == """{"0":5,"1":0,"2":100}""")
    assert(BinlogOffset.fromJson(o.json()) == o)
  }

  test("admission control: cap spread across partitions, discovers new partitions") {
    val dir = tmpDir("src")
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1000)
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 500)
    val s = new BinlogMicroBatchStream(dir.toString, 600, 100)
    val start = s.initialOffset().asInstanceOf[BinlogOffset]
    assert(start.parts == Map(0 -> 0L, 1 -> 0L))
    // cap 600 over backlog 2000 → ~300 each
    val next = s.latestOffset(start, ReadLimit.maxRows(600)).asInstanceOf[BinlogOffset]
    assert(next.parts.values.sum == 600L)
    assert(next.parts.values.forall(v => v > 0 && v <= 1000))
    // unlimited → drain
    val all = s.latestOffset(next, ReadLimit.allAvailable()).asInstanceOf[BinlogOffset]
    assert(all.parts == Map(0 -> 1000L, 1 -> 1000L))
    // a NEW partition appears mid-stream (≙ partition growth IT)
    val w = new SegmentWriter(dir, 5, 0L)
    (0 until 10).foreach(i => w.writeEvent(ChangeEventGen.event(p, 5, i.toLong)))
    w.close()
    val grown = s.latestOffset(all, ReadLimit.maxRows(100)).asInstanceOf[BinlogOffset]
    assert(grown.parts(5) == 10L)
    // planning covers exactly the delta, split by eventsPerTask
    val parts = s.planInputPartitions(all, grown).map(_.asInstanceOf[BinlogInputPartition])
    assert(parts.map(ip => ip.until - ip.from).sum == 10L)
    assert(parts.forall(ip => ip.until - ip.from <= 100))

    // a partition discovered mid-stream ANCHORED far above 0 (epoch-anchored
    // sink staging, GC-truncated archive): the void below the anchor must not
    // be budgeted (backlog from the anchor, not 0) nor planned (no fabricated
    // (0, …) lineage ranges) — the whole 10-event backlog drains in ONE batch
    val base = 1L << 32
    val w9 = new SegmentWriter(dir, 9, base)
    (0 until 10).foreach(i => w9.writeEvent(ChangeEventGen.event(p, 9, base + i)))
    w9.close()
    val grown2 = s.latestOffset(grown, ReadLimit.maxRows(100)).asInstanceOf[BinlogOffset]
    assert(grown2.parts(9) == base + 10L,
      s"backlog must be counted from the anchor: ${grown2.parts(9)}")
    val parts2 = s.planInputPartitions(grown, grown2).map(_.asInstanceOf[BinlogInputPartition])
    val p9 = parts2.filter(_.partition == 9)
    assert(p9.map(ip => ip.until - ip.from).sum == 10L)
    assert(p9.forall(_.from >= base), s"no planning below the anchor: ${p9.toSeq}")
  }

  test("streaming read returns exactly the planned rows; batch read honors offset pushdown") {
    val dir = tmpDir("src2")
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 300)
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 100)
    val full = BinlogRead.all(spark, dir.toString)
    assert(full.count() == 600)
    assert(full.select(count_distinct(col("partition"))).head().getLong(0) == 2)
    val ranged = BinlogRead.range(spark, dir.toString, 50, 250)
    assert(ranged.count() == 400)
    val bounds = ranged.agg(min("offset"), max("offset")).head()
    assert(bounds.getLong(0) == 50L && bounds.getLong(1) == 249L)
    // row content faithful vs direct segment read
    val viaSpark = full.filter(col("partition") === 0).orderBy("offset")
      .select("offset", "url", "op").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val direct = Segment.readRange(dir, 0, 0, Long.MaxValue)
      .map(e => (e.offset, e.url, e.op)).toArray
    assert(viaSpark.sameElements(direct))
  }

  test("source options: partition filter prunes at listing; url exclude filters in reader") {
    val dir = tmpDir("srcf")
    val p = GenProfile.uniformSmall().copy(partitions = 3, eventsPerPartition = 200)
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 200)
    val onlyP02 = spark.read.format("graft.binlog.BinlogSourceProvider")
      .option("path", dir.toString).option("partitions", "0,2").load()
    assert(onlyP02.select("partition").distinct().collect().map(_.getInt(0)).toSet == Set(0, 2))
    val excluded = spark.read.format("graft.binlog.BinlogSourceProvider")
      .option("path", dir.toString).option("excludeUrlContains", "/doc1,/doc2").load()
    val urls = excluded.select("url").collect().map(_.getString(0))
    assert(urls.nonEmpty)
    assert(urls.forall(u => !u.contains("/doc1") && !u.contains("/doc2")))
    val full = BinlogRead.all(spark, dir.toString)
    assert(excluded.count() < full.count())
  }

  test("empty directory: zero partitions, empty stream is safe") {
    val dir = tmpDir("src3")
    Files.createDirectories(dir)
    val s = new BinlogMicroBatchStream(dir.toString, 100, 10)
    val init = s.initialOffset().asInstanceOf[BinlogOffset]
    assert(init.parts.isEmpty)
    val next = s.latestOffset(init, ReadLimit.maxRows(100)).asInstanceOf[BinlogOffset]
    assert(s.planInputPartitions(init, next).isEmpty)
    assert(BinlogRead.all(spark, dir.toString).count() == 0)
  }
}
