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

  test("byte admission: maxBytesPerBatch clamps at chunk granularity with progress") {
    val dir = tmpDir("srcby")
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1000)
    // small chunks so the byte budget bites mid-segment
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 500, chunkThreshold = 8 * 1024)
    val byteCap = 32 * 1024L
    val s = new BinlogMicroBatchStream(dir.toString, 1000000L, 100,
      maxBytesPerBatch = byteCap)
    // a byte budget turns the default limit composite (rows AND bytes)
    assert(s.getDefaultReadLimit.isInstanceOf[
      org.apache.spark.sql.connector.read.streaming.CompositeReadLimit])

    val segs = Segment.listAll(dir).groupBy(_.partition)
    def decodedBytes(part: Int, from: Long, until: Long): Long =
      segs(part).iterator.flatMap(_.index.chunks.iterator)
        .filter(c => c.firstRecordOffset + c.numRecords > from && c.firstRecordOffset < until)
        .map(_.byteLengthUncompressed).sum
    val maxChunk = segs.values.flatten.flatMap(_.index.chunks)
      .map(_.byteLengthUncompressed).max

    // drain under the byte budget: every batch's admitted decoded bytes per
    // partition stay within its share plus the one-chunk overshoot, offsets
    // only advance, and the union covers the whole log exactly
    var cur = s.initialOffset().asInstanceOf[BinlogOffset]
    var batches = 0
    val limit = s.getDefaultReadLimit
    var done = false
    while (!done && batches < 1000) {
      val next = s.latestOffset(cur, limit).asInstanceOf[BinlogOffset]
      if (next.parts == cur.parts) done = true
      else {
        next.parts.foreach { case (part, until) =>
          val from = cur.parts.getOrElse(part, 0L)
          assert(until >= from, s"offset regressed on p$part")
          if (until > from) {
            val used = decodedBytes(part, from, until)
            // per-partition share ≤ full budget; overshoot ≤ one chunk
            assert(used <= byteCap + maxChunk,
              s"p$part admitted $used decoded bytes (cap $byteCap + chunk $maxChunk)")
          }
        }
        batches += 1
        cur = next
      }
    }
    assert(cur.parts == Map(0 -> 1000L, 1 -> 1000L), s"drain incomplete: ${cur.parts}")
    // the budget actually split the log (the count cap alone would drain in 1)
    assert(batches > 3, s"expected several byte-capped batches, got $batches")

    // byte-unlimited stream is unchanged: one batch drains everything
    val s2 = new BinlogMicroBatchStream(dir.toString, 1000000L, 100)
    assert(!s2.getDefaultReadLimit.isInstanceOf[
      org.apache.spark.sql.connector.read.streaming.CompositeReadLimit])
    val one = s2.latestOffset(s2.initialOffset(), s2.getDefaultReadLimit)
      .asInstanceOf[BinlogOffset]
    assert(one.parts == Map(0 -> 1000L, 1 -> 1000L))

    // option plumbing: the DSv2 scan threads maxBytesPerBatch into the
    // stream it builds
    val stream = new BinlogTable(dir.toString)
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("maxBytesPerBatch", byteCap.toString)))
      .build().toMicroBatchStream(tmpDir("srcby-ckpt").toString)
    assert(stream.asInstanceOf[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
      .getDefaultReadLimit.isInstanceOf[
        org.apache.spark.sql.connector.read.streaming.CompositeReadLimit])
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
