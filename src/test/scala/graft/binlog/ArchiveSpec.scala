package graft.binlog

import java.nio.file.Files
import java.security.MessageDigest

import graft.SparkSpec

/** Sink-side round trip + rewind idempotence (≙ the reference's
  * `S3SinkConnectorIT` rewind test `:474-612` — byte-identical objects after
  * replay — and sink→source round trip `:614-675`). */
class ArchiveSpec extends SparkSpec {

  private def md5s(dir: java.nio.file.Path): Map[String, String] =
    Segment.listAll(dir).flatMap { f =>
      Seq(f.path, f.indexPath).map { p =>
        val d = MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
        p.getFileName.toString -> d.map("%02x".format(_)).mkString
      }
    }.toMap

  test("archive round trip: re-segmented stream decodes to identical events; rewind is byte-identical") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1800)
    val origin = tmpDir("arch-src")
    ChangeEventGen.writeSegments(p, origin, segmentEvents = 700, chunkThreshold = 64 * 1024)
    val dest = tmpDir("arch-dst")

    val q = Archive.startArchive(spark, origin.toString, dest, tmpDir("arch-ck").toString,
      maxEventsPerBatch = 900, segmentEvents = 300, chunkThreshold = 16 * 1024)
    q.awaitTermination()

    // 1. decoded round trip: every event identical, both partitions
    (0 until p.partitions).foreach { part =>
      val a = Segment.readRange(origin, part, 0, Long.MaxValue).toVector
      val b = Segment.readRange(dest, part, 0, Long.MaxValue).toVector
      assert(a.size == b.size)
      a.zip(b).foreach { case (x, y) =>
        assert(x.copy(html = null) == y.copy(html = null))
        assert(java.util.Arrays.equals(x.html, y.html))
      }
    }
    // 2. segments re-rolled at the sink's own granularity, chains gap-free
    val segs = Segment.list(dest, 0)
    assert(segs.size >= 6) // 1800 events / 300-event segments
    segs.sliding(2).foreach {
      case Seq(a, b) => assert(b.startOffset == a.endOffset)
      case _ =>
    }
    // 3. rewind: replay the WHOLE stream with a fresh checkpoint into the
    //    same destination — every file must be rewritten byte-identically
    val before = md5s(dest)
    val q2 = Archive.startArchive(spark, origin.toString, dest, tmpDir("arch-ck2").toString,
      maxEventsPerBatch = 900, segmentEvents = 300, chunkThreshold = 16 * 1024)
    q2.awaitTermination()
    val after = md5s(dest)
    assert(after == before, "rewind must regenerate byte-identical segment files")
  }

  test("idle-partition wall-clock close: quiet tails land via grace with zero new batches (W2 in the sink)") {
    import graft.streaming.FlushWindows
    // all data arrives in the first batches, then the stream goes QUIET: the
    // event-time policy closes interior chunks, but each partition's OPEN
    // tail can only land via the wall-clock grace flush — the reference's
    // lagging-partition IT shape (S3SinkConnectorIT.java:235-312)
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1200)
    val origin = tmpDir("archgr-src")
    ChangeEventGen.writeSegments(p, origin, segmentEvents = 700, chunkThreshold = 64 * 1024)
    val intervalMs = 200L * 1000 // event-time interval 200 s (≈200 events/file)
    val graceMs = 1500L          // quiet tails close ~1.5 s after the last batch

    def run(tag: String): java.nio.file.Path = {
      val dest = tmpDir(s"archgr-dst-$tag")
      val q = Archive.startGracedArchive(spark, origin.toString, dest,
        tmpDir(s"archgr-ck-$tag").toString, flushIntervalMs = intervalMs,
        graceMs = graceMs, segmentEvents = Long.MaxValue, chunkThreshold = 16 * 1024,
        maxEventsPerBatch = 900,
        trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("250 milliseconds"))
      try {
        val total = p.partitions.toLong * p.eventsPerPartition
        val deadline = System.currentTimeMillis() + 90000
        def archived(): Long = Segment.listAll(dest).map(s => s.endOffset - s.startOffset).sum
        while (archived() < total && System.currentTimeMillis() < deadline) Thread.sleep(200)
        assert(archived() == total,
          s"quiet tails never closed: archived ${archived()} of $total after grace")
      } finally q.stop()
      dest
    }

    val dest = run("a")
    // boundaries == the graced oracle: event-time closed chunks + each
    // partition's tail (closed by the wall predicate, nothing else pending)
    (0 until p.partitions).foreach { part =>
      val evts = ChangeEventGen.events(p, part).map { e =>
        FlushWindows.EventLite(part, e.offset, graft.Oracle.micros(e.warc_ts),
          if (e.html == null) 0L else e.html.length.toLong)
      }
      val (closed, open, _) = FlushWindows.foldEvents(evts, None, intervalMs * 1000)
      val oracle = (closed.map(c => (c.startOffset, c.numRecords)) ++
        open.map(o => (o.startOffset, o.numRecords))).toVector
      val got = Segment.list(dest, part).sortBy(_.startOffset)
        .map(s => (s.startOffset, s.endOffset - s.startOffset)).toVector
      assert(got == oracle, s"p$part graced boundaries: got=$got oracle=$oracle")
      // and the archive decodes identically to the origin
      val a = Segment.readRange(origin, part, 0, Long.MaxValue).toVector
      val b = Segment.readRange(dest, part, 0, Long.MaxValue).toVector
      assert(a.map(_.copy(html = null)) == b.map(_.copy(html = null)))
    }
    // rewind-idempotence: an independent run (fresh checkpoint/dest) makes
    // byte-identical files — boundary decisions are data-driven, the wall
    // clock only decides WHEN the tail lands, never WHERE it splits
    val dest2 = run("b")
    assert(md5s(dest2) == md5s(dest), "graced archive must be byte-identical across runs")
  }

  test("event-time flush policy drives ARCHIVE file boundaries (W1 in the sink)") {
    import graft.streaming.FlushWindows
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1500)
    val origin = tmpDir("archfw-src")
    ChangeEventGen.writeSegments(p, origin, segmentEvents = 700, chunkThreshold = 64 * 1024)
    val dest = tmpDir("archfw-dst")
    val intervalUs = 200L * 1000000 // ~200 events of event time per file

    // single batch (the whole stream), count rotation effectively off: file
    // boundaries must be EXACTLY the reference's shouldFlushBefore decisions
    val df = BinlogRead.all(spark, origin.toString)
    val segs = Archive.archiveBatch(spark, dest, segmentEvents = Long.MaxValue,
      chunkThreshold = 16 * 1024, flushIntervalUs = Some(intervalUs))(df, 0L)

    (0 until p.partitions).foreach { part =>
      val evts = ChangeEventGen.events(p, part).map { e =>
        FlushWindows.EventLite(part, e.offset, graft.Oracle.micros(e.warc_ts),
          if (e.html == null) 0L else e.html.length.toLong)
      }
      val (closed, open, _) = FlushWindows.foldEvents(evts, None, intervalUs)
      val oracle = (closed.map(c => (c.startOffset, c.numRecords)) ++
        open.map(o => (o.startOffset, o.numRecords))).toVector // tail closes at batch end
      val got = segs.filter(_.partition == part).sortBy(_.startOffset)
        .map(s => (s.startOffset, s.records)).toVector
      assert(got == oracle, s"p$part boundaries: got=$got oracle=$oracle")
    }
    // and the files are a faithful decodable archive
    (0 until p.partitions).foreach { part =>
      val a = Segment.readRange(origin, part, 0, Long.MaxValue).toVector
      val b = Segment.readRange(dest, part, 0, Long.MaxValue).toVector
      assert(a.map(_.copy(html = null)) == b.map(_.copy(html = null)))
    }
  }
}
