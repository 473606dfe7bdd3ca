package graft.binlog

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChangeEvent

/** Mirrors the reference's ChunkedOutput / offset-restore test suite:
  * `/root/reference/sink/src/test/java/com/spredfast/kafka/connect/s3/BlockGZIPFileWriterTest.java:42-228`
  * and `source/src/test/java/com/spredfast/kafka/connect/s3/S3FilesReaderTest.java:118-199`. */
class SegmentSpec extends AnyFunSuite {

  private def tmp = { val p = Files.createTempDirectory("seg"); p.toFile.deleteOnExit(); p }

  private def evt(part: Int, off: Long, url: String = null, op: String = ChangeEvent.OpUpsert,
      htmlLen: Int = 400): ChangeEvent = {
    val u = if (url == null) s"https://d1.example.org/p$part/doc$off" else url
    val ts = new Timestamp(1700000000000L + off * 1000)
    val html = if (op == ChangeEvent.OpDelete) null
      else Array.tabulate[Byte](htmlLen)(i => ((i + off) % 251).toByte)
    ChangeEvent(part, off, op, u, ts, html, "en")
  }

  test("event codec round-trips, v1 and v2, deletes, embedded newlines") {
    val e = evt(3, 42).copy(url = "https://x.org/a\nb?q=é") // embedded newline + non-ascii
    val d2 = EventCodec.decodeValue(3, 42, EventCodec.encodeValue(e, EventCodec.V2))
    assert(d2 == e.copy(html = d2.html) && java.util.Arrays.equals(d2.html, e.html))
    val d1 = EventCodec.decodeValue(3, 42, EventCodec.encodeValue(e, EventCodec.V1))
    assert(d1.lang == null && d1.url == e.url && d1.warc_ts == e.warc_ts)
    val del = evt(0, 7, op = ChangeEvent.OpDelete)
    val dd = EventCodec.decodeValue(0, 7, EventCodec.encodeValue(del))
    assert(dd.op == ChangeEvent.OpDelete && dd.html == null)
  }

  test("tiny chunk threshold produces many chunks; chain contiguous; sizes add up") {
    val dir = tmp
    // ≙ BlockGZIPFileWriterTest: 1KB threshold, 50 padded records ⇒ ≥10 chunks
    val w = new SegmentWriter(dir, 0, 987654321L, chunkThreshold = 1024)
    (0 until 50).foreach(i => w.writeEvent(evt(0, 987654321L + i, htmlLen = 400)))
    val idx = w.close()
    assert(idx.chunks.size >= 10)
    assert(idx.totalRecords == 50)
    assert(idx.chunks.head.firstRecordOffset == 987654321L) // non-zero start propagates
    assert(idx.nextOffset == 987654321L + 50)
    // chain contiguity: next.first = prev.first + prev.num_records
    idx.chunks.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b.firstRecordOffset == a.firstRecordOffset + a.numRecords)
        assert(b.byteOffset == a.byteOffset + a.byteLength)
      case _ =>
    }
    // Σ byte_length == file length
    val f = dir.resolve(w.baseName + ".gz")
    assert(idx.totalSize == Files.size(f))
    // every chunk independently decompressible from its byte offset
    idx.chunks.foreach { c =>
      val ch = Files.newByteChannel(f)
      ch.position(c.byteOffset)
      val in = new java.util.zip.GZIPInputStream(java.nio.channels.Channels.newInputStream(ch))
      var n = 0L
      var fr = EventCodec.readFrame(in, "t")
      var seen = 0L
      while (fr != null && seen < c.numRecords) {
        val d = EventCodec.decodeValue(0, c.firstRecordOffset + seen, fr._2)
        assert(d.offset == c.firstRecordOffset + seen)
        seen += 1
        n += 1
        fr = if (seen < c.numRecords) EventCodec.readFrame(in, "t") else null
      }
      assert(n == c.numRecords)
      in.close()
    }
    // index JSON round-trip with reference key names
    val json = idx.toJson
    assert(json.contains("\"first_record_offset\"") && json.contains("\"byte_length_uncompressed\""))
    assert(ChunkIndex.fromJson(json) == idx)
  }

  test("resume mid-file skips exactly to the stored offset") {
    val dir = tmp
    val w = new SegmentWriter(dir, 1, 0L, chunkThreshold = 2048)
    (0 until 100).foreach(i => w.writeEvent(evt(1, i)))
    w.close()
    val seg = Segment.list(dir, 1).head
    // ≙ S3FilesReaderTest: stored offset 4 ⇒ emits exactly 5..end
    val got = Segment.read(seg, fromOffset = 5L).toVector
    assert(got.size == 95 && got.head.offset == 5L && got.last.offset == 99L)
    // bounded range
    val mid = Segment.read(seg, 40L, 60L).toVector
    assert(mid.map(_.offset) == (40L until 60L).toVector)
  }

  test("multi-segment range read rolls across files; next-offset arithmetic") {
    val dir = tmp
    var off = 0L
    for (_ <- 0 until 3) {
      val w = new SegmentWriter(dir, 2, off, chunkThreshold = 4096)
      (0 until 40).foreach { _ => w.writeEvent(evt(2, off)); off += 1 }
      val idx = w.close()
      assert(idx.nextOffset == off) // next = last.first + num_records
    }
    val all = Segment.readRange(dir, 2, 0L, Long.MaxValue).toVector
    assert(all.map(_.offset) == (0L until 120L).toVector)
    // resume at end-of-file rolls to next file
    val resumed = Segment.readRange(dir, 2, 40L, 90L).toVector
    assert(resumed.map(_.offset) == (40L until 90L).toVector)
  }

  test("uncommitted (torn) segment without index is invisible; delete removes both") {
    val dir = tmp
    val w1 = new SegmentWriter(dir, 0, 0L)
    (0 until 10).foreach(i => w1.writeEvent(evt(0, i)))
    w1.close()
    // torn write: data published without index → must be skipped
    val w2 = new SegmentWriter(dir, 0, 10L)
    (0 until 5).foreach(i => w2.writeEvent(evt(0, 10 + i)))
    // simulate crash: move tmp data into place without index
    Files.move(dir.resolve(w2.baseName + ".gz.tmp"), dir.resolve(w2.baseName + ".gz"))
    assert(Segment.list(dir, 0).map(_.startOffset) == Vector(0L))
    val w3 = new SegmentWriter(dir, 7, 0L)
    w3.writeEvent(evt(7, 0))
    w3.delete()
    assert(Segment.list(dir, 7).isEmpty)
  }

  test("generator is deterministic and splittable") {
    val p = GenProfile.uniformSmall()
    val a = ChangeEventGen.event(p, 1, 4321L)
    val b = ChangeEventGen.event(p, 1, 4321L)
    assert(a == b.copy(html = a.html) && java.util.Arrays.equals(a.html, b.html))
    // profile stats roughly as configured
    val evts = ChangeEventGen.events(p, 0).toVector
    val delRatio = evts.count(_.op == ChangeEvent.OpDelete).toDouble / evts.size
    assert(delRatio > 0.05 && delRatio < 0.15)
    val dupRatio = 1.0 - evts.map(_.url).distinct.size.toDouble / evts.size
    assert(dupRatio > 0.15) // meaningful duplication
  }

  test("writeSegments + readRange round-trips the whole generated stream") {
    val dir = tmp
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 500)
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 150, chunkThreshold = 8192)
    for (part <- 0 until p.partitions) {
      val got = Segment.readRange(dir, part, 0L, Long.MaxValue).toVector
      val want = ChangeEventGen.events(p, part).toVector
      assert(got.size == want.size)
      got.zip(want).foreach { case (g, e) =>
        assert(g.copy(html = null) == e.copy(html = null))
        assert(java.util.Arrays.equals(g.html, e.html))
      }
    }
  }

  test("evolving profile: v1 wire events decode with null lang, rest intact") {
    val dir = tmp
    val p = GenProfile.evolving().copy(partitions = 1, eventsPerPartition = 100)
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 100)
    val got = Segment.readRange(dir, 0, 0L, Long.MaxValue).toVector
    val v1count = got.count(_.lang == null)
    assert(v1count == 40) // first 40% are v1
    assert(got.drop(40).forall(_.lang != null))
  }
}
