package graft.binlog

import java.nio.file.{Files, Path, StandardOpenOption}

import graft.{Oracle, SparkSpec}
import graft.cdc.Ingest
import graft.lake.LakeTable

/** Corrupt-record handling: strict mode must fail LOUDLY (never silently
  * truncate — a corrupted mid-segment gzip member makes GZIPInputStream
  * report clean EOF, which used to end the read early with no error), and
  * `errorsTolerance=all` must quarantine the poisoned chunk's remainder to
  * the dead-letter dir and resync at the next chunk. */
class DeadLetterSpec extends SparkSpec {

  /** Flip one byte in the middle of chunk `i`'s gzip member. */
  private def corruptChunk(f: SegmentFile, i: Int): Unit = {
    val chunks = f.index.chunks
    val start = chunks(i).byteOffset
    val end = if (i + 1 < chunks.size) chunks(i + 1).byteOffset else Files.size(f.path)
    val pos = (start + end) / 2
    val ch = Files.newByteChannel(f.path, StandardOpenOption.READ, StandardOpenOption.WRITE)
    try {
      val buf = java.nio.ByteBuffer.allocate(1)
      ch.position(pos); ch.read(buf): Unit
      buf.flip()
      val flipped = (buf.get(0) ^ 0xff).toByte
      ch.position(pos)
      ch.write(java.nio.ByteBuffer.wrap(Array(flipped))): Unit
    } finally ch.close()
  }

  /** Zero a chunk's gzip magic: GZIPInputStream then reports CLEAN EOF at
    * the member boundary — the silent-truncation shape. */
  private def zeroChunkMagic(f: SegmentFile, i: Int): Unit = {
    val pos = f.index.chunks(i).byteOffset
    val ch = Files.newByteChannel(f.path, StandardOpenOption.WRITE)
    try {
      ch.position(pos)
      ch.write(java.nio.ByteBuffer.wrap(Array[Byte](0, 0))): Unit
    } finally ch.close()
  }

  private def gen(events: Long): (GenProfile, Path) = {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = events,
      urlPoolPerPartition = (events * 7 / 10).toInt)
    val dir = tmpDir("dlq-binlog")
    // small chunks → many gzip members per segment (resync granularity)
    ChangeEventGen.writeSegments(p, dir, segmentEvents = events, chunkThreshold = 32 * 1024)
    (p, dir)
  }

  test("strict mode fails loudly on a corrupt chunk AND on silent EOF truncation") {
    val (_, dir) = gen(600)
    val f = Segment.listAll(dir).head
    assert(f.index.chunks.size >= 4, s"need several chunks, got ${f.index.chunks.size}")
    corruptChunk(f, 1)
    val e1 = intercept[Exception](Segment.read(f, 0L).foreach(_ => ()))
    assert(e1.isInstanceOf[java.io.IOException] || e1.isInstanceOf[java.util.zip.ZipException],
      s"unexpected failure shape: $e1")
    // the clean-EOF shape: zeroed member magic must NOT end the read quietly
    val (_, dir2) = gen(600)
    val f2 = Segment.listAll(dir2).head
    zeroChunkMagic(f2, 1)
    val e2 = intercept[java.io.IOException](Segment.read(f2, 0L).foreach(_ => ()))
    assert(e2.getMessage.contains("Truncated segment"), s"got: ${e2.getMessage}")
  }

  test("corrupt frame lengths fail as corrupt records, not allocations") {
    val in = new java.io.ByteArrayInputStream(
      Array[Byte](0x7f, -1, -1, -1) ++ Array.fill[Byte](16)(0)) // keyLen ≈ 2^31
    val e = intercept[java.io.IOException](EventCodec.readFrame(in, "test"))
    assert(e.getMessage.contains("implausible"), e.getMessage)
  }

  test("tolerant read quarantines exactly the poisoned remainder and resyncs") {
    val (p, dir) = gen(800)
    val f = Segment.listAll(dir).head
    assert(f.index.chunks.size >= 5)
    corruptChunk(f, 1)
    corruptChunk(f, 2) // ADJACENT corrupt chunks: the resync-loop hazard
    var ranges = Vector.empty[Segment.CorruptRange]
    val got = Segment.readTolerant(f, 0L, Long.MaxValue, onCorrupt = ranges :+= _)
      .map(_.offset).toVector
    assert(ranges.nonEmpty)
    val quarantined = ranges.flatMap(r => r.fromOffset until r.untilOffset).toSet
    val expected = (0L until p.eventsPerPartition).filterNot(quarantined)
    assert(got == expected, s"emitted ${got.size}, expected ${expected.size}")
    // the skipped chunks' records are really inside the reported ranges
    assert(quarantined.nonEmpty && got.toSet.intersect(quarantined).isEmpty)
    // deterministic on re-read (same prefix, same ranges)
    var ranges2 = Vector.empty[Segment.CorruptRange]
    val got2 = Segment.readTolerant(f, 0L, Long.MaxValue, onCorrupt = ranges2 :+= _)
      .map(_.offset).toVector
    assert(got2 == got && ranges2 == ranges)
  }

  test("tolerant read survives a corrupt chunk HEADER at the open/resync target") {
    // Segment.read parses the seek target's gzip header EAGERLY in the
    // GZIPInputStream constructor — this failure shape must quarantine, not
    // escape tolerance (and must not leak the channel)
    val (p, dir) = gen(800)
    val f = Segment.listAll(dir).head
    assert(f.index.chunks.size >= 4)
    zeroChunkMagic(f, 0) // the very OPEN target of a from-0 read
    zeroChunkMagic(f, 2) // and a later member boundary (clean-EOF shape)
    var ranges = Vector.empty[Segment.CorruptRange]
    val got = Segment.readTolerant(f, 0L, Long.MaxValue, onCorrupt = ranges :+= _)
      .map(_.offset).toVector
    assert(ranges.nonEmpty)
    val quarantined = ranges.flatMap(r => r.fromOffset until r.untilOffset).toSet
    val expected = (0L until p.eventsPerPartition).filterNot(quarantined)
    assert(got == expected, s"emitted ${got.size}, expected ${expected.size}")
    // chunk 0 really was quarantined (open-target failure handled)
    assert(quarantined.contains(0L))
  }

  test("streaming ingest with a dead-letter dir survives a poison pill") {
    val (p, dir) = gen(1000)
    val f = Segment.listAll(dir).head
    corruptChunk(f, 2)
    val dlq = tmpDir("dlq-reports")
    val root = tmpDir("dlq-tbl")
    Ingest.startStream(spark, dir.toString, root, tmpDir("dlq-ckpt").toString,
      maxEventsPerBatch = 300, nBuckets = 4,
      deadLetterDir = Some(dlq.toString)).awaitTermination()
    // reports landed, loud and parseable
    val reports = Files.list(dlq).iterator()
    val names = scala.collection.mutable.ArrayBuffer.empty[Path]
    reports.forEachRemaining(names += _)
    assert(names.nonEmpty, "expected a dead-letter report")
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val quarantined = names.flatMap { path =>
      val n = m.readTree(Files.readAllBytes(path.toFile.toPath))
      n.get("fromOffset").asLong() until n.get("untilOffset").asLong()
    }.toSet
    assert(quarantined.nonEmpty)
    // final state = pure LWW oracle over the SURVIVING events only
    val survivors = ChangeEventGen.allEvents(p).filterNot(e => quarantined(e.offset))
    val folded = Oracle.fold(survivors).filter(_._2.op != graft.model.ChangeEvent.OpDelete)
    val table = LakeTable.load(root)
    val got = table.read(spark).collect()
      .map(r => r.getAs[String]("url") -> Oracle.micros(r.getAs[java.sql.Timestamp]("warc_ts"))).toMap
    assert(got.size == folded.size, s"rows: got=${got.size} oracle=${folded.size}")
    folded.foreach { case (url, w) => assert(got(url) == w.warcMicros, s"diff at $url") }
  }
}
