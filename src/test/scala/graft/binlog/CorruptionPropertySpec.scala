package graft.binlog

import java.nio.file.{Files, Path, StandardOpenOption}

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property over ARBITRARY single-byte corruption of a segment:
  *
  *  1. a STRICT read must either throw or return the complete record set —
  *     never a silent subset (the clean-EOF truncation class of bug);
  *  2. a TOLERANT read never throws, and its emitted offsets plus its
  *     reported quarantine ranges exactly partition the segment's offsets —
  *     nothing lost silently, nothing double-reported;
  *  3. re-reading the corrupted file is deterministic (same emits, same
  *     ranges).
  *
  * Pure segment-level (no Spark session). The reference has no corruption
  * tests at all; this generalizes its corrupt-record DataExceptions
  * (`common/.../BytesRecordReader.java:29-93`) to every byte position. */
class CorruptionPropertySpec extends AnyFunSuite {

  private def freshSegment(): (GenProfile, Path, SegmentFile) = {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 400,
      urlPoolPerPartition = 300)
    val dir = Files.createTempDirectory("corrupt-prop")
    dir.toFile.deleteOnExit()
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 400, chunkThreshold = 16 * 1024)
    (p, dir, Segment.listAll(dir).head)
  }

  private def flipByte(f: Path, pos: Long, xor: Int): Unit = {
    val ch = Files.newByteChannel(f, StandardOpenOption.READ, StandardOpenOption.WRITE)
    try {
      val buf = java.nio.ByteBuffer.allocate(1)
      ch.position(pos); ch.read(buf): Unit
      buf.flip()
      val b = (buf.get(0) ^ xor).toByte
      ch.position(pos)
      ch.write(java.nio.ByteBuffer.wrap(Array(b))): Unit
    } finally ch.close()
  }

  test("any single-byte corruption: strict is loud-or-complete; tolerant partitions exactly") {
    val (p, _, clean) = freshSegment()
    val total = p.eventsPerPartition
    val size = Files.size(clean.path)
    val cleanBytes = Files.readAllBytes(clean.path)

    val prop = Prop.forAll(
      Gen.choose(0L, size - 1), Gen.choose(1, 255)) { (pos, xor) =>
      // restore, then corrupt one byte
      Files.write(clean.path, cleanBytes)
      flipByte(clean.path, pos, xor)

      // 1. strict: throw OR complete — never silently short
      val strictOk =
        try {
          val n = Segment.read(clean, 0L).size
          if (n != total)
            throw new AssertionError(s"SILENT LOSS: strict read returned $n of $total (pos=$pos xor=$xor)")
          true
        } catch {
          case _: AssertionError => false
          case scala.util.control.NonFatal(_) => true // loud is fine
        }

      // 2. tolerant: never throws; emits + quarantine ranges partition [0, total)
      var ranges = Vector.empty[Segment.CorruptRange]
      val emitted = Segment.readTolerant(clean, 0L, Long.MaxValue, onCorrupt = ranges :+= _)
        .map(_.offset).toVector
      val quarantined = ranges.flatMap(r => r.fromOffset until r.untilOffset)
      val union = (emitted ++ quarantined).sorted
      val exactPartition = union == (0L until total).toVector &&
        emitted.toSet.intersect(quarantined.toSet).isEmpty

      // 3. determinism
      var ranges2 = Vector.empty[Segment.CorruptRange]
      val emitted2 = Segment.readTolerant(clean, 0L, Long.MaxValue, onCorrupt = ranges2 :+= _)
        .map(_.offset).toVector
      val deterministic = emitted2 == emitted && ranges2 == ranges

      strictOk && exactPartition && deterministic
    }
    val params = org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(120)
    val result = org.scalacheck.Test.check(params, prop)
    assert(result.passed, s"property failed: ${result.status}")
  }
}
