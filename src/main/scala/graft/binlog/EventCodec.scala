package graft.binlog

import java.io.{ByteArrayOutputStream, DataOutputStream, DataInputStream, ByteArrayInputStream, EOFException, InputStream}
import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import graft.model.ChangeEvent

/** Wire framing + event payload codec for binlog segment files.
  *
  * Framing clones the reference's length-prefixed binary format
  * (`ByteLengthFormat`, `/root/reference/common/src/main/java/com/spredfast/kafka/connect/s3/ByteLengthFormat.java:40-56`):
  * `[keyLen:int32 BE][key][valLen:int32 BE][val]`, key optional (len = -1).
  * Key = url bytes; value = the versioned event payload below.
  *
  * Payload (version byte first so the stream itself can carry schema
  * evolution, FIXTURES.md F1 `evolving` profile):
  * {{{
  * v1: [ver=1][op:u8][warc_ts_micros:i64][urlLen:i32][url][htmlLen:i32][html]
  * v2: v1 ++ [langLen:i32][lang]                 (added column `lang`)
  * }}}
  * Values containing embedded newlines/delimiters round-trip by construction
  * (length-prefixed), mirroring `ByteLengthFormatTest.java:22-27`.
  */
object EventCodec {

  val V1: Byte = 1
  val V2: Byte = 2

  private def writeBytes(o: DataOutputStream, b: Array[Byte]): Unit =
    if (b == null) o.writeInt(-1) else { o.writeInt(b.length); o.write(b) }

  private def readBytes(in: DataInputStream): Array[Byte] = {
    val len = in.readInt()
    if (len < 0) null
    else {
      val b = new Array[Byte](len)
      in.readFully(b)
      b
    }
  }

  def encodeValue(e: ChangeEvent, version: Byte = V2): Array[Byte] = {
    val bos = new ByteArrayOutputStream(256)
    val o = new DataOutputStream(bos)
    o.writeByte(version)
    o.writeByte(if (e.op == ChangeEvent.OpDelete) 1 else 0)
    o.writeLong(e.warc_ts.getTime * 1000L + (e.warc_ts.getNanos / 1000) % 1000)
    writeBytes(o, e.url.getBytes(StandardCharsets.UTF_8))
    writeBytes(o, e.html)
    if (version >= V2) writeBytes(o, if (e.lang == null) null else e.lang.getBytes(StandardCharsets.UTF_8))
    o.flush()
    bos.toByteArray
  }

  def decodeValue(partition: Int, offset: Long, value: Array[Byte]): ChangeEvent = {
    val in = new DataInputStream(new ByteArrayInputStream(value))
    val ver = in.readByte()
    val op = if (in.readByte() == 1) ChangeEvent.OpDelete else ChangeEvent.OpUpsert
    val micros = in.readLong()
    val ts = new Timestamp(micros / 1000)
    ts.setNanos(((micros % 1000000) * 1000).toInt)
    val url = new String(readBytes(in), StandardCharsets.UTF_8)
    val html = readBytes(in)
    val lang = if (ver >= V2) { val b = readBytes(in); if (b == null) null else new String(b, StandardCharsets.UTF_8) } else null
    ChangeEvent(partition, offset, op, url, ts, html, lang)
  }

  /** Frame one record: [keyLen][key][valLen][val], big-endian int32 prefixes. */
  def frame(key: Array[Byte], value: Array[Byte]): Array[Byte] = {
    val kl = if (key == null) 0 else key.length
    // the read-side plausibility bound must be enforced symmetrically at
    // write time: a larger frame would commit durably and then be
    // permanently unreadable as a "corrupt record"
    require(kl <= MaxFrameBytes && value.length <= MaxFrameBytes,
      s"frame exceeds MaxFrameBytes ($MaxFrameBytes): key=$kl value=${value.length}")
    val buf = java.nio.ByteBuffer.allocate(8 + kl + value.length)
    if (key == null) buf.putInt(-1) else { buf.putInt(kl); buf.put(key) }
    buf.putInt(value.length)
    buf.put(value)
    buf.array()
  }

  /** Read one frame from a stream; null at clean EOF; throws on truncation
    * (≙ `BytesRecordReader.read`, `common/.../BytesRecordReader.java:29-93`:
    * `DataException("Corrupt record …")`). Returns (key, value). */
  def readFrame(in: InputStream, where: => String): (Array[Byte], Array[Byte]) = {
    val b0 = in.read()
    if (b0 < 0) return null // clean EOF
    val hdr = new Array[Byte](3)
    var got = 0
    while (got < 3) {
      val r = in.read(hdr, got, 3 - got)
      if (r < 0) throw new java.io.IOException(s"Corrupt record at $where: truncated key length")
      got += r
    }
    val keyLen = ((b0 & 0xff) << 24) | ((hdr(0) & 0xff) << 16) | ((hdr(1) & 0xff) << 8) | (hdr(2) & 0xff)
    // plausibility guard: a flipped bit in a length prefix must fail as a
    // corrupt record, not as a multi-GB allocation (or a negative-size
    // crash) — the decoder's equivalent of the reference's DataException
    def checkLen(len: Int, what: String): Unit =
      if (len < -1 || len > MaxFrameBytes) throw new java.io.IOException(
        s"Corrupt record at $where: implausible $what length $len")
    checkLen(keyLen, "key")
    val din = new DataInputStream(in)
    try {
      val key = if (keyLen == -1) null else { val k = new Array[Byte](keyLen); din.readFully(k); k }
      val valLen = din.readInt()
      // the value is never null on the wire: -1 is corrupt here, not a marker
      if (valLen < 0 || valLen > MaxFrameBytes) throw new java.io.IOException(
        s"Corrupt record at $where: implausible value length $valLen")
      val v = new Array[Byte](valLen)
      din.readFully(v)
      (key, v)
    } catch {
      case _: EOFException => throw new java.io.IOException(s"Corrupt record at $where: truncated body")
    }
  }

  /** Upper bound on a single framed key/value (256 MB — far above any web
    * page, far below an executor heap). */
  val MaxFrameBytes: Int = 256 * 1024 * 1024
}
