package graft.binlog

import java.io.{ByteArrayOutputStream, InputStream}
import java.nio.charset.Charset

/** Delimiter-based wire format — the reference's `TrailingDelimiterFormat` /
  * `DelimitedRecordReader` pair
  * (`/root/reference/common/src/main/java/com/spredfast/kafka/connect/s3/TrailingDelimiterFormat.java:19-68`,
  * `common/.../DelimitedRecordReader.java:41-145`): each record is
  * `[key][keyDelim]? [value][valueDelim]`, delimiters are configurable byte
  * sequences derived from (string, charset) — default `\n` UTF-8.
  *
  * Reference error semantics preserved:
  *  - stream ends with bytes but no trailing delimiter → "Missing trailing
  *    delimiter" error (`DelimitedRecordReaderTest.java:14-60`);
  *  - a record larger than the scan buffer → hard error (no silent split);
  *  - values must not contain the value delimiter (text format contract —
  *    binary payloads belong to the length-prefixed format, `EventCodec`).
  */
final case class DelimitedFormat(
    valueDelimiter: Array[Byte],
    keyDelimiter: Option[Array[Byte]] = None) {

  def encode(key: Array[Byte], value: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(
      value.length + valueDelimiter.length +
        key1Len(key) + keyDelimiter.map(_.length).getOrElse(0))
    (key, keyDelimiter) match {
      case (k, Some(kd)) if k != null => out.write(k); out.write(kd)
      case _ =>
    }
    out.write(value)
    out.write(valueDelimiter)
    out.toByteArray
  }
  private def key1Len(k: Array[Byte]) = if (k == null) 0 else k.length

  /** Read one `(key, value)` record; null at clean EOF. */
  def read(in: InputStream, buffer: Array[Byte], where: => String): (Array[Byte], Array[Byte]) = {
    var len = 0
    var b = in.read()
    if (b < 0) return null
    while (b >= 0) {
      if (len >= buffer.length)
        throw new java.io.IOException(s"Record exceeds buffer (${buffer.length} B) at $where")
      buffer(len) = b.toByte
      len += 1
      if (endsWith(buffer, len, valueDelimiter)) {
        val body = len - valueDelimiter.length
        return split(buffer, body)
      }
      b = in.read()
    }
    throw new java.io.IOException(s"Missing trailing delimiter at $where")
  }

  private def endsWith(buf: Array[Byte], len: Int, delim: Array[Byte]): Boolean = {
    if (len < delim.length) return false
    var i = 0
    while (i < delim.length) {
      if (buf(len - delim.length + i) != delim(i)) return false
      i += 1
    }
    true
  }

  private def split(buf: Array[Byte], bodyLen: Int): (Array[Byte], Array[Byte]) =
    keyDelimiter match {
      case None => (null, java.util.Arrays.copyOfRange(buf, 0, bodyLen))
      case Some(kd) =>
        val idx = indexOf(buf, bodyLen, kd)
        if (idx < 0) (null, java.util.Arrays.copyOfRange(buf, 0, bodyLen))
        else (java.util.Arrays.copyOfRange(buf, 0, idx),
          java.util.Arrays.copyOfRange(buf, idx + kd.length, bodyLen))
    }

  private def indexOf(buf: Array[Byte], len: Int, pat: Array[Byte]): Int = {
    var i = 0
    while (i + pat.length <= len) {
      var j = 0
      while (j < pat.length && buf(i + j) == pat(j)) j += 1
      if (j == pat.length) return i
      i += 1
    }
    -1
  }

  /** Iterator over a whole stream (≙ `readAll` with synthetic offsets). */
  def readAll(in: InputStream, bufferSize: Int = 32 * 1024 * 1024,
      where: => String = "<stream>"): Iterator[(Array[Byte], Array[Byte])] = {
    val buffer = new Array[Byte](bufferSize)
    Iterator.continually(read(in, buffer, where)).takeWhile(_ != null)
  }
}

object DelimitedFormat {
  /** Build from delimiter strings + charsets (≙ `format.*.delimiter` +
    * `format.*.delimiter.charset` config, `TrailingDelimiterFormat.java:26-48`). */
  def of(valueDelim: String = "\n", valueCharset: String = "UTF-8",
      keyDelim: Option[String] = None, keyCharset: String = "UTF-8"): DelimitedFormat =
    DelimitedFormat(
      valueDelim.getBytes(Charset.forName(valueCharset)),
      keyDelim.map(_.getBytes(Charset.forName(keyCharset))))
}
