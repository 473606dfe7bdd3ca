package graft.binlog

import java.io.InputStream
import java.util.Base64

/** Wire-format registry — the reference's option-driven format selection
  * (`/root/reference/common/src/main/java/com/spredfast/kafka/connect/s3/Configure.java:125-150`
  * with `FORMAT_ALIAS` mapping short names to classes): a segment's record
  * framing is chosen by config, not hardwired.
  *
  *  - `framed` (alias `binary`) — length-prefixed `[keyLen][key][valLen][val]`
  *    (≙ `ByteLengthFormat`), safe for arbitrary binary values; the default.
  *  - `delimited` (alias `text`) — trailing-delimiter records
  *    (≙ `TrailingDelimiterFormat`); values are base64-wrapped on write so a
  *    binary event payload can never collide with the delimiter (the
  *    reference leaves that contract to the user; we enforce it).
  */
trait RecordCodec extends Serializable {
  def frame(key: Array[Byte], value: Array[Byte]): Array[Byte]
  /** One (key, value); null at clean EOF; throws on corrupt record. */
  def readFrame(in: InputStream, where: => String): (Array[Byte], Array[Byte])
}

object FramedCodec extends RecordCodec {
  override def frame(key: Array[Byte], value: Array[Byte]): Array[Byte] =
    EventCodec.frame(key, value)
  override def readFrame(in: InputStream, where: => String): (Array[Byte], Array[Byte]) =
    EventCodec.readFrame(in, where)
}

final case class DelimitedEventCodec(spec: CodecSpec) extends RecordCodec {
  @transient private lazy val fmt: DelimitedFormat =
    DelimitedFormat.of(spec.valueDelim, spec.valueCharset, spec.keyDelim, spec.keyCharset)
  @transient private lazy val buffer = new Array[Byte](32 * 1024 * 1024)

  override def frame(key: Array[Byte], value: Array[Byte]): Array[Byte] =
    fmt.encode(key, Base64.getEncoder.encode(value))
  override def readFrame(in: InputStream, where: => String): (Array[Byte], Array[Byte]) = {
    val kv = fmt.read(in, buffer, where)
    if (kv == null) null else (kv._1, Base64.getDecoder.decode(kv._2))
  }
}

/** Serializable codec configuration (travels inside InputPartitions). */
final case class CodecSpec(
    name: String = "framed",
    valueDelim: String = "\n",
    valueCharset: String = "UTF-8",
    keyDelim: Option[String] = None,
    keyCharset: String = "UTF-8") {
  def codec: RecordCodec = CodecSpec.alias.getOrElse(name, name) match {
    case "framed" => FramedCodec
    case "delimited" => DelimitedEventCodec(this)
    case other => throw new IllegalArgumentException(s"unknown format '$other'")
  }
}

object CodecSpec {
  /** ≙ Configure.FORMAT_ALIAS. */
  val alias: Map[String, String] = Map("binary" -> "framed", "text" -> "delimited")

  /** Build from DSv2-style options (format, format.delimiter, …). */
  def fromOptions(get: String => Option[String]): CodecSpec = CodecSpec(
    name = get("format").getOrElse("framed"),
    valueDelim = get("format.delimiter").getOrElse("\n"),
    valueCharset = get("format.delimiter.charset").getOrElse("UTF-8"),
    keyDelim = get("format.key.delimiter"),
    keyCharset = get("format.key.delimiter.charset").getOrElse("UTF-8"))
}
