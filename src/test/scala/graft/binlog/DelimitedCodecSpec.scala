package graft.binlog

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's delimiter-format suites:
  * `TrailingDelimiterFormatTest.java:16-72` (golden bytes, UTF-16BE
  * delimiters, keys optional) and `DelimitedRecordReaderTest.java:14-60`
  * (missing trailing delimiter, oversized record, 10-record happy path). */
class DelimitedCodecSpec extends AnyFunSuite {

  private def s(x: String) = x.getBytes(StandardCharsets.UTF_8)

  test("round-trip, values only, default newline") {
    val f = DelimitedFormat.of()
    val bytes = (0 until 10).map(i => f.encode(null, s(s"value-$i"))).reduce(_ ++ _)
    val got = f.readAll(new ByteArrayInputStream(bytes)).toVector
    assert(got.size == 10)
    got.zipWithIndex.foreach { case ((k, v), i) =>
      assert(k == null && new String(v, StandardCharsets.UTF_8) == s"value-$i")
    }
  }

  test("round-trip with keys and custom delimiters") {
    val f = DelimitedFormat.of(valueDelim = "\n", keyDelim = Some("\t"))
    val bytes = f.encode(s("key1"), s("val1")) ++ f.encode(s("key2"), s("val2"))
    val got = f.readAll(new ByteArrayInputStream(bytes)).toVector
    assert(got.map { case (k, v) => (new String(k, "UTF-8"), new String(v, "UTF-8")) } ==
      Vector(("key1", "val1"), ("key2", "val2")))
  }

  test("golden bytes: UTF-16BE value delimiter (exact encoding, ≙ TrailingDelimiterFormatTest)") {
    val f = DelimitedFormat.of(valueDelim = "\n", valueCharset = "UTF-16BE")
    val enc = f.encode(null, s("v"))
    // 'v' then UTF-16BE newline = 0x00 0x0A
    assert(enc.toSeq == Seq('v'.toByte, 0x00.toByte, 0x0A.toByte))
  }

  test("missing trailing delimiter → hard error") {
    val f = DelimitedFormat.of()
    val bytes = s("complete\npartial-no-delim")
    val it = f.readAll(new ByteArrayInputStream(bytes), where = "seg:0")
    assert(new String(it.next()._2, "UTF-8") == "complete")
    val e = intercept[java.io.IOException](it.next())
    assert(e.getMessage.contains("Missing trailing delimiter"))
  }

  test("record larger than buffer → hard error, not silent split") {
    val f = DelimitedFormat.of()
    val bytes = s("x" * 100 + "\n")
    val e = intercept[java.io.IOException](
      f.read(new ByteArrayInputStream(bytes), new Array[Byte](16), "seg:0"))
    assert(e.getMessage.contains("exceeds buffer"))
  }

  test("key delimiter absent in record → whole body is the value") {
    val f = DelimitedFormat.of(keyDelim = Some("\t"))
    val got = f.readAll(new ByteArrayInputStream(s("no-tab-here\n"))).toVector
    assert(got.head._1 == null && new String(got.head._2, "UTF-8") == "no-tab-here")
  }
}
