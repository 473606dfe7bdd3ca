package graft.model

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

class TextExtractSpec extends AnyFunSuite {
  private def x(s: String): String = TextExtract.extract(s.getBytes(StandardCharsets.UTF_8))

  test("strips tags, collapses whitespace") {
    assert(x("<html><body><p>hello   world</p>\n<div>again</div></body></html>")
      == "hello world again")
  }
  test("drops script and style content, case-insensitive") {
    assert(x("<p>a</p><SCRIPT>var x=1;</SCRIPT><p>b</p><style>.c{}</style>c") == "a b c")
  }
  test("decodes entities") {
    assert(x("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39; &#8212; f &unknown;")
      == "a & b <c> \"d\" 'e' — f &unknown;")
  }
  test("comments removed, unterminated tag safe") {
    assert(x("a<!-- hidden <p>x</p> -->b") == "ab")
    assert(x("a<unclosed") == "a")
  }
  test("multi-byte UTF-8 stable; malformed bytes → U+FFFD deterministically") {
    assert(x("<p>café — 東京</p>") == "café — 東京")
    val bad = Array[Byte]('a'.toByte, 0xC3.toByte, 'b'.toByte)
    assert(TextExtract.extract(bad) == "a�b")
  }
  test("null html → null text; byte-identical across calls") {
    assert(TextExtract.extract(null) == null)
    val h = graft.binlog.ChangeEventGen.html("https://d1.example.org/x", 3L, 42L, 900)
    assert(TextExtract.extract(h) == TextExtract.extract(h.clone()))
    assert(TextExtract.extract(h).nonEmpty)
  }
}
