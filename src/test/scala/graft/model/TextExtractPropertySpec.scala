package graft.model

import java.nio.charset.StandardCharsets

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized invariants of the bit-stable extractor (the north rule's
  * byte-identical-text guarantee rests on this function's determinism). */
class TextExtractPropertySpec extends AnyFunSuite {

  private val word = Gen.alphaNumStr.map(_.take(8)).suchThat(_.nonEmpty)
  private val fragment: Gen[String] = Gen.frequency(
    6 -> word,
    2 -> Gen.oneOf(" ", "  ", "\n", "\t", "\r\n"),
    2 -> word.map(w => s"<b>$w</b>"),
    1 -> word.map(w => s"<p class=\"x\">$w</p>"),
    1 -> word.map(w => s"<script>var $w=1;</script>"),
    1 -> word.map(w => s"<!-- $w -->"),
    1 -> Gen.oneOf("&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&#8212;", "&bogus;"),
    1 -> Gen.oneOf("café", "東京", "–", "ß"))
  private val htmlGen: Gen[String] = Gen.listOf(fragment).map(_.mkString)

  private def x(s: String): String = TextExtract.extract(s.getBytes(StandardCharsets.UTF_8))

  test("properties: deterministic, tag-free, entity-decoded, whitespace-collapsed") {
    val prop = Prop.forAll(htmlGen) { h =>
      val out = x(h)
      val stable = out == x(h) // determinism (fresh byte array each call)
      // no tag or comment content survives outside entities
      val noTags = !out.contains("<b>") && !out.contains("</") &&
        !out.contains("<p ") && !out.contains("<script") && !out.contains("<!--")
      val noScriptBody = !out.contains("var ") || !h.contains("<script>var")
      // whitespace fully collapsed: no doubles, no leading/trailing
      val collapsed = !out.contains("  ") && out == out.trim &&
        !out.exists(c => c == '\n' || c == '\t' || c == '\r')
      // decoded entities present verbatim when their source fragment occurred
      val entityOk = !h.contains("&#8212;") || out.contains("—")
      stable && noTags && noScriptBody && collapsed && entityOk
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(300)
        .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("extraction is stable under segment round-trip (wire bytes preserved)") {
    val prop = Prop.forAll(htmlGen) { h =>
      val bytes = h.getBytes(StandardCharsets.UTF_8)
      val e = graft.model.ChangeEvent(0, 1L, "upsert", "https://x/", new java.sql.Timestamp(0), bytes, "en")
      val rt = graft.binlog.EventCodec.decodeValue(0, 1L,
        graft.binlog.EventCodec.encodeValue(e))
      TextExtract.extract(rt.html) == TextExtract.extract(bytes)
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(200)
        .withInitialSeed(org.scalacheck.rng.Seed(11L)), prop)
    assert(res.passed, res.status.toString)
  }
}
