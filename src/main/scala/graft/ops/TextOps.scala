package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines, built
  * entirely from codegen'd `functions._` (no UDFs in the hot path) so they
  * stay inside whole-stage codegen and scale linearly with input splits.
  *
  * All regexes are chosen to behave identically under Java regex (Spark) and
  * RE2 (DuckDB oracle): explicit character classes, no lookaround.
  */
object TextOps {

  /** Token count: number of non-whitespace runs. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[^ \\t\\n\\r]+"), lit(0))).cast("long")

  /** Language-ID heuristic: per-language stopword hit counts over
    * lowercased text, argmax with fixed precedence (en > de > fr > es).
    * A real pipeline would swap in fastText-style n-gram models; the
    * operator shape (wide derived columns + CASE) is what matters at scale. */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is)\\b",
    "de" -> "\\b(der|die|und|das|ist)\\b",
    "fr" -> "\\b(le|la|et|les|est)\\b",
    "es" -> "\\b(el|los|las|es|y)\\b")

  def langScores(text: Column): Seq[(String, Column)] =
    langMarkers.map { case (l, re) =>
      l -> size(regexp_extract_all(lower(text), lit(re), lit(0))).cast("long")
    }

  def langId(text: Column): Column = {
    val scores = langScores(text)
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("unknown")) { case ((l, s), acc) =>
      when(s > 0 && s === best, lit(l)).otherwise(acc)
    }
  }

  /** Quality-score components: length, punctuation density, stopword ratio,
    * digit density — the standard web-text quality gates (C4/Gopher-style
    * rules), each a cheap codegen'd expression. */
  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0))).cast("long")
  def digitCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0))).cast("long")
  def stopwordCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("\\b(the|a|and|of|to|in|is|it)\\b"), lit(0))).cast("long")

  /** Composite quality score in [0,1]-ish: rewards stopword presence and
    * sane length, penalizes punctuation/digit soup. Pure integer-ratio
    * double math — bit-identical across engines. */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text)
    val chars = length(text).cast("long")
    val stop = stopwordCount(text)
    val punct = punctCount(text)
    val digit = digitCount(text)
    round(
      when(toks === 0, lit(0.0)).otherwise(
        lit(0.4) * least(stop.cast("double") / toks.cast("double") * 8.0, lit(1.0)) +
          lit(0.3) * least(chars.cast("double") / 500.0, lit(1.0)) +
          lit(0.3) * (lit(1.0) - least((punct + digit).cast("double") / greatest(chars, lit(1L)).cast("double") * 10.0, lit(1.0)))),
      4)
  }

  /** Whitespace-normalized MD5 document fingerprint (portable: md5 hex is
    * identical in Spark and DuckDB). */
  def fingerprintMd5(text: Column): Column =
    md5(to_binary(regexp_replace(trim(lower(text)), "[ \\t\\n\\r]+", " "), lit("utf-8")))

  /** Word n-gram shingles as an array column — a native codegen'd
    * Catalyst expression (StaticInvoke of a one-split kernel). HOFs are
    * CodegenFallback and re-evaluate the inlined `split()` per lambda
    * element (measured ~10s vs ~0.2s for 5000 docs); a plain Scala UDF
    * avoids that but still pays encoder round-trips.
    * Tokenization exactly mirrors `regexp_extract_all(text, '[^ \\t\\n\\r]+')`. */
  def shingles(text: Column, n: Int): Column =
    graft.functions.NativeFns.shingles(text, n)

  /** Rabin-Karp rolling hash over the token stream (base 257, mod 1e9+7 —
    * keeps acc*base + term < 2^63): a streaming fingerprint usable for
    * shift-resistant chunk hashing. Native one-pass kernel (the round-1
    * `aggregate`-HOF version was interpreted), with md5-derived term hashes
    * so the DuckDB oracle can reproduce it bit-for-bit. */
  def rollingHash(text: Column): Column =
    graft.functions.NativeFns.rollingHashMd5(text)
}
