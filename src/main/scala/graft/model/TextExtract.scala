package graft.model

import java.nio.charset.StandardCharsets

/** Deterministic, bit-stable HTML → text extractor.
  *
  * The north rule requires byte-identical extracted `text` per `url` under
  * full-log replay and schema evolution, so this function must be a pure
  * function of the `html` bytes only: no locale, no regex-engine ambiguity,
  * no library calls whose behavior could drift. It is a single-pass,
  * hand-rolled state machine:
  *
  *  - decodes UTF-8 (malformed sequences → U+FFFD, the Java REPLACE policy,
  *    which is fully specified and stable),
  *  - drops everything inside `<script>`/`<style>` elements (case-insensitive
  *    ASCII match only),
  *  - strips all other tags and comments,
  *  - decodes the five named entities `&amp; &lt; &gt; &quot; &#39;` plus
  *    decimal `&#NNNN;` references (BMP only),
  *  - collapses every run of Unicode whitespace (determined by fixed code
  *    point list, not `Character.isWhitespace` tables that could change) to a
  *    single ASCII space and trims.
  *
  * The reference has no extraction step (it is bytes-through); this is the
  * engine-side function C10 of SURVEY.md §2.8.
  */
object TextExtract {

  /** Stable whitespace predicate: fixed code-point set, independent of JDK
    * Unicode tables. */
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == 0x0b || c == 0xa0

  def extract(html: Array[Byte]): String = {
    if (html == null) return null
    val s = new String(html, StandardCharsets.UTF_8) // REPLACE policy
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    var inTag = false
    var pendingSpace = false
    var skipUntil: String = null // lowercase close tag to look for

    @inline def lowerAt(pos: Int, lit: String): Boolean = {
      if (pos + lit.length > n) return false
      var j = 0
      while (j < lit.length) {
        val c = s.charAt(pos + j)
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toChar else c
        if (lc != lit.charAt(j)) return false
        j += 1
      }
      true
    }

    @inline def emit(c: Char): Unit = {
      if (isWs(c)) { if (out.length > 0) pendingSpace = true }
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
      }
    }

    while (i < n) {
      val c = s.charAt(i)
      if (skipUntil != null) {
        if (c == '<' && lowerAt(i, skipUntil)) {
          i += skipUntil.length
          while (i < n && s.charAt(i) != '>') i += 1
          i += 1 // past '>'
          skipUntil = null
        } else i += 1
      } else if (inTag) {
        if (c == '>') inTag = false
        i += 1
      } else if (c == '<') {
        if (lowerAt(i, "<!--")) {
          i += 4
          while (i + 2 < n && !(s.charAt(i) == '-' && s.charAt(i + 1) == '-' && s.charAt(i + 2) == '>')) i += 1
          i = math.min(n, i + 3)
        } else if (lowerAt(i, "<script")) { skipUntil = "</script"; i += 7 }
        else if (lowerAt(i, "<style")) { skipUntil = "</style"; i += 6 }
        else { inTag = true; i += 1; pendingSpace = out.length > 0 }
      } else if (c == '&') {
        // entity decode
        if (lowerAt(i, "&amp;")) { emit('&'); i += 5 }
        else if (lowerAt(i, "&lt;")) { emit('<'); i += 4 }
        else if (lowerAt(i, "&gt;")) { emit('>'); i += 4 }
        else if (lowerAt(i, "&quot;")) { emit('"'); i += 6 }
        else if (i + 1 < n && s.charAt(i + 1) == '#') {
          var j = i + 2
          var code = 0
          var digits = 0
          while (j < n && digits < 7 && s.charAt(j) >= '0' && s.charAt(j) <= '9') {
            code = code * 10 + (s.charAt(j) - '0'); j += 1; digits += 1
          }
          if (digits > 0 && j < n && s.charAt(j) == ';' && code > 0 && code < 0xFFFE) {
            emit(code.toChar); i = j + 1
          } else { emit('&'); i += 1 }
        } else { emit('&'); i += 1 }
      } else { emit(c); i += 1 }
    }
    out.toString
  }

  /** Spark-facing column form. Registered as a deterministic UDF; the hot
    * ingest path calls it once per surviving (post-dedup) row only. */
  def udf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udf((b: Array[Byte]) => extract(b))
}
