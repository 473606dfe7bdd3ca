package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.GraftBridge.{column, expression}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.model.TextExtract

/** Native Catalyst expressions for the engine's hot-path kernels, built on
  * `StaticInvoke` — fully codegen'd static calls operating directly on
  * Catalyst's internal types (`UTF8String`, byte arrays, `ArrayData`), with
  * none of a Scala UDF's encoder/converter round-trips.
  *
  * Preference order per the build brief: compose built-ins > custom
  * `Expression` > UDF. These kernels cannot be composed from built-ins
  * (bit-stable HTML extraction; single-split shingling), so they are
  * expressions; the UDF forms remain only as reference implementations.
  */
object NativeFns {

  /** html binary → extracted text, operating on UTF8String-free input and
    * returning UTF8String directly (no String churn at the boundary). */
  def extractText(html: Column): Column = column(
    StaticInvoke(
      NativeKernels.getClass,
      StringType,
      "extractUTF8",
      Seq(expression(html)),
      inputTypes = Seq(BinaryType),
      propagateNull = true,
      returnNullable = true))

  /** text → array of word n-gram shingles (one split, one pass). */
  def shingles(text: Column, n: Int): Column = column(
    StaticInvoke(
      NativeKernels.getClass,
      ArrayType(StringType, containsNull = false),
      "shinglesUTF8",
      Seq(expression(text), expression(lit(n))),
      inputTypes = Seq(StringType, IntegerType),
      propagateNull = true,
      returnNullable = true))

  /** text → k MinHash values over word n-gram shingles in ONE tokenize+
    * shingle+hash pass: element i = min over shingles of the hex md5 of
    * `"i|" ++ shingle` (hex-lexicographic min == byte-order min == what
    * `min(md5(...))` computes — the DuckDB-portable hash domain). Null when
    * the text has fewer than n tokens. Replaces an interpreted
    * `aggregate`-HOF fold. */
  def minhashSig(text: Column, n: Int, k: Int): Column = column(
    StaticInvoke(
      NativeKernels.getClass,
      ArrayType(StringType, containsNull = false),
      "minhashUTF8",
      Seq(expression(text), expression(lit(n)), expression(lit(k))),
      inputTypes = Seq(StringType, IntegerType, IntegerType),
      propagateNull = true,
      returnNullable = true))

  /** hex-md5 signature array → array of its LOW-64-BIT truncations (hex
    * chars 17..32 as an unsigned-wrapped long) — the storage form of the
    * persisted LSH index: 8 bytes per minhash instead of a 32-char hex
    * string, with equality preserved (equal md5 ⇒ equal low-64; a false
    * equality needs a 2⁻⁶⁴ collision between DIFFERENT md5s). DuckDB
    * reproduces the same domain as `substr(md5hex, 17, 16)` equality. */
  def sigLow64(sig: Column): Column = column(
    StaticInvoke(
      NativeKernels.getClass,
      ArrayType(LongType, containsNull = false),
      "sigLow64UTF8",
      Seq(expression(sig)),
      inputTypes = Seq(ArrayType(StringType)),
      propagateNull = true,
      returnNullable = true))

  /** text → 64-bit SimHash in ONE tokenize+hash pass (replaces the round-1
    * 64-separate-interpreted-HOF formulation — same semantics: per-bit
    * weighted majority of `xxhash64(token)`, identical token split and
    * identical XXH64 seed-42 hashing as the Spark built-in). */
  def simhash64(text: Column): Column = column(
    StaticInvoke(
      NativeKernels.getClass,
      LongType,
      "simhash64UTF8",
      Seq(expression(text)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = false))

  /** text → 64-bit SimHash with an ORACLE-PORTABLE hash domain: token hash
    * = low 64 bits of md5(token) — the value DuckDB computes as
    * `('0x' || substr(md5(t), 17, 16))::UBIGINT` — same vote fold as
    * [[simhash64]]. Use for oracle-graded runs; [[simhash64]] (XXH64) is
    * the faster scale default. */
  def simhash64Md5(text: Column): Column = column(
    StaticInvoke(
      NativeKernels.getClass,
      LongType,
      "simhashMd5UTF8",
      Seq(expression(text)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = false))

  /** text → Rabin-Karp rolling hash over the token stream, md5-based term
    * hashes (portable to the DuckDB oracle: term = first 8 md5 hex chars as
    * int, mod 1e9+7; fold acc·257 + term mod 1e9+7). */
  def rollingHashMd5(text: Column): Column = column(
    StaticInvoke(
      NativeKernels.getClass,
      LongType,
      "rollingMd5UTF8",
      Seq(expression(text)),
      inputTypes = Seq(StringType),
      propagateNull = true,
      returnNullable = false))
}

/** Static kernels invoked from generated code. MUST stay deterministic and
  * bit-stable (north rule: byte-identical text under replay). */
object NativeKernels {

  def extractUTF8(html: Array[Byte]): UTF8String = {
    val s = TextExtract.extract(html)
    if (s == null) null else UTF8String.fromString(s)
  }

  def shinglesUTF8(text: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    if (text == null) return null
    val words = text.toString.trim.split("[ \t\n\r]+").filter(_.nonEmpty)
    val out: Array[Any] =
      if (words.length < n) Array.empty[Any]
      else Array.tabulate[Any](words.length - n + 1)(i =>
        UTF8String.fromString(words.slice(i, i + n).mkString(" ")))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** 64-bit SimHash: bit i set iff Σ_tokens (±1 by bit i of xxhash64(token))
    * is positive. Token hash = `XXH64.hashUTF8String(token, 42)` — the exact
    * function behind Spark's `xxhash64` column (seed 42), so signatures are
    * interchangeable with any expression-built variant. */
  def simhash64UTF8(text: UTF8String): Long = {
    val words = text.toString.trim.split("[ \t\n\r]+")
    val votes = new Array[Int](64)
    var w = 0
    while (w < words.length) {
      val h = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUTF8String(UTF8String.fromString(words(w)), 42L)
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      w += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** md5-domain SimHash; see [[NativeFns.simhash64Md5]]. Tokens are the
    * non-empty whitespace-split runs of trim(text) (≡ DuckDB
    * `regexp_extract_all(trim(text), '[^ \t\n\r]+')`); a token's hash is
    * md5 bytes 8..15 big-endian (hex chars 17..32). No tokens → sig 0. */
  def simhashMd5UTF8(text: UTF8String): Long = {
    val words = text.toString.trim.split("[ \t\n\r]+")
    val md = md5Digest.get()
    val votes = new Array[Int](64)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      if (word.nonEmpty) {
        md.reset()
        val dg = md.digest(word.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var h = 0L
        var j = 8
        while (j < 16) { h = (h << 8) | (dg(j) & 0xffL); j += 1 }
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
      w += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) { if (votes(i) > 0) sig |= (1L << i); i += 1 }
    sig
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    hexOf(md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  // "0|" … "k-1|" prefixes, pre-encoded: the hot loop below digests
  // prefixBytes(s) ++ shingleBytes — byte-identical to md5("s|" + shingle)
  // without building and UTF-8-encoding k strings per shingle
  private val minhashPrefixes: Array[Array[Byte]] =
    Array.tabulate(64)(s => (s.toString + "|")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** k MinHashes in one pass; see [[NativeFns.minhashSig]]. Identical to
    * `min(md5("i|" ++ shingle))` over the shingle set: hex strings compare
    * lexicographically == md5 bytes compare unsigned. The shingle is
    * UTF-8-encoded ONCE and fed to the digest after the pre-encoded `"s|"`
    * prefix — the same bytes md5("s|" + shingle) hashes, at k× fewer string
    * builds and encodings (measured as part of the curated stream's
    * per-batch signature cost). */
  def minhashUTF8(text: UTF8String, n: Int, k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    require(k <= minhashPrefixes.length, s"k must be <= ${minhashPrefixes.length}")
    val words = text.toString.trim.split("[ \t\n\r]+").filter(_.nonEmpty)
    if (words.length < n) return null
    val md = md5Digest.get()
    val mins = new Array[String](k)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      val shingleBytes =
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var s = 0
      while (s < k) {
        md.reset()
        md.update(minhashPrefixes(s))
        md.update(shingleBytes)
        val hex = hexOf(md.digest())
        if (mins(s) == null || hex.compareTo(mins(s)) < 0) mins(s) = hex
        s += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      mins.map(m => UTF8String.fromString(m): Any))
  }

  private def hexOf(dg: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((dg(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(dg(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Low-64 truncation of each hex-md5 element; see [[NativeFns.sigLow64]]. */
  def sigLow64UTF8(sig: org.apache.spark.sql.catalyst.util.ArrayData): org.apache.spark.sql.catalyst.util.ArrayData = {
    val k = sig.numElements()
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val hex = sig.getUTF8String(i)
      var h = 0L
      var j = 16
      while (j < 32) { h = (h << 4) | Character.digit(hex.getByte(j).toChar, 16).toLong; j += 1 }
      out(i) = h
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Rabin-Karp rolling hash over whitespace tokens; term hash = first 4
    * md5 bytes (== first 8 hex chars) as unsigned int mod M, fold
    * acc·257 + t mod M (M = 1e9+7 keeps every product < 2^63). Empty /
    * whitespace-only text → 0 (no tokens), matching the oracle's
    * `regexp_extract_all` tokenization. */
  def rollingMd5UTF8(text: UTF8String): Long = {
    val M = 1000000007L
    val words = text.toString.trim.split("[ \t\n\r]+").filter(_.nonEmpty)
    val md = md5Digest.get()
    var acc = 0L
    var w = 0
    while (w < words.length) {
      md.reset()
      val dg = md.digest(words(w).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val t = (((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
        ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)) % M
      acc = (acc * 257L + t) % M
      w += 1
    }
    acc
  }
}
