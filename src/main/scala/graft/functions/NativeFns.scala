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
}
