package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.TextExtract

/** Native StaticInvoke expressions: identical output to the reference
  * (UDF/pure-Scala) forms, and actually codegen'd (no fallback nodes). */
class NativeFnsSpec extends SparkSpec {

  test("extractText expression == pure-Scala extractor, null-safe") {
    import spark.implicits._
    val htmls = (0 until 200).map(i =>
      graft.binlog.ChangeEventGen.html(s"https://d$i.example.org/x", i.toLong, 42L, 600))
    val df = htmls.zipWithIndex.map { case (h, i) => (i.toLong, h) }.toDF("id", "html")
      .union(Seq((999L, null.asInstanceOf[Array[Byte]])).toDF("id", "html"))
    val got = df.select(col("id"), NativeFns.extractText(col("html")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("t")).toMap
    htmls.zipWithIndex.foreach { case (h, i) =>
      assert(got(i.toLong) == TextExtract.extract(h))
    }
    assert(got(999L) == null)
  }

  test("shingles expression == straightforward tokenization, edge cases") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d"), (2L, "one two"), (3L, ""), (4L, "  padded   words  here  "),
      (5L, null.asInstanceOf[String]))
      .toDF("id", "text")
    val got = df.select(col("id"), NativeFns.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1)).map(_.toList)).toMap
    assert(got(1L).get == List("a b c", "b c d"))
    assert(got(2L).get == Nil)
    assert(got(3L).get == Nil)
    assert(got(4L).get == List("padded words here"))
    assert(got(5L).isEmpty) // null text → null
  }

  test("expressions run inside WholeStageCodegen (no fallback)") {
    val df = spark.range(100)
      .select(concat_ws(" ", col("id").cast("string"), lit("a b c")).as("text"))
      .select(NativeFns.shingles(col("text"), 2).as("sh"),
        NativeFns.extractText(to_binary(col("text"), lit("utf-8"))).as("t"))
    val plan = df.queryExecution.executedPlan.toString
    // `*(n)` prefix marks operators inside a WholeStageCodegen span
    assert(plan.contains("static_invoke"), plan)
    assert("""\*\(\d+\) Project \[static_invoke""".r.findFirstIn(plan).isDefined, plan)
    assert(df.count() == 100)
  }
}
