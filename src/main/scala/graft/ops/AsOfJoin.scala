package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the LATEST right row with
  * `right.ts <= left.ts` per key (the time-series/point-in-time join the
  * reference lacks; brief §custom-operators example).
  *
  * Implemented by COMPOSITION (preference (a) of the brief), in the
  * scalable union+window form: tag both sides, sort per key by
  * `(ts, side)` with right-before-left on ties (inclusive semantics), and
  * carry the last right payload forward with
  * `last(..., ignoreNulls).over(rows unbounded preceding)`.
  *
  * Scale: NO join fan-out — one shuffle on the key, one sort, O(n) state;
  * the naive `left join right ON key AND rts <= lts` + max_by alternative
  * explodes by per-key right cardinality. Hot keys shuffle to one task, as
  * any keyed sort must; salting applies if a single key exceeds a task.
  */
object AsOfJoin {

  /** `left` as-of-joins `right` on `key`; right columns (except key/ts)
    * come back nullable under `rightPrefix`. */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightPrefix: String = "right_"): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(c => c == key || c == ts).toSeq
    val leftCols = left.columns.toSeq
    val rTagged = right.select(
      col(key), col(ts),
      lit(0).as("_side"),
      struct((col(ts).as(ts) +: rightPayloadCols.map(col)): _*).as("_rpay")) // incl right ts
    val lTagged = left.select(
      (Seq(col(key), col(ts), lit(1).as("_side"),
        lit(null).cast(rTagged.schema("_rpay").dataType).as("_rpay")) ++
        leftCols.filterNot(c => c == key || c == ts).map(col)): _*)
    val unioned = rTagged
      .select((Seq(col(key), col(ts), col("_side"), col("_rpay")) ++
        leftCols.filterNot(c => c == key || c == ts)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
      .unionByName(lTagged)
    // right (side 0) sorts before left (side 1) at equal ts → inclusive <=
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_last_r", last(col("_rpay"), ignoreNulls = true).over(w))
    val outRight = (ts +: rightPayloadCols).map(c =>
      col(s"_last_r.$c").as(s"$rightPrefix$c"))
    carried.filter(col("_side") === 1)
      .select((leftCols.map(col) ++ outRight): _*)
  }
}
