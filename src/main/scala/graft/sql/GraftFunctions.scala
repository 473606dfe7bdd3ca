package graft.sql

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The catalog-exposed face of the table partitioner
  * ([[graft.lake.LakeTable.bucketOf]]): `graft.bucket(n, url)` =
  * `pmod(murmur3_hash(url), n)`, Spark's own `HashPartitioning`
  * arithmetic for a shuffle on `url`.
  *
  * Its real job is STORAGE-PARTITIONED JOINS: [[GraftLakeScan]] reports
  * `KeyGroupedPartitioning(bucket(nBuckets, url))`, and Spark resolves
  * that transform against this catalog function
  * (`V2ExpressionUtils.toCatalystTransformOpt` loads `bucket` from the
  * table's [[org.apache.spark.sql.connector.catalog.FunctionCatalog]]).
  * Two graft tables with the same bucket count then join on url with
  * ZERO Exchange on either side (`spark.sql.sources.v2.bucketing.enabled`),
  * and a `groupBy(url)` aggregation runs shuffle-free — at webtext scale
  * the join/aggregation shuffle IS the dominant cost this removes.
  * `canonicalName` is the cross-scan identity Spark compares
  * (`TransformExpression.isSameFunction`), so it must never change.
  */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, url) — pmod(murmur3_hash(url), n), the graft table partitioner"
  override def bind(inputType: StructType): BoundFunction = {
    // contract: bind declines with UnsupportedOperationException (Spark's
    // resolution paths catch it for a clean analysis error / graceful
    // fallback — an IllegalArgumentException would surface as an internal
    // error and crash probing callers)
    if (!(inputType.fields.length == 2 &&
        inputType.fields(0).dataType == IntegerType &&
        inputType.fields(1).dataType == StringType))
      throw new UnsupportedOperationException(
        s"graft.bucket expects (INT, STRING), got ${inputType.simpleString}")
    GraftBucketBound
  }
}

object GraftBucketBound extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, StringType)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = "graft.bucket(int,string)"
  override def isResultNullable: Boolean = false
  override def isDeterministic: Boolean = true

  /** Magic-method form (StaticInvoke, codegen'd) — used when Spark
    * evaluates the transform itself, e.g. a KeyGroupedShuffle on the
    * unbucketed side under `v2.bucketing.shuffle.enabled`. Delegates to
    * THE shared kernel ([[graft.lake.LakeTable.bucketIdOf]]) — the
    * bit-for-bit agreement SPJ depends on must have exactly one
    * implementation. */
  def invoke(n: Int, url: UTF8String): Int =
    graft.lake.LakeTable.bucketIdOf(url, n)

  override def produceResult(input: InternalRow): Integer =
    invoke(input.getInt(0), input.getUTF8String(1))
}
