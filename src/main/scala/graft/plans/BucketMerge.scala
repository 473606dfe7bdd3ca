package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, GenericInternalRow, JoinedRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, HashPartitioning, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.StructType
import org.apache.spark.unsafe.types.UTF8String

/** Co-located COW merge: the round-1 engine's one hazard at steady state was
  * that every batch re-SHUFFLED the touched TABLE rows through the
  * union+`max_by` aggregation, even though table files are already
  * bucket-partitioned (bucket == Spark's `HashPartitioning(url, n)` id by
  * construction, [[graft.lake.LakeTable.bucketOf]]) and url-sorted.
  *
  * This is the custom-operator fix (LogicalPlan → Strategy → SparkPlan):
  *
  *  - [[BucketTableScanExec]] — a leaf that reads each bucket's parquet
  *    files in the task OWNING that bucket, and (truthfully) declares
  *    `outputPartitioning = HashPartitioning(url, nBuckets)`. Because the
  *    declaration matches the physical layout, EnsureRequirements inserts
  *    NO exchange above it.
  *  - [[BucketMergeExec]] — a binary node requiring both sides clustered by
  *    url into exactly nBuckets partitions. The table side satisfies it for
  *    free; only the BATCH side is shuffled (one Exchange in the whole
  *    plan, O(batch) bytes, independent of table size). Per bucket it
  *    builds a hash map of batch winners (O(batch/n) rows) and STREAMS the
  *    table rows against it — last-writer-wins by the `S3Offset` total
  *    order `(warc_ts, _seq_offset, _seq_part)`, ties kept on the table
  *    side (a tie is the same event replayed; keeping the stored row skips
  *    re-extraction and is byte-identical by determinism of the extractor).
  *
  * The reference's analog is its cursor→chunk-index dereference that
  * rewrites only affected chunks
  * (`/root/reference/sink/src/main/java/com/spredfast/kafka/connect/s3/S3Writer.java:47-109`).
  *
  * Scale: shuffle bytes per batch drop from O(touched table rows + batch)
  * to O(batch). Batch-side per-bucket state is bounded by the source's
  * admission control (`maxEventsPerBatch / nBuckets` rows).
  */
final case class BucketMergeLogical(
    batch: LogicalPlan, // aligned batch: table columns ++ `_xt = true`
    bucketFiles: Map[Int, Seq[(String, Long)]], // bucket -> (absolute path, bytes)
    nBuckets: Int,
    tableSchema: StructType) // physical schema of the table files (no _xt)
  extends UnaryNode {
  override def child: LogicalPlan = batch
  override def output: Seq[Attribute] = batch.output
  /** Every child column is load-bearing (the merge layout must equal the
    * table schema + _xt positionally) — declaring full references stops
    * ColumnPruning from dropping columns the plan ABOVE doesn't read
    * (it pruned a constant-null `content_len` through this node otherwise,
    * silently misaligning the two sides). */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(batch.output)
  override protected def withNewChildInternal(newChild: LogicalPlan): BucketMergeLogical =
    copy(batch = newChild)
}

object BucketMergeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case bm: BucketMergeLogical =>
      val scanOutput: Seq[Attribute] =
        org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes(bm.tableSchema)
      val scan = BucketTableScanExec(scanOutput, bm.bucketFiles, bm.nBuckets, bm.tableSchema)
      BucketMergeExec(scan, planLater(bm.batch), bm.nBuckets) :: Nil
    case _ => Nil
  }

  /** Idempotently register the strategy on a session. */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(BucketMergeStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ BucketMergeStrategy

  /** Build the merged-winners DataFrame over a batch already aligned to
    * (table columns ++ _xt). */
  def mergedRows(spark: SparkSession, batchAligned: DataFrame,
      bucketFiles: Map[Int, Seq[(String, Long)]], nBuckets: Int,
      tableSchema: StructType): DataFrame = {
    ensureRegistered(spark)
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      BucketMergeLogical(batchAligned.queryExecution.analyzed, bucketFiles, nBuckets, tableSchema))
  }
}

/** Reads the given parquet files with one task per BUCKET, emitting rows in
  * the physical schema. The partitioning declaration is the load-bearing
  * invariant: file bucket ids were assigned by `bucketOf(url) ==
  * HashPartitioning(url, n).partitionIdExpression`, so "partition i holds
  * exactly the rows whose url hashes to i" is TRUE and Catalyst may elide
  * the exchange. Uses Spark's own (vectorized) parquet reader. */
final case class BucketTableScanExec(
    output: Seq[Attribute],
    bucketFiles: Map[Int, Seq[(String, Long)]],
    nBuckets: Int,
    tableSchema: StructType)
  extends LeafExecNode {

  private def urlAttr: Attribute = output.find(_.name == "url").getOrElse(
    throw new IllegalStateException("bucket table scan needs a url column"))

  override def outputPartitioning: Partitioning =
    HashPartitioning(Seq(urlAttr), nBuckets)

  override protected def doExecute(): RDD[InternalRow] = {
    val spark = SparkSession.active
    // Spark's parquet reader closure: driver-built, broadcast-safe, handles
    // schema-by-name matching, predicate-free full reads of our own files.
    val readFile = new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
      .buildReaderWithPartitionValues(
        sparkSession = spark,
        dataSchema = tableSchema,
        partitionSchema = new StructType(),
        requiredSchema = tableSchema,
        filters = Nil,
        // rows, not ColumnarBatch: the merge consumes row iterators (the
        // vectorized reader still runs underneath, yielding its batch rows)
        options = Map(org.apache.spark.sql.execution.datasources.FileFormat.OPTION_RETURNING_BATCH -> "false"),
        hadoopConf = spark.sessionState.newHadoopConf())
    val filesByBucket: Array[Array[(String, Long)]] =
      Array.tabulate(nBuckets)(b => bucketFiles.getOrElse(b, Nil).toArray)
    new BucketFilesRDD(sparkContext, filesByBucket, readFile)
  }
}

/** nBuckets partitions; partition i reads bucket i's files. */
private final class BucketFilesRDD(
    sc: org.apache.spark.SparkContext,
    filesByBucket: Array[Array[(String, Long)]],
    readFile: org.apache.spark.sql.execution.datasources.PartitionedFile => Iterator[InternalRow])
  extends RDD[InternalRow](sc, Nil) {

  override protected def getPartitions: Array[org.apache.spark.Partition] =
    Array.tabulate(filesByBucket.length)(i => new org.apache.spark.Partition { def index: Int = i })

  override def compute(split: org.apache.spark.Partition,
      context: org.apache.spark.TaskContext): Iterator[InternalRow] =
    filesByBucket(split.index).iterator.flatMap { case (path, bytes) =>
      val pf = org.apache.spark.sql.execution.datasources.PartitionedFile(
        InternalRow.empty,
        org.apache.spark.paths.SparkPath.fromPathString(path),
        0L, bytes)
      // OPTION_RETURNING_BATCH=false → the reader yields rows, never batches
      readFile(pf)
    }
}

/** Per-bucket streaming LWW merge of (table rows, batch rows) — see file
  * doc. Output layout == batch child layout (table columns ++ _xt). */
final case class BucketMergeExec(tableScan: SparkPlan, batch: SparkPlan, nBuckets: Int)
  extends BinaryExecNode {

  override def left: SparkPlan = tableScan
  override def right: SparkPlan = batch
  override def output: Seq[Attribute] = batch.output

  private def urlOf(p: SparkPlan): Attribute = p.output.find(_.name == "url").get

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(urlOf(tableScan)), requireAllClusterKeys = false,
      requiredNumPartitions = Some(nBuckets)),
    ClusteredDistribution(Seq(urlOf(batch)), requireAllClusterKeys = false,
      requiredNumPartitions = Some(nBuckets)))

  override def outputPartitioning: Partitioning =
    HashPartitioning(Seq(urlOf(batch)), nBuckets)

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): BucketMergeExec =
    copy(tableScan = newLeft, batch = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val layout = output // url, ..., warc_ts, ..., _seq_part, _seq_offset, _deleted, _xt
    def idx(n: String): Int = layout.indexWhere(_.name == n)
    val urlIdx = idx("url")
    val tsIdx = idx("warc_ts")
    val offIdx = idx("_seq_offset")
    val partIdx = idx("_seq_part")
    // positional-layout invariant: batch == table columns ++ _xt. A mismatch
    // here would silently read misaligned columns — fail fast instead.
    val tShape = tableScan.output.map(a => (a.name, a.dataType))
    val bShape = batch.output.dropRight(1).map(a => (a.name, a.dataType))
    require(tShape == bShape,
      s"bucket merge layout mismatch: table=$tShape batch=$bShape")
    val lRdd = tableScan.execute()
    val rRdd = batch.execute()
    require(lRdd.getNumPartitions == nBuckets && rRdd.getNumPartitions == nBuckets,
      s"bucket merge needs $nBuckets==${lRdd.getNumPartitions}(table)==${rRdd.getNumPartitions}(batch)")

    lRdd.zipPartitions(rRdd) { (tableIt, batchIt) =>
      // seq(a) > seq(b) by (warc_ts, offset, partition) — S3Offset order
      def wins(a: InternalRow, b: InternalRow): Boolean = {
        val ta = a.getLong(tsIdx); val tb = b.getLong(tsIdx)
        if (ta != tb) return ta > tb
        val oa = a.getLong(offIdx); val ob = b.getLong(offIdx)
        if (oa != ob) return oa > ob
        a.getInt(partIdx) > b.getInt(partIdx)
      }
      // 1. batch winners in a hash map (rows copied — iterators reuse
      //    buffers). Memory bound: distinct batch urls in this bucket —
      //    ≤ maxEventsPerBatch/nBuckets by the source's admission control.
      //    Enforce it explicitly so a misconfigured pipeline fails with a
      //    remediation instead of an executor OOM.
      val limit = java.lang.Long.getLong("graft.merge.maxBatchRowsPerBucket", 8000000L)
      val winners = new java.util.HashMap[UTF8String, InternalRow]()
      while (batchIt.hasNext) {
        val r = batchIt.next()
        val u = r.getUTF8String(urlIdx)
        val prev = winners.get(u)
        if (prev == null) {
          if (winners.size() >= limit) throw new IllegalStateException(
            s"co-located merge: > $limit distinct batch urls in one bucket — " +
              "raise nBuckets (Maintain.rebucket), lower maxEventsPerBatch, " +
              "or raise -Dgraft.merge.maxBatchRowsPerBucket")
          winners.put(u.clone(), r.copy())
        } else if (wins(r, prev)) winners.put(u.clone(), r.copy())
      }
      // 2. stream table rows against the map; ties keep the table row.
      //    Emitted rows follow the standard iterator contract (valid until
      //    the next next() call): pass-through table rows are JoinedRow
      //    VIEWS (no copy — the downstream operator materializes what it
      //    keeps), batch winners are the copies made in step 1.
      val falseRow = new GenericInternalRow(Array[Any](false))
      val joined = new JoinedRow
      val mergedTable = tableIt.map { tr =>
        val u = tr.getUTF8String(urlIdx)
        val w = winners.get(u)
        if (w == null) joined(tr, falseRow)
        else {
          winners.remove(u)
          if (wins(w, tr)) w else joined(tr, falseRow)
        }
      }
      // 3. batch-only urls (inserts) — evaluated AFTER the table pass
      val inserts = new Iterator[InternalRow] {
        private var it: java.util.Iterator[InternalRow] = _
        private def delegate = {
          if (it == null) it = winners.values.iterator
          it
        }
        def hasNext: Boolean = delegate.hasNext
        def next(): InternalRow = delegate.next()
      }
      mergedTable ++ inserts
    }
  }
}
