package graft.cdc

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.lake._
import graft.functions.NativeFns

/** MERGE INTO for the url-keyed LakeTable, ONE batch-sized shuffle per
  * batch.
  *
  * The reference has no joins; its analog of this operator is the
  * cursor→index→data dereference plus idempotent overwrite-on-replay
  * (`/root/reference/sink/src/main/java/com/spredfast/kafka/connect/s3/S3Writer.java:47-109`,
  * proven idempotent by the rewind IT,
  * `sink/src/test/.../S3SinkConnectorIT.java:474-612`). Last-writer-wins
  * MERGE resolves by url under the `S3Offset`-style total order
  * `(warc_ts, offset, partition)` (`S3Offset.java:46-49`):
  *
  *  1. prune — only target files whose `bucket` (and url bounds, from
  *     parquet footers, unsigned-UTF-8 compared) intersect the batch are
  *     rewritten; everything else is carried forward untouched (manifest
  *     skip-scan ≙ chunk-index skip-scan);
  *  2. resolve winners CO-LOCATED ([[graft.plans.BucketMergeExec]],
  *     default): the table side is read IN PLACE — its files are already
  *     bucket-partitioned with `bucketOf(url) == Spark's partitionId(url)`
  *     by construction ([[LakeTable.bucketOf]]), which the custom scan
  *     truthfully declares, so only the BATCH is shuffled (O(batch) bytes
  *     regardless of table size) and each task streams its bucket's stored
  *     rows (k-way LWW-folded when the bucket holds several files, e.g.
  *     MOR delta history) against the url-sorted batch winners in an O(1)-
  *     state sorted merge. Fallback (mixed schema
  *     versions among touched files, or `useColocatedCow=false`): union
  *     target+batch, `repartition(nBuckets, url)` + `max_by` — the round-1
  *     single-shuffle formulation, shuffling touched table rows too;
  *  3. a winning delete is persisted as a TOMBSTONE (`_deleted = true`):
  *     the final state must be independent of how the log is split into
  *     batches, and only a durable tombstone beats a late upsert replayed
  *     after it (SURVEY.md §2.9 T7);
  *  4. text extraction runs POST-aggregation, only on batch-side winners
  *     (target winners carry their stored text) — the extractor cost is
  *     O(surviving rows), never O(events);
  *  5. write per-bucket sorted by url (deterministic replay), manifest
  *     stats from parquet footers, commit with the `(batchId, lineage)`
  *     marker.
  *
  * Scale: shuffle bounded by batch rows (co-located path); `nBuckets`
  * sizes rewrite granularity, write parallelism AND per-task merge state
  * (grow via [[graft.lake.Maintain.rebucket]]); hot-url duplicates
  * collapse in the per-bucket winners map (the Zipf-head defense).
  */
/** Merge strategy: copy-on-write (rewrite touched buckets each batch — reads
  * amplify writes, zero read overhead) vs merge-on-read (append per-bucket
  * delta files of batch winners — O(batch) writes regardless of table size,
  * LWW resolved at read, bounded by incremental compaction). MOR is the
  * 10^10-scale path: COW's per-batch cost grows with the table, MOR's does
  * not (≙ Iceberg v1 overwrite vs v2 row-level deltas). */
sealed trait MergeMode
case object Cow extends MergeMode
case object Mor extends MergeMode

/** Per-call merge strategy knobs. The defaults snapshot the process-global
  * escape hatches ([[Merge.useColocatedCow]], [[Merge.lateMaterialize]]) AT
  * CALL TIME, so existing callers and the A/B apps that flip the globals
  * keep working — while callers running CONCURRENT merges in one JVM (or
  * wanting a mode for exactly one pipeline) pass their own options instead
  * of racing on the globals. */
final case class MergeOptions(
    colocatedCow: Boolean = Merge.useColocatedCow,
    lateMaterialize: Boolean = Merge.lateMaterialize,
    audit: Option[MergeAudit] = None)

/** Per-call audit sink for merge internals: written only by the merge that
  * received it, so CONCURRENT pipelines in one JVM each read their own
  * values — the process-global [[Merge.lastAdmitBitmapBytes]] mirror races
  * in exactly that scenario and stays only as a single-pipeline convenience. */
final class MergeAudit {
  /** Bytes of the late-mat admission bitmap this merge broadcast
    * (−1 = key-set fallback; 0 = late materialization never ran). */
  @volatile var admitBitmapBytes: Long = 0L
}

object Merge {

  /** Debug hook: print the next merge's physical plan (used by PlanCheck). */
  @volatile var explainNext: Boolean = false

  /** The last explained plan, for spec assertions on plan shape. */
  @volatile var lastPlan: String = ""

  private[cdc] def explain(df: DataFrame): Unit = {
    lastPlan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    println(lastPlan)
  }

  /** MOR: fold a bucket's DELTA tier once it accumulates this many delta
    * files. With tiering the worst-case resolve width is ~(1 base +
    * MidFilesPerBucket mids + MaxFilesPerBucket+1 deltas) ≈ 14 files, not
    * MaxFilesPerBucket — tiering trades bounded extra read fan-out for a
    * 1/MidFilesPerBucket-rarer base rewrite (A/B in BENCH_LOCAL.md). The
    * delta-count default comes from the read-latency sweep in
    * BENCH_LOCAL.md (resolve cost vs file count); lower it (and/or
    * MidFilesPerBucket) for read-heavy deployments. */
  @volatile var MaxFilesPerBucket = 8

  /** Escape hatch for A/B: when false, COW uses the round-1 union+max_by
    * shuffle formulation instead of the co-located [[graft.plans.BucketMergeExec]].
    * Process-wide DEFAULT only — each merge snapshots it into its
    * [[MergeOptions]] at call time; pass opts explicitly to pin a mode per
    * pipeline. */
  @volatile var useColocatedCow: Boolean = true

  /** LATE MATERIALIZATION for the dedup shuffle (network-cluster mode,
    * default off): resolve LWW winners over the batch's META projection
    * (html elided — at web scale the payload dominates event bytes and a
    * url's losing duplicates never need theirs), then fetch ONLY the winning
    * payloads with a second pass over the same batch plan, admitted by a
    * broadcast semi-join on the winners' exact (partition, offset) envelope,
    * and shuffled once to the same url-hash partitioning (co-partitioned
    * sort-merge attach — no extra Exchange). Total shuffle becomes
    * `meta(all) + payload(winners)` instead of `payload(all)`: the win grows
    * with the duplicate factor and the payload size (hot-key CDC over
    * Common-Crawl-size html), at the cost of re-reading the batch's binlog
    * range (sequential, partition-aligned — object-store bandwidth, not
    * network shuffle). Off by default because local[32] shuffles through
    * tmpfs at memory speed, where re-decode ≈ the bytes saved (A/B:
    * `graft.app.LateMatAB`, BENCH_LOCAL.md); on a real cluster shuffle
    * crosses the network and the trade is decisive. Winner admission is a
    * dense OFFSET BITMAP over the batch's planned lineage runs — events/8
    * bytes regardless of winner count (12.5 MB at a 10⁸-event mega-batch,
    * where an exact key set would be ~1.6 GB); callers without lineage
    * fall back to an exact (partition, offset) key-set broadcast bounded
    * by admission control (maxEventsPerBatch × 16 B keys). Enable via
    * `-Dgraft.merge.lateMaterialize=true`, this var (process-wide default,
    * snapshotted per call), or per pipeline via [[MergeOptions]]. */
  @volatile var lateMaterialize: Boolean =
    sys.props.get("graft.merge.lateMaterialize").contains("true")

  /** Bytes of the last late-mat admission bitmap (−1 = last merge used the
    * key-set broadcast fallback) — a process-global convenience MIRROR for
    * single-pipeline plan audits (LateMatPlan, LateMatAB). Concurrent
    * pipelines must read their own [[MergeAudit]] via
    * [[MergeOptions.audit]] instead: this mirror is written by every
    * late-mat merge in the JVM. */
  @volatile var lastAdmitBitmapBytes: Long = -1L

  private def recordAdmitBytes(audit: Option[MergeAudit], bytes: Long): Unit = {
    audit.foreach(_.admitBitmapBytes = bytes)
    lastAdmitBitmapBytes = bytes
  }

  /** Resolve winners late-materialized (see [[lateMaterialize]]).
    *
    * Winner-payload ADMISSION has two forms:
    *  - `lineage` present (the binlog ingest path): a dense PER-RUN OFFSET
    *    BITMAP over the batch's planned offset runs — winner offsets are
    *    positions inside those runs, so the whole admission state is
    *    `events/8` BYTES regardless of winner count (a 10⁸-event mega-batch
    *    broadcasts 12.5 MB where the exact-key set would be ~1.6 GB). Phase
    *    A runs ONCE (localCheckpoint, which preserves the url-hash
    *    partitioning declaration) and feeds both the bitmap build and the
    *    attach join.
    *  - `lineage` empty (ad-hoc callers, SQL merges): broadcast semi-join on
    *    the winners' exact (partition, offset) keys — bounded by batch
    *    admission control (maxEventsPerBatch × 16 B). */
  private def lateResolved(batch: DataFrame, srcAligned: DataFrame,
      nBuckets: Int, dataCols: Seq[String], lineage: Seq[PartLineage],
      audit: Option[MergeAudit]): DataFrame = {
    if (lineage.nonEmpty)
      return lateResolvedBitmap(batch, srcAligned, nBuckets, dataCols, lineage, audit)
    recordAdmitBytes(audit, -1L)
    val metaCols = dataCols.filterNot(_ == "html")
    // phase A: winners over the meta projection — projection collapse drops
    // html BEFORE the exchange, so the dedup shuffle never carries payloads.
    // NOT persisted: the two consumers below are the SAME subtree, so the
    // meta exchange is written once and reused (ReusedExchange); a persist
    // would wrap the plan in an InMemoryRelation whose AQE-finalized
    // partitioning is opaque to the outer planner, forcing the attach join
    // to re-shuffle BOTH sides (measured: worse than the full-payload path).
    val wMeta = graft.lake.Resolve.lww(
      srcAligned.drop("html").repartition(nBuckets, col("url")), metaCols)
    // phase B: second pass over the SAME batch plan; only rows whose exact
    // (partition, offset) won phase A survive the broadcast semi-join, so
    // the payload shuffle is O(winners). Tombstone winners fetch nothing.
    val keys = wMeta.where(!col("_deleted"))
      .select(col("_seq_part").as("partition"), col("_seq_offset").as("offset"))
    // the per-url aggregate AFTER the repartition collapses exact-duplicate
    // redeliveries of the winning envelope (at-least-once delivery may carry
    // the same (partition, offset) row twice; the semi-join admits every
    // copy) — without it the url-only attach join would fan out and emit
    // duplicate winner rows. The required clustering is already satisfied by
    // the repartition, so the aggregate adds NO new Exchange and the output
    // keeps HashPartitioning(_pl_url, nBuckets) for the co-partitioned attach.
    val payload = batch
      .join(broadcast(keys), Seq("partition", "offset"), "left_semi")
      .select(col("url").as("_pl_url"), col("html").as("_pl_html"))
      .repartition(nBuckets, col("_pl_url"))
      .groupBy(col("_pl_url"))
      .agg(max(col("_pl_html")).as("_pl_html"))
    // attach on url ALONE — exact by construction: wMeta is grouped by url,
    // and the payload aggregate above leaves one row per winner url (the
    // semi-join admits one envelope per url, possibly redelivered copies of
    // it), so both sides are url-unique. Joining on the envelope too
    // would be redundant AND ruinous: EnsureRequirements then clusters both
    // sides on (url, part, offset), discarding the existing url partitioning
    // and re-shuffling the payload (measured: worse than the full path).
    // With url-only keys both sides are already HashPartitioning(url,
    // nBuckets) — a co-partitioned sort-merge attach, zero new Exchange.
    attachPayload(wMeta, payload, dataCols)
  }

  /** Co-partitioned url-only attach of winner payloads to meta winners —
    * both sides are url-unique and HashPartitioning(url, nBuckets), so this
    * is a zero-Exchange sort-merge join (see the key-joining trap note in
    * [[lateResolved]]). */
  private def attachPayload(wMeta: DataFrame, payload: DataFrame,
      dataCols: Seq[String]): DataFrame =
    wMeta.join(payload, wMeta("url") === col("_pl_url"), "left")
      .select((dataCols ++ graft.lake.TableSchemas.internalNames).map {
        case "html" => col("_pl_html").as("html")
        case c => wMeta(c)
      }: _*)

  /** Bitmap-admitted late materialization (see [[lateResolved]]): the
    * batch's planned lineage runs define a dense global coordinate space
    * (run i covers positions [baseᵢ, baseᵢ+countᵢ)); non-deleted winners set
    * their envelope's bit; phase B admits a payload row iff its bit is set.
    * Admission state = events/8 bytes, independent of the winner count. A
    * winner outside every run fails LOUDLY — lineage claims exactly the
    * batch's offset coverage, and silently dropping a winner's payload
    * would corrupt the table. */
  private def lateResolvedBitmap(batch: DataFrame, srcAligned: DataFrame,
      nBuckets: Int, dataCols: Seq[String], lineage: Seq[PartLineage],
      audit: Option[MergeAudit]): DataFrame = {
    val spark = batch.sparkSession
    val metaCols = dataCols.filterNot(_ == "html")
    val runs = lineage.sortBy(l => (l.partition, l.startOffset))
    val bases = runs.scanLeft(0L)((acc, r) => acc + r.count)
    val totalBits = bases.last
    // part -> sorted (start, end, base); runs per partition are few (one per
    // planned contiguous range), so executor-side lookup is a linear scan
    val runTable: Map[Int, Array[(Long, Long, Long)]] =
      runs.zip(bases).groupBy(_._1.partition).map { case (p, rs) =>
        p -> rs.map { case (r, b) => (r.startOffset, r.startOffset + r.count, b) }
          .sortBy(_._1).toArray
      }
    val runB = spark.sparkContext.broadcast(runTable)
    def posOf(part: Int, off: Long): Long = {
      val rs = runB.value.getOrElse(part, Array.empty[(Long, Long, Long)])
      var i = 0
      while (i < rs.length) {
        val (s, e, b) = rs(i)
        if (off >= s && off < e) return b + (off - s)
        i += 1
      }
      -1L
    }
    // phase A exactly once: the checkpoint truncates lineage (the bitmap job
    // and the attach join reuse the materialized winners instead of
    // re-running the meta dedup) and DECLARES the HashPartitioning(url,
    // nBuckets) the repartition guarantees — plain localCheckpoint loses it
    // under AQE and the attach join would re-shuffle the winners.
    val wMeta = org.apache.spark.sql.GraftBridge.localCheckpointHashPartitioned(
      graft.lake.Resolve.lww(
        srcAligned.drop("html").repartition(nBuckets, col("url")), metaCols),
      Seq("url"), nBuckets)
    val posU = udf((p: Int, o: Long) => {
      val pos = posOf(p, o)
      if (pos < 0) throw new IllegalStateException(
        s"late-mat admission: winner envelope ($p, $o) outside the batch's planned lineage runs")
      pos
    })
    // EXECUTOR-SIDE bitmap aggregation: each task folds its winners into a
    // lazily-allocated word array, treeAggregate ORs the partials — the
    // driver receives O(log parts) pre-ORed arrays of events/8 bytes each,
    // never per-winner rows (a 10⁸-event mega-batch would otherwise collect
    // ~1.6M (word, bits) Rows of driver overhead). The zero value is EMPTY
    // so the task closure ships bytes, not the full array; partials allocate
    // on first bit.
    val nWords = ((totalBits + 63) / 64).toInt
    def alloc(a: Array[Long]): Array[Long] = if (a.length == nWords) a else new Array[Long](nWords)
    val bitmap = wMeta.where(!col("_deleted"))
      .select(posU(col("_seq_part"), col("_seq_offset")).as("pos"))
      .select(col("pos")).rdd.map(_.getLong(0))
      .treeAggregate(Array.emptyLongArray)(
        (acc, pos) => { val a = alloc(acc); a((pos >> 6).toInt) |= 1L << (pos & 63L).toInt; a },
        (x, y) =>
          if (x.isEmpty) y
          else if (y.isEmpty) x
          else { var i = 0; while (i < nWords) { x(i) |= y(i); i += 1 }; x })
    val bitmapFull = alloc(bitmap) // all-empty batch (every winner deleted)
    recordAdmitBytes(audit, bitmapFull.length * 8L)
    val bmB = spark.sparkContext.broadcast(bitmapFull)
    val admit = udf((p: Int, o: Long) => {
      val pos = posOf(p, o)
      pos >= 0 && (bmB.value((pos >> 6).toInt) & (1L << (pos & 63L).toInt)) != 0L
    })
    // phase B: re-read the batch, keep exactly the marked winner envelopes
    // (duplicate redeliveries of a winner are all admitted and collapsed by
    // the per-url aggregate, as in the fallback path)
    val payload = batch
      .where(admit(col("partition"), col("offset")))
      .select(col("url").as("_pl_url"), col("html").as("_pl_html"))
      .repartition(nBuckets, col("_pl_url"))
      .groupBy(col("_pl_url"))
      .agg(max(col("_pl_html")).as("_pl_html"))
    attachPayload(wMeta, payload, dataCols)
  }

  /** Apply one RAW batch of change events (columns: partition, offset, op,
    * url, warc_ts, html, lang — duplicates allowed). Returns the committed
    * snapshot. */
  def apply(spark: SparkSession, table: LakeTable, batch: DataFrame,
      batchId: Long, lineage: Seq[PartLineage], mode: MergeMode = Cow,
      opts: MergeOptions = MergeOptions()): Snapshot =
    mode match {
      case Cow => applyCow(spark, table, batch, batchId, lineage, opts)
      case Mor => applyMor(spark, table, batch, batchId, lineage, opts)
    }

  /** `INSERT OVERWRITE`: resolve the batch's LWW winners against an EMPTY
    * base and commit them as the table's ENTIRE new state — ONE atomic
    * commit replacing files AND batch markers (the truncate/rollback
    * principle: state and exactly-once bookkeeping move together; the
    * overwrite's own marker is the only one left). Incremental consumers
    * (feed/mirror/curation) see a loud history-rewrite at this snapshot
    * ([[graft.lake.LakeTable.incrementFilesBySnapshot]]'s marker-prefix
    * guard — count alone would let a 1-marker overwrite masquerade as
    * maintenance) and must re-seed. Always COW: an overwrite IS a full
    * rewrite, so merge-on-read deltas have nothing to defer. */
  def overwrite(spark: SparkSession, table: LakeTable, batch: DataFrame,
      batchId: Long): Snapshot = {
    val committed = applyCow(spark, table, batch, batchId, lineage = Nil,
      MergeOptions(), emptyBase = true)
    // an EMPTY batch falls through applyCow's stats-empty no-op — but the
    // overwrite contract is "the batch IS the new state", so empty means
    // TRUNCATE (one metadata commit clearing files and markers), never a
    // silent keep-everything. Detected by the unchanged head rather than a
    // pre-count so the non-empty path stays single-pass.
    if (committed.committedBatchIds.contains(batchId)) committed
    else table.truncate()
  }

  /** MERGE-ON-READ apply: dedup the batch to per-url winners (same single
    * bucket-aligned shuffle as COW, but the union side is EMPTY — the table
    * is never read), append the winners as per-bucket DELTA files, then
    * incrementally compact any bucket that exceeded MaxFilesPerBucket.
    * Per-batch cost is O(batch), independent of table size.
    *
    * If a CONCURRENT [[graft.lake.Maintain.rebucketLive]] swaps the bucket
    * layout between this batch's shuffle and its commit, the layout-guarded
    * append throws and the whole batch is recomputed under the new layout
    * (rare — once per table growth step; the batch plan is re-executable and
    * the marker was never committed, so the retry is exactly-once-safe). */
  private def applyMor(spark: SparkSession, table: LakeTable, batch: DataFrame,
      batchId: Long, lineage: Seq[PartLineage], opts: MergeOptions): Snapshot =
    try applyMorOnce(spark, table, batch, batchId, lineage, opts)
    catch {
      case e: graft.lake.BucketLayoutChanged =>
        System.err.println(s"[merge] batch $batchId: ${e.getMessage}; retrying")
        applyMorOnce(spark, table, batch, batchId, lineage, opts)
    }

  private def applyMorOnce(spark: SparkSession, table: LakeTable, batch: DataFrame,
      batchId: Long, lineage: Seq[PartLineage], opts: MergeOptions): Snapshot = {
    val snap = table.currentSnapshot
    if (snap.committedBatchIds.contains(batchId)) return snap
    val timing = sys.env.contains("GRAFT_TIMING")
    var tMark = System.nanoTime()
    def mark(what: String): Unit = if (timing) {
      val now = System.nanoTime()
      System.err.println(f"[timing]   mor/$what ${(now - tMark) / 1e9}%.2f s")
      tMark = now
    }

    val nBuckets = snap.nBuckets
    val logical = TableSchemas.forVersion(snap.schemaVersion)
    val typeOf = logical.fields.map(f => f.name -> f.dataType).toMap
    val dataCols = logical.fieldNames.toSeq.filterNot(TableSchemas.internalNames.contains)

    val srcAligned = batch
      .withColumn("text", lit(null).cast("string"))
      .withColumn("content_len", lit(null).cast(typeOf("content_len")))
      .withColumn("_seq_part", col("partition"))
      .withColumn("_seq_offset", col("offset"))
      .withColumn("_deleted", col("op") === "delete")
      .select((dataCols ++ TableSchemas.internalNames).map(c => col(c).cast(typeOf(c)).as(c)): _*)

    val winners =
      if (opts.lateMaterialize && batch.columns.contains("offset") && batch.columns.contains("partition"))
        lateResolved(batch, srcAligned, nBuckets, dataCols, lineage, opts.audit)
      else
        graft.lake.Resolve.lww(srcAligned.repartition(nBuckets, col("url")), dataCols)
    val obs = org.apache.spark.sql.Observation()
    val merged = winners
      .withColumn("text", when(!col("_deleted"), NativeFns.extractText(col("html"))).otherwise(lit(null)))
      .withColumn("content_len",
        when(col("html").isNull, lit(null)).otherwise(length(col("html"))).cast(typeOf("content_len")))
      .withColumn("bucket", LakeTable.bucketOf(col("url"), nBuckets))
      .sortWithinPartitions(col("url"))
      .observe(obs, count(lit(1)).as("n"),
        sum(when(col("_deleted"), 1L).otherwise(0L)).as("dels"))

    if (explainNext) { explainNext = false; explain(merged) }
    mark("plan")
    val nextId = snap.snapshotId + 1
    val newFiles = table.writeDataFiles(merged, nextId, snap.schemaVersion)
    mark("write-job")
    val row = obs.get
    val dels = row("dels").asInstanceOf[Long]
    val n = row("n").asInstanceOf[Long]
    // ADD-ONLY commit with rebase: a concurrent maintenance commit (blooms
    // excepted — no commit — but compaction commits) between our read and
    // here just moves the head; the delta applies identically on top.
    // Marker counts are post-dedup winners in MOR (raw counts would need an
    // extra pass; lineage carries the raw coverage).
    val next = table.commitAppend(newFiles.map(_.copy(tier = DataFile.TierDelta)),
      Some(BatchMarker(batchId, lineage, n - dels, dels)),
      expectedBuckets = Some(nBuckets))
    mark("commit")

    // TIERED incremental compaction (LSM-style size tiering): when a
    // bucket's DELTA count crosses MaxFilesPerBucket, fold just the deltas
    // into one MID file — cost O(deltas), no base rewrite; only when
    // MidFilesPerBucket mids have accumulated does the FULL fold rewrite
    // the base — so the expensive base rewrite runs 1/MidFilesPerBucket as
    // often (write amplification O(base/(8·Mids)) per batch instead of
    // O(base/8)). A legacy/untier-stamped bucket falls back to the full
    // fold once its total file count crosses the combined bound. One
    // batched pass per kind is cheaper than spreading (measured: capping
    // traded the spike for +20% sustained wall via per-call overhead);
    // `-Dgraft.compact.maxBucketsPerBatch` bounds p99 when needed.
    val byBucket = next.files.groupBy(_.bucket)
    def deltaDue(fs: Seq[DataFile]): Boolean = {
      val ds = fs.filter(_.tier == DataFile.TierDelta)
      ds.size > MaxFilesPerBucket ||
        (MaxDeltaBytesPerBucket > 0 && ds.map(_.bytes).sum > MaxDeltaBytesPerBucket)
    }
    def midsFull(fs: Seq[DataFile]): Boolean = {
      val ms = fs.filter(_.tier == DataFile.TierMid)
      ms.size >= MidFilesPerBucket ||
        (MaxMidBytesPerBucket > 0 && ms.map(_.bytes).sum > MaxMidBytesPerBucket)
    }
    val fullFold = byBucket.filter { case (_, fs) =>
      // legacy (pre-tier) manifests parse every file as tier 0, so >1 base
      // file identifies them precisely — a TIERED bucket whose deltas piled
      // up while deferred by the batch cap must NOT escalate to the full
      // fold (only the cheap delta fold is due until its mids fill up)
      (deltaDue(fs) && midsFull(fs)) || fs.count(_.tier == DataFile.TierBase) > 1
    }.keySet
    val deltaFold = byBucket.filter { case (b, fs) =>
      !fullFold(b) && deltaDue(fs)
    }.keySet
    // ONE cap across both kinds: the knob bounds total compaction work in a
    // batch, so the delta folds only get the budget the full folds left
    val cap = sys.props.get("graft.compact.maxBucketsPerBatch").map(_.toInt)
      .getOrElse(Int.MaxValue)
    def capped(s: Set[Int], n: Int): Set[Int] =
      if (n >= s.size) s else s.toSeq.sortBy(b => -byBucket(b).size).take(n).toSet
    val fullSel = capped(fullFold, cap)
    val deltaSel = capped(deltaFold, cap - fullSel.size)
    val afterFull = if (fullSel.nonEmpty) compactBuckets(spark, table, fullSel) else next
    if (deltaSel.nonEmpty) compactDeltaTier(spark, table, deltaSel) else afterFull
  }

  /** Mid files per bucket before the full fold runs (the tiering fan-out). */
  @volatile var MidFilesPerBucket = 4

  /** SIZE-based fold triggers, complementing the count triggers: a SKEWED
    * hot bucket can accumulate few-but-huge delta files (count trigger
    * never fires while read cost balloons), so the delta fold also fires
    * once a bucket's delta BYTES cross this; the full fold likewise fires
    * once its mid bytes cross `MaxMidBytesPerBucket` even below the mid
    * count quota. Defaults are sized to stay inert at test scale and to
    * bound a bucket's unfolded tail at cluster scale; `0` disables. */
  @volatile var MaxDeltaBytesPerBucket: Long = 512L * 1024 * 1024
  @volatile var MaxMidBytesPerBucket: Long = 2048L * 1024 * 1024

  /** Fold ONLY the delta-tier files of the given buckets into one MID file
    * per bucket (tombstones retained, envelopes kept — LWW-sound next to
    * the untouched base). Deltas are small (≤ MaxFilesPerBucket batches'
    * winners), so a plain shuffle fold is proportionate; the co-located
    * machinery stays reserved for the base-rewriting full fold. */
  def compactDeltaTier(spark: SparkSession, table: LakeTable, buckets: Set[Int]): Snapshot = {
    // pin: a concurrent aggressive expiry must not GC our inputs mid-fold
    val (snap, pinLease) = table.pinCurrent()
    try {
      val nBuckets = snap.nBuckets
      val sel = snap.files.filter(f => buckets.contains(f.bucket) && f.tier == DataFile.TierDelta)
      if (sel.isEmpty) return snap
      val dataCols = TableSchemas.forVersion(snap.schemaVersion)
        .fieldNames.toSeq.filterNot(TableSchemas.internalNames.contains)
      val resolved = graft.lake.Resolve.lww(
          table.readFiles(spark, snap, sel).repartition(nBuckets, col("url")), dataCols)
        .withColumn("bucket", LakeTable.bucketOf(col("url"), nBuckets))
        .sortWithinPartitions(col("url"))
      replaceResolved(spark, table, snap, sel, resolved, "d", DataFile.TierMid)
    } finally pinLease.release()
  }

  /** Shared tail of the fold paths: write the resolved rows to a unique
    * replacement dir, replacement-rebase commit (safe next to concurrent
    * ingest — see [[graft.lake.LakeTable.commitReplace]]), and inherit
    * point-lookup bloom sidecars when any replaced file carried one (so
    * lookups stay pruned without waiting for the maintenance pass). */
  private def replaceResolved(spark: SparkSession, table: LakeTable, snap: Snapshot,
      sel: Seq[DataFile], resolved: DataFrame, dirTag: String, outTier: Int): Snapshot = {
    val outDir = s"s${snap.snapshotId + 1}$dirTag${java.util.UUID.randomUUID().toString.take(8)}"
    val newFiles = table.writeDataFilesTo(resolved, outDir, snap.schemaVersion)
      .map(_.copy(tier = outTier))
    val next = table.commitReplace(sel, newFiles)
    if (sel.exists(f => java.nio.file.Files.exists(Bloom.sidecar(table.root.resolve(f.path)))))
      Bloom.inherit(spark, table, next, newFiles): Unit
    next
  }

  /** Fold all files of the given buckets into one resolved file per bucket
    * (tombstones retained — GC is Maintain.compact's explicit call). Runs on
    * the MOR HOT PATH (every MaxFilesPerBucket batches per crowded bucket),
    * so it uses the CO-LOCATED per-bucket resolve — no shuffle; shuffle
    * fallback only for pre-evolution tables. */
  def compactBuckets(spark: SparkSession, table: LakeTable, buckets: Set[Int]): Snapshot = {
    // pin: a concurrent aggressive expiry must not GC our inputs mid-fold
    val (snap, pinLease) = table.pinCurrent()
    try {
      val nBuckets = snap.nBuckets
      val (sel, keep) = snap.files.partition(f => buckets.contains(f.bucket))
      if (sel.isEmpty) return snap
      val logical = TableSchemas.forVersion(snap.schemaVersion)
      val dataCols = logical.fieldNames.toSeq.filterNot(TableSchemas.internalNames.contains)
      val resolvedRaw =
        if (snap.schemaVersion == TableSchemas.current)
          graft.sql.GraftRead.rawResolved(spark, table, Some(snap.snapshotId), Some(buckets))
        else graft.lake.Resolve.lww(
          table.readFiles(spark, snap, sel).repartition(nBuckets, col("url")), dataCols)
      val resolved = resolvedRaw
        .withColumn("bucket", LakeTable.bucketOf(col("url"), nBuckets))
        .sortWithinPartitions(col("url"))
      // unique output dir + replacement-rebase commit: compaction may run
      // CONCURRENTLY with an ingest stream — concurrent ADDs survive the
      // rebase; if a competing maintenance already replaced our inputs, the
      // output is deleted and this is a no-op (LakeTable.commitReplace)
      replaceResolved(spark, table, snap, sel, resolved, "c", DataFile.TierBase)
    } finally pinLease.release()
  }

  /** COPY-ON-WRITE apply: see object doc — union of pruned target files and
    * the raw batch, one bucket-aligned shuffle, touched buckets rewritten. */
  private def applyCow(spark: SparkSession, table: LakeTable, batch: DataFrame,
      batchId: Long, lineage: Seq[PartLineage], opts: MergeOptions,
      emptyBase: Boolean = false): Snapshot = {
    val head = table.currentSnapshot
    if (head.committedBatchIds.contains(batchId)) return head // exactly-once replay skip
    // emptyBase (INSERT OVERWRITE): merge against a VIRTUAL empty state at
    // the real head's identity — untouched files come out empty and the
    // marker list restarts at the overwrite's own, so the one commit below
    // atomically replaces the whole table; its CAS still guards against
    // concurrent writers (parentId = the head we read)
    val snap = if (emptyBase)
      head.copy(files = Vector.empty, batches = Vector.empty, totalRows = 0L)
    else head

    val nBuckets = snap.nBuckets
    val timing = sys.env.contains("GRAFT_TIMING")
    var tMark = System.nanoTime()
    def mark(what: String): Unit = if (timing) {
      val now = System.nanoTime()
      System.err.println(f"[timing]   merge/$what ${(now - tMark) / 1e9}%.1f s")
      tMark = now
    }

    // the batch is read twice (stats pass + merge); cache it — unless the
    // CALLER already cached these rows (applyBatch's non-binlog fallback),
    // where re-caching a projection would double-store every payload: the
    // bucket hash is trivial to recompute against the existing cache
    val callerCached = batch.storageLevel.useMemory || batch.storageLevel.useDisk
    val withBucket = batch.withColumn("bucket", LakeTable.bucketOf(col("url"), nBuckets))
    if (!callerCached) withBucket.persist(StorageLevel.MEMORY_AND_DISK): Unit
    try {
      // batch-side stats for pruning: touched buckets, url bounds,
      // upsert/delete counts — one aggregate, O(nBuckets) on the driver.
      val stats = withBucket.groupBy(col("bucket")).agg(
        count(lit(1)).as("n"),
        min(col("url")).as("umin"), max(col("url")).as("umax"),
        sum(when(col("op") === "upsert", 1L).otherwise(0L)).as("ups"))
        .collect()
      mark("batch-stats")
      // empty batch: no-op on the REAL head (the synthetic empty base must
      // never escape; an empty INSERT OVERWRITE is routed to truncate() by
      // the write layer before reaching here)
      if (stats.isEmpty) return head
      val srcBuckets = stats.map(r => r.getInt(0)).toSet
      val bounds = stats.map(r => r.getInt(0) -> (r.getString(2), r.getString(3))).toMap
      val upserts = stats.map(_.getLong(4)).sum
      val total = stats.map(_.getLong(1)).sum
      val deletes = total - upserts

      // 1. prune — bounds compared in unsigned-UTF-8 byte order (the order
      //    Spark's min/max(url) and the parquet stats actually use; Java
      //    String order would silently mis-prune supplementary-plane urls).
      //    NoStatsMax means "unbounded": never skip such a file. SAFETY NET:
      //    even a wrong prune miss stays read-correct, because a multi-file
      //    bucket is LWW-resolved at read time (LakeTable.read) — but we
      //    keep bounds conservative so that net is never load-bearing.
      val (touched, untouched) = snap.files.partition { f =>
        srcBuckets.contains(f.bucket) && {
          val (umin, umax) = bounds(f.bucket)
          f.urlMax == LakeTable.NoStatsMax ||
            (LakeTable.compareUtf8(f.urlMin, umax) <= 0 &&
              LakeTable.compareUtf8(umin, f.urlMax) <= 0)
        }
      }

      val logical = TableSchemas.forVersion(snap.schemaVersion)
      val typeOf = logical.fields.map(f => f.name -> f.dataType).toMap
      val dataCols = logical.fieldNames.toSeq.filterNot(TableSchemas.internalNames.contains)

      // 2. align the batch to the logical schema + `_xt` flag (does this row
      //    still need text extraction?)
      val srcAligned = withBucket
        .withColumn("text", lit(null).cast("string"))
        .withColumn("content_len", lit(null).cast(typeOf("content_len")))
        .withColumn("_seq_part", col("partition"))
        .withColumn("_seq_offset", col("offset"))
        .withColumn("_deleted", col("op") === "delete")
        .withColumn("_xt", lit(true))
      val allCols = (dataCols ++ TableSchemas.internalNames :+ "_xt")
      val aligned = (df: DataFrame) => df.select(allCols.map(c => col(c).cast(
        if (c == "_xt") org.apache.spark.sql.types.BooleanType else typeOf.getOrElse(c, org.apache.spark.sql.types.BooleanType)).as(c)): _*)

      // 3. resolve winners. Default: CO-LOCATED bucket merge — table files
      //    are bucket-partitioned + url-sorted already, so only the BATCH
      //    is shuffled (one Exchange, O(batch) bytes); each task streams
      //    its bucket's files against the batch winners (BucketMergeExec).
      //    Fallback (mixed schema versions among touched files, or the A/B
      //    flag): union + one bucket-aligned shuffle + max_by.
      val sameVersion = touched.forall(_.schemaVersion == snap.schemaVersion)
      if (timing) System.err.println(s"[timing]   cow path=${if (opts.colocatedCow && sameVersion) "colocated" else "shuffle"} touchedFiles=${touched.size} touchedRows=${touched.map(_.rowCount).sum}")
      val winners = if (opts.colocatedCow && sameVersion) {
        val bucketFiles = touched.groupBy(_.bucket).map { case (b, fs) =>
          b -> fs.map(f => (table.root.resolve(f.path).toString, f.bytes))
        }
        // LATE MATERIALIZATION (see lateResolved): pre-resolve batch winners
        // meta-first and feed THOSE to the exec — its required
        // HashPartitioning(url, nBuckets) is already satisfied (no extra
        // exchange), LWW over pre-LWW'd input is idempotent, and the
        // payload shuffle shrinks to O(winners)
        val batchSide =
          if (opts.lateMaterialize && batch.columns.contains("offset") && batch.columns.contains("partition"))
            aligned(lateResolved(withBucket, srcAligned, nBuckets, dataCols, lineage, opts.audit)
              .withColumn("_xt", lit(true)))
          else aligned(srcAligned)
        graft.plans.BucketMergeStrategy.mergedRows(
          spark, batchSide, bucketFiles, nBuckets, logical)
      } else {
        val target = table.readFiles(spark, snap, touched).withColumn("_xt", lit(false))
        val unioned = aligned(target).unionByName(aligned(srcAligned))
        val payload = struct((dataCols.filterNot(_ == "url") ++ TableSchemas.internalNames :+ "_xt").map(col): _*)
        val seq = struct(col("warc_ts"), col("_seq_offset"), col("_seq_part"))
        unioned
          .repartition(nBuckets, col("url"))
          .groupBy(col("url"))
          .agg(max_by(payload, seq).as("w"))
          .select(col("url") +: (dataCols.filterNot(_ == "url") ++ TableSchemas.internalNames :+ "_xt").map(c => col(s"w.$c").as(c)): _*)
      }

      // 4. finish rows: extract text only for batch-side winners; recompute
      //    content_len; bucket == physical partition id by construction.
      val merged = winners
        .withColumn("text", when(col("_xt") && !col("_deleted"), NativeFns.extractText(col("html")))
          .otherwise(col("text")))
        .withColumn("content_len",
          when(col("html").isNull, lit(null)).otherwise(length(col("html"))).cast(typeOf("content_len")))
        .withColumn("bucket", LakeTable.bucketOf(col("url"), nBuckets))
        .drop("_xt")
        .sortWithinPartitions(col("url"))

      if (Merge.explainNext) { Merge.explainNext = false; Merge.explain(merged) }

      // 5. write + manifest from footers + commit
      val nextId = snap.snapshotId + 1
      val newFiles = table.writeDataFiles(merged, nextId, snap.schemaVersion)
      mark("merge-write")

      val newTotal = untouched.map(_.rowCount).sum + newFiles.map(_.rowCount).sum
      val next = snap.copy(
        snapshotId = nextId,
        parentId = snap.snapshotId,
        files = untouched ++ newFiles,
        batches = snap.batches :+ BatchMarker(batchId, lineage, upserts, deletes),
        totalRows = newTotal)
      val committed = table.commit(next, Some(snap.commitTsMs))
      mark("commit")
      committed
    } finally { if (!callerCached) withBucket.unpersist(): Unit }
  }
}
