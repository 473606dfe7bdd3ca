package graft.sql

import java.nio.file.{Files, Path, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Cast, Expression, Literal, UnsafeProjection}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.{LakeTable, TableSchemas}

/** `TableCatalog` for graft lake tables — the declarative surface:
  *
  * {{{
  *   SET spark.sql.catalog.graft = graft.sql.GraftCatalog
  *   CREATE TABLE graft.pages (url STRING, …) USING graft TBLPROPERTIES ('buckets'='64')
  *   SELECT * FROM graft.pages
  *   MERGE INTO graft.pages …   -- see GraftSqlStrategy
  * }}}
  *
  * Plays the role of the reference's config-driven entry point
  * (`/root/reference/common/src/main/java/com/spredfast/kafka/connect/s3/Configure.java:125-165`):
  * a user drives the engine by names and properties, not library calls.
  */
class GraftCatalog extends TableCatalog
    with org.apache.spark.sql.connector.catalog.ProcedureCatalog
    with org.apache.spark.sql.connector.catalog.FunctionCatalog {
  private var catalogName: String = _
  private var warehouse: Path = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Paths.get(Option(options.get("warehouse"))
      .getOrElse(sys.props.getOrElse("graft.sql.warehouse", "/tmp/graft-warehouse")))
    Files.createDirectories(warehouse)
  }

  override def name(): String = catalogName

  private def rootOf(ident: Identifier): Path =
    warehouse.resolve((ident.namespace() :+ ident.name()).mkString("/"))

  /** `CALL graft.system.<proc>(…)` — see [[GraftProcedures]]. */
  override def loadProcedure(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure =
    GraftProcedures.load(ident, warehouse)

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(GraftProcedures.Namespace)) GraftProcedures.idents
    else Array.empty

  /** [[org.apache.spark.sql.connector.catalog.FunctionCatalog]]: exposes
    * the table partitioner so Spark can resolve the `bucket(n, url)`
    * transform [[GraftLakeScan]] reports — the hinge of storage-partitioned
    * joins (see [[GraftBucketFunction]]). Registered at the catalog root
    * (empty namespace), where `V2ExpressionUtils` looks transforms up. */
  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (ident.namespace().isEmpty && ident.name() == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty) Array(Identifier.of(Array.empty, "bucket"))
    else Array.empty

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse)(_.resolve(_))
    if (!Files.isDirectory(dir)) return Array.empty
    val s = Files.list(dir)
    try s.iterator().asScala
      .filter(p => LakeTable.exists(p))
      .map(p => Identifier.of(namespace, p.getFileName.toString))
      .toArray
    finally s.close()
  }

  override def loadTable(ident: Identifier): Table = {
    // metadata tables: `t$snapshots` / `t$files` / `t$batches` resolve to a
    // read-only view over the BASE table's snapshot state (quote the name in
    // SQL: SELECT * FROM graft.`t$snapshots`). Never listed by SHOW TABLES.
    val name = ident.name()
    val dollar = name.lastIndexOf('$')
    // `t$changes` resolves to the table's change feed (graft.lake.FeedTable,
    // the Delta `table_changes` shape): a DISTRIBUTED scan of every retained
    // snapshot's winner rows with envelopes + `_feed_snapshot` — batch reads
    // default to the full genesis span; `spark.readStream.table` tails it
    // (the same DSv2 table serves MICRO_BATCH_READ). Unlike the driver-built
    // metadata views below, changes are data-sized, so they go through the
    // feed's parquet reader factory, never the driver.
    if (dollar > 0 && name.substring(dollar + 1) == "changes") {
      val base = Identifier.of(ident.namespace(), name.substring(0, dollar))
      val root = rootOf(base)
      if (!LakeTable.exists(root)) throw new NoSuchTableException(base)
      return new graft.lake.FeedTable(root.toString)
    }
    if (dollar > 0 && GraftMetaTable.Kinds.contains(name.substring(dollar + 1))) {
      val base = Identifier.of(ident.namespace(), name.substring(0, dollar))
      val root = rootOf(base)
      if (!LakeTable.exists(root)) throw new NoSuchTableException(base)
      return new GraftMetaTable(LakeTable.load(root), ident.toString,
        name.substring(dollar + 1))
    }
    val root = rootOf(ident)
    if (!LakeTable.exists(root)) throw new NoSuchTableException(ident)
    val lake = LakeTable.load(root)
    // write-audit-publish session binding (Iceberg's `spark.wap.branch`):
    // while `spark.graft.sql.wapBranch` is set, reads AND writes on every
    // graft table THAT HAS the branch bind to it — see
    // GraftSql.WapBranchConf. A table WITHOUT the branch reads main
    // (Iceberg's fallback — production statements join read-only dimension
    // tables that were never forked) but REJECTS writes loudly at write
    // time: a typo'd branch name silently writing the audit to main is the
    // exact hazard WAP exists to prevent.
    GraftSql.wapBranchFor(org.apache.spark.sql.SparkSession.active) match {
      case Some(b) if lake.branchExists(b) =>
        new GraftSqlTable(lake.branchTable(b), s"$ident@b$b")
      case Some(b) =>
        new GraftSqlTable(lake, ident.toString, wapUnbound = Some((b, ident.toString)))
      case None => new GraftSqlTable(lake, ident.toString)
    }
  }

  /** Time travel: `SELECT … FROM graft.t VERSION AS OF <snapshotId>`, a
    * quoted tag name (`VERSION AS OF 'release-1'`) created by
    * [[graft.lake.LakeTable.createTag]] / `CALL graft.system.create_tag`,
    * or a BRANCH name — the audit read of the write-audit-publish flow:
    * validation queries run against the staged branch head
    * ([[graft.lake.LakeTable.createBranch]]) before anyone publishes it.
    * Numeric strings resolve as snapshot ids, then tags, then branches
    * (branch names can't be all-digit — enforced at creation). */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    if (!LakeTable.exists(root)) throw new NoSuchTableException(ident)
    val lake = LakeTable.load(root)
    val id = version.toLongOption.orElse(lake.tags.get(version)).getOrElse {
      if (lake.branchExists(version)) {
        val bt = lake.branchTable(version)
        return new GraftSqlTable(bt, s"$ident@b$version",
          pinnedSnapshot = Some(bt.currentSnapshotId))
      }
      throw new IllegalArgumentException(
        s"no tag or branch '$version' for graft table $ident " +
          s"(tags: ${lake.tags.keys.toSeq.sorted.mkString(", ")}; " +
          s"branches: ${lake.branchEntries.map(_._1).mkString(", ")})")
    }
    require(lake.snapshotIds.contains(id),
      s"no snapshot $id for graft table $ident (have ${lake.snapshotIds.mkString(", ")})")
    new GraftSqlTable(lake, s"$ident@v$version", pinnedSnapshot = Some(id))
  }

  /** Time travel: `SELECT … FROM graft.t TIMESTAMP AS OF <ts>`. Spark hands
    * the timestamp in epoch MICROS; resolution picks the latest retained
    * snapshot committed at or before it (commit stamps are strictly
    * monotonic per table — see [[graft.lake.LakeTable.commit]]). */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val root = rootOf(ident)
    if (!LakeTable.exists(root)) throw new NoSuchTableException(ident)
    val lake = LakeTable.load(root)
    val id = lake.snapshotAsOfTimestampMs(Math.floorDiv(timestamp, 1000L))
    new GraftSqlTable(lake, s"$ident@t$timestamp", pinnedSnapshot = Some(id))
  }

  /** CREATE TABLE accepts any VERSION of the web-page schema (newest match
    * wins): declaring `content_len INT` without `lang` creates a v1 table,
    * which `ALTER TABLE` can later evolve. */
  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    val root = rootOf(ident)
    if (LakeTable.exists(root)) throw new TableAlreadyExistsException(ident)
    val version = (TableSchemas.current to 1 by -1).find { v =>
      val userFacing = GraftSqlTable.userSchemaFor(v).fields.map(f => f.name -> f.dataType).toMap
      schema.fields.forall(f => userFacing.get(f.name).contains(f.dataType))
    }.getOrElse {
      val userFacing = GraftSqlTable.userSchema.fields.map(f => f.name -> f.dataType).toMap
      val unknown = schema.fieldNames.filterNot(userFacing.contains)
      throw new IllegalArgumentException(
        if (unknown.nonEmpty)
          s"graft tables have a fixed web-page schema; unknown columns: ${unknown.mkString(", ")}"
        else "graft tables have a fixed web-page schema; mistyped columns: " +
          schema.fields.filter(f => userFacing.get(f.name).exists(_ != f.dataType))
            .map(f => s"${f.name} is ${userFacing(f.name).sql}, got ${f.dataType.sql}").mkString(", "))
    }
    val nBuckets = Option(properties.get("buckets")).map(_.toInt).getOrElse(32)
    LakeTable.create(root, nBuckets, schemaVersion = version)
    new GraftSqlTable(LakeTable.load(root), ident.toString)
  }

  /** `ALTER TABLE graft.t ADD COLUMN …` / `ALTER COLUMN … TYPE …` mapped
    * onto the versioned evolution chain ([[LakeTable.evolveSchema]]): each
    * change must be part of the delta from the table's version to the
    * current one (today: v1→v2 adds `lang STRING` and widens `content_len`
    * INT→BIGINT). Anything outside that delta — drops, renames, arbitrary
    * columns — is rejected; a valid change evolves the table to the version
    * containing it (a metadata-only commit; old files align at read). */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    val root = rootOf(ident)
    if (!LakeTable.exists(root)) throw new NoSuchTableException(ident)
    // schema evolution is part of what an audit validates: under the WAP
    // session binding ALTER TABLE commits on the BRANCH chain (the squash
    // carries schemaVersion, so publish lands the evolution with the data);
    // table lifecycle (CREATE/DROP/RENAME) stays main-only
    val lake = GraftSql.wapBranchFor(org.apache.spark.sql.SparkSession.active) match {
      case Some(b) =>
        val main = LakeTable.load(root)
        require(main.branchExists(b),
          s"${GraftSql.WapBranchConf}='$b' is set but table $ident has no branch '$b'")
        main.branchTable(b)
      case None => LakeTable.load(root)
    }
    val from = lake.currentSnapshot.schemaVersion
    val fromSchema = GraftSqlTable.userSchemaFor(from)
    val toSchema = GraftSqlTable.userSchemaFor(TableSchemas.current)
    val added = toSchema.fields.filterNot(f => fromSchema.fieldNames.contains(f.name))
      .map(f => f.name -> f.dataType).toMap
    val widened = toSchema.fields.filter(f => fromSchema.fieldNames.contains(f.name) &&
      fromSchema(f.name).dataType != f.dataType).map(f => f.name -> f.dataType).toMap
    def reject(what: String): Nothing = throw new IllegalArgumentException(
      s"graft ALTER TABLE: $what. Supported evolution from schema v$from: " +
        (added.map { case (n, t) => s"ADD COLUMN $n ${t.sql}" } ++
          widened.map { case (n, t) => s"ALTER COLUMN $n TYPE ${t.sql}" }).mkString(", "))
    changes.foreach {
      case add: TableChange.AddColumn =>
        val name = add.fieldNames().mkString(".")
        if (!added.get(name).contains(add.dataType()))
          reject(s"cannot add column `$name` ${add.dataType().sql}")
      case upd: TableChange.UpdateColumnType =>
        val name = upd.fieldNames().mkString(".")
        if (!widened.get(name).contains(upd.newDataType()))
          reject(s"cannot change column `$name` to ${upd.newDataType().sql}")
      case other => reject(s"unsupported change ${other.getClass.getSimpleName}")
    }
    if (changes.nonEmpty && from < TableSchemas.current)
      lake.evolveSchema(TableSchemas.current): Unit
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val root = rootOf(ident)
    if (!LakeTable.exists(root)) return false
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) {
        val s = Files.list(p)
        try s.forEach(rm) finally s.close()
      }
      Files.deleteIfExists(p): Unit
    }
    rm(root)
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit = {
    val from = rootOf(oldIdent)
    if (!LakeTable.exists(from)) throw new NoSuchTableException(oldIdent)
    Files.move(from, rootOf(newIdent)): Unit
  }
}

object GraftSqlTable {
  /** User-facing schema: the logical schema minus engine columns. */
  def userSchema: StructType = userSchemaFor(TableSchemas.current)

  def userSchemaFor(version: Int): StructType = StructType(
    TableSchemas.forVersion(version).fields
      .filterNot(f => TableSchemas.internalNames.contains(f.name)))
}

/** DSv2 table over a LakeTable. Reads are CO-LOCATED resolve-on-read: one
  * input partition per bucket; within a task, the bucket's url-sorted files
  * are k-way MERGED streaming (k ≤ MaxFilesPerBucket+1), LWW-folded by the
  * `(warc_ts, _seq_offset, _seq_part)` order, tombstones dropped — no
  * shuffle, no hash map, O(k) memory however large the bucket. */
final class GraftSqlTable(val lake: LakeTable, ident: String,
    pinnedSnapshot: Option[Long] = None,
    wapUnbound: Option[(String, String)] = None) extends Table
    with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.TruncatableTable {
  override def name(): String = ident
  /** The lake handle WRITE paths must use: under a `wapBranch` session
    * binding, a table WITHOUT the branch resolves main for reads
    * (dimension-table fallback, see [[GraftCatalog.loadTable]]) but every
    * write against it must fail loudly — this is where it does. */
  def writeLake: LakeTable = wapUnbound match {
    case Some((b, id)) => throw new IllegalStateException(
      s"${GraftSql.WapBranchConf}='$b' is set but table $id has no branch " +
        s"'$b' — a write here would land on MAIN, the exact hazard the WAP " +
        s"binding prevents. CALL graft.system.create_branch('$id', '$b') " +
        "first, or unset the conf")
    case None => lake
  }
  /** `TRUNCATE TABLE graft.t`: rollback-to-empty as one metadata commit —
    * see [[graft.lake.LakeTable.truncate]] for the marker-clearing and
    * change-feed (fail-loud) semantics. */
  override def truncateTable(): Boolean = { writeLake.truncate(); true }
  /** Schema follows the table's (or the pinned snapshot's) logical version —
    * a v1 table presents v1 columns until ALTERed; time travel to a
    * pre-evolution snapshot presents that era's schema. */
  override def schema(): StructType = GraftSqlTable.userSchemaFor(
    pinnedSnapshot.map(lake.snapshot).getOrElse(lake.currentSnapshot).schemaVersion)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      // INSERT OVERWRITE (static mode plans OverwriteByExpression(true) →
      // the builder's truncate(); filtered/dynamic overwrites stay
      // unsupported and fail in the planner's capability check)
      TableCapability.TRUNCATE).asJava
  /** The table's declared layout: hash-bucketed by url (SHOW/DESCRIBE
    * surface; the read-side partitioning contract lives on the scan —
    * [[GraftLakeScan.outputPartitioning]]). */
  override def partitioning(): Array[Transform] = Array(
    org.apache.spark.sql.connector.expressions.Expressions.bucket(
      pinnedSnapshot.map(lake.snapshot).getOrElse(lake.currentSnapshot).nBuckets, "url"))
  /** DESCRIBE EXTENDED / SHOW TBLPROPERTIES surface: the layout facts an
    * operator reads first (snapshot resolved once per call — this is a
    * metadata view, not a contract; the scan re-resolves its own). */
  override def properties(): util.Map[String, String] = {
    val s = pinnedSnapshot.map(lake.snapshot).getOrElse(lake.currentSnapshot)
    Map(
      "buckets" -> s.nBuckets.toString,
      "schema_version" -> s.schemaVersion.toString,
      "current_snapshot_id" -> s.snapshotId.toString,
      "total_rows" -> s.totalRows.toString,
      "format" -> "graft/parquet").asJava
  }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLakeScan(lake,
      pinnedSnapshot.orElse(Option(options.get("snapshotId")).map(_.toLong))
        .orElse(Option(options.get("asOfTimestampMs"))
          .map(ms => lake.snapshotAsOfTimestampMs(ms.toLong))))
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new org.apache.spark.sql.connector.write.WriteBuilder
        with org.apache.spark.sql.connector.write.SupportsTruncate {
      // `INSERT OVERWRITE graft.t …` / `df.writeTo(t).overwrite(lit(true))`:
      // Spark's static overwrite plans through truncate() — the staged
      // rows' LWW winners become the WHOLE table state in one atomic
      // commit (Merge.overwrite; empty insert = plain truncate). Filtered
      // overwrites and dynamic partition overwrite stay unsupported and
      // fail loudly in Spark's planner.
      private var overwrite = false
      override def truncate(): org.apache.spark.sql.connector.write.WriteBuilder = {
        overwrite = true; this
      }
      // writeLake at BUILD (planning) time: under a wapBranch binding a
      // table without the branch must reject INSERT/streaming writes before
      // any task runs, not after (see writeLake's doc)
      override def build(): org.apache.spark.sql.connector.write.Write = {
        val wl = writeLake
        new org.apache.spark.sql.connector.write.Write {
          override def toBatch: org.apache.spark.sql.connector.write.BatchWrite =
            new GraftBatchWrite(wl, info.schema(), overwrite)
          // df.writeStream.toTable("graft.t"): user-schema rows as upsert
          // epochs (epoch id == exactly-once batch id)
          override def toStreaming: org.apache.spark.sql.connector.write.streaming.StreamingWrite = {
            // SupportsTruncate exists for BATCH INSERT OVERWRITE only. It
            // also makes Spark's Complete-output-mode streaming gate pass
            // (V2Writes requires SupportsTruncate and calls truncate()) —
            // but the sink below applies epochs as UPSERT merges, not
            // full-table replacement, so a Complete-mode aggregation would
            // SILENTLY diverge (a recomputed row with an older warc_ts
            // loses to the stale stored row under LWW). Keep the old loud
            // failure for that case.
            require(!overwrite,
              "graft-lake streaming writes are append/update upserts — " +
                "Complete output mode (per-epoch full-table replacement) " +
                "is not supported; use outputMode(\"update\") or " +
                "outputMode(\"append\")")
            // a branch-bound handle must NOT reach the streaming sink: its
            // commit() path re-loads the table from the root (= MAIN) —
            // staging data would silently land on main with raw epoch ids
            // in main's marker space, the exact hazard the WAP binding
            // prevents. Audited streaming ingest goes through
            // Ingest.startStream(branch = …), which mints salted
            // branch-domain markers and branch-scoped staging.
            require(wl.ref == graft.lake.LakeTable.MainRef,
              s"streaming writes cannot bind to staging branch '${wl.ref}' " +
                s"(session conf ${GraftSql.WapBranchConf}): the sink's epoch " +
                "ids carry no branch marker domain — use " +
                "Ingest.startStream(branch = …) for audited streaming " +
                "ingest, or unset the conf to stream to main")
            new graft.lake.LakeStreamingWrite(wl.root.toString,
              wl.currentSnapshot.nBuckets,
              GraftSql.mergeModeFor(org.apache.spark.sql.SparkSession.active),
              userSchemaRows = true)
          }
        }
      }
    }
}

/** Internal maintenance read: the co-located per-bucket LWW resolve with
  * the FULL schema (internal columns, tombstone winners kept) — what
  * compaction consumes. No shuffle, O(filesPerBucket) memory per task. */
private[graft] final class GraftRawTable(lake: LakeTable,
    snapshotId: Option[Long], buckets: Option[Set[Int]])
  extends Table with SupportsRead {
  override def name(): String = s"graft-raw(${lake.root})"
  override def schema(): StructType = TableSchemas.forVersion(TableSchemas.current)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftLakeScan(lake, snapshotId, raw = true, bucketFilter = buckets)
}

object GraftRead {
  /** Raw-resolved rows of a snapshot (default current), optionally
    * restricted to a bucket subset. Requires the snapshot to be at the
    * current schema version (callers fall back to the shuffle resolve
    * otherwise). */
  def rawResolved(spark: SparkSession, lake: LakeTable,
      snapshotId: Option[Long] = None,
      buckets: Option[Set[Int]] = None): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.GraftBridge.ofRows(spark,
      org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation.create(
        new GraftRawTable(lake, snapshotId, buckets), None, None,
        org.apache.spark.sql.util.CaseInsensitiveStringMap.empty()))
}

final case class GraftBucketPartition(
    bucket: Int,
    files: Seq[(String, Long, Int)], // (absolute path, bytes, schemaVersion)
    currentVersion: Int,
    raw: Boolean = false,
    limit: Option[Int] = None)
  extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  /** The value of the reported partition transform `bucket(n, url)` for
    * every row this partition emits — what BatchScanExec groups and
    * aligns across the two sides of a storage-partitioned join. */
  override def partitionKey(): InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bucket))
}

final class GraftLakeScan(lake: LakeTable, snapshotId: Option[Long],
    raw: Boolean = false, bucketFilter: Option[Set[Int]] = None)
    extends ScanBuilder with Scan with Batch
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownLimit
    with org.apache.spark.sql.connector.read.SupportsPushDownTopN
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportPartitioning
    with org.apache.spark.sql.connector.read.SupportsReportOrdering
    with org.apache.spark.sql.connector.read.SupportsRuntimeFiltering {
  /** The snapshot is resolved ONCE per scan: planInputPartitions and
    * createReaderFactory must see the same file/version set — a concurrent
    * commit (ingest, auto-maintenance) between the two calls would
    * otherwise leave the reader map missing a schema version a planned
    * partition uses, failing on executors. */
  private lazy val snap = snapshotId.map(lake.snapshot).getOrElse(lake.currentSnapshot)
  override def build(): Scan = this

  // --- column pruning: the k-way LWW merge always reads its resolution
  // columns (url + the (warc_ts, offset, partition) total order + the
  // tombstone flag), but payload columns a query doesn't project — above
  // all `html`, the dominant bytes of a webtext row — are never requested
  // from parquet. `required = None` = no pruning pushed (full schema).
  private var required: Option[StructType] = None
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = Some(requiredSchema)

  override def readSchema(): StructType = required.getOrElse(
    if (raw) TableSchemas.forVersion(snap.schemaVersion)
    else GraftSqlTable.userSchemaFor(snap.schemaVersion))
  override def description(): String =
    s"GraftLakeScan(${lake.root}${if (raw) ", raw" else ""})" +
      (if (urlKeys.nonEmpty) s" urlKeys=${urlKeys.mkString(",")}" else "") +
      tsLower.fold("") { case (lo, strict) =>
        s" tsLower${if (strict) ">" else ">="}$lo" } +
      pushedLimit.fold("")(l => s" limit=$l") +
      required.fold("")(r => s" columns=[${r.fieldNames.mkString(",")}]")
  override def toBatch: Batch = this

  // --- url point-lookup pushdown: a url equality/IN prunes to its hash
  // bucket (bucketOf == the write-time partitioner, so exactly one bucket
  // per key can hold it) and, within the bucket, to files whose manifest
  // [urlMin, urlMax] admit the key. All filters stay residual — Spark
  // re-applies them above the scan, so pruning can only skip, never lie.
  private var urlKeys: Seq[String] = Nil
  private var urlRowFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil

  // --- event-time pushdown: ONLY a lower bound on warc_ts may prune this
  // scan. The emitted rows are LWW winners (max (warc_ts, offset, partition)
  // envelope per url), and max-resolution commutes with a lower bound:
  // skipping a file whose every row is older than X either skips a url
  // entirely (its winner was older than X — the residual filter would have
  // dropped it) or promotes an older loser (also < X — residual-dropped).
  // An UPPER bound does NOT commute: skipping a file of NEWER rows would
  // un-shadow an older version (or un-delete a tombstoned url) and emit a
  // row the full read never produces — so `warc_ts <= Y` must never prune
  // here (the raw change feed, which does no resolution, may use both
  // bounds — see FeedScan). `tsLower` = (bound in epoch micros, strict).
  private var tsLower: Option[(Long, Boolean)] = None
  private var tsRowFilters: Seq[org.apache.spark.sql.sources.Filter] = Nil

  // --- LIMIT pushdown: a bucket's drain may stop after emitting `limit`
  // winners — every row it has emitted by then IS a true final-state row
  // (winner resolution is per-url and the drain completes a url's whole
  // run before emitting it), and a LIMIT without ORDER BY is free to pick
  // any subset. Partial push: Spark keeps the global limit above, we skip
  // decoding the rest of every bucket below. Never set in raw mode
  // (maintenance reads use the DataFrame path, which plans no limit).
  private var pushedLimit: Option[Int] = None
  override def pushLimit(l: Int): Boolean = { pushedLimit = Some(l); true }

  // --- TopN pushdown: `ORDER BY url [ASC] LIMIT k` reuses the same
  // early-exit — the drain emits ascending url, so its first k rows ARE
  // the bucket's k smallest urls. Partial push: Spark merges the buckets'
  // prefixes above. url is non-null, so either null ordering is vacuously
  // satisfied. Anything else (DESC, other columns) declines — the drain
  // order can't serve it.
  override def pushTopN(
      orders: Array[org.apache.spark.sql.connector.expressions.SortOrder],
      limit: Int): Boolean = {
    val urlAsc = orders.length == 1 && (orders(0).expression() match {
      case r: org.apache.spark.sql.connector.expressions.NamedReference =>
        r.fieldNames.sameElements(Array("url")) &&
          orders(0).direction() ==
            org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING
      case _ => false
    })
    if (urlAsc) pushedLimit = Some(limit)
    urlAsc
  }

  /** Both push interfaces: always PARTIAL — Spark keeps the global
    * limit/TopN above the per-bucket prefixes. (Required explicitly:
    * SupportsPushDownLimit and SupportsPushDownTopN each declare the
    * default, and Scala demands one override to own it.) */
  override def isPartiallyPushed(): Boolean = true

  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    import org.apache.spark.sql.sources.{EqualTo, GreaterThan, GreaterThanOrEqual, In}
    val keys = filters.collectFirst {
      case EqualTo("url", v: String) => Seq(v)
      // null list entries never match url (non-null key) — drop, don't NPE
      case In("url", vs) if vs.nonEmpty && vs.forall(v => v == null || v.isInstanceOf[String]) =>
        vs.toSeq.collect { case s: String => s }
    }.filter(_.nonEmpty)
    urlKeys = keys.getOrElse(Nil)
    urlRowFilters = filters.collect {
      case f @ EqualTo("url", _: String) => f
      case f @ In("url", vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[String]) => f
    }.take(1).toSeq
    // strongest lower bound across conjuncts (Spark hands top-level AND
    // legs as separate array entries); an EqualTo contributes its implied
    // inclusive lower bound — but only the BOUND, never the equality (a
    // row-level equality would drop the true winner and un-shadow losers)
    val lowers = filters.toSeq.flatMap {
      case GreaterThan("warc_ts", v) => GraftLakeScan.tsMicros(v).map(m => (m, true))
      case GreaterThanOrEqual("warc_ts", v) => GraftLakeScan.tsMicros(v).map(m => (m, false))
      case EqualTo("warc_ts", v) => GraftLakeScan.tsMicros(v).map(m => (m, false))
      case _ => None
    }
    tsLower = lowers.sortBy(l => (-l._1, !l._2)).headOption
    // ALL lower-bound conjuncts go to parquet (each is individually sound;
    // row-group skipping then honors the strongest, not just the first)
    tsRowFilters = filters.toSeq.collect {
      case f @ GreaterThan("warc_ts", v) if GraftLakeScan.tsMicros(v).nonEmpty => f
      case f @ GreaterThanOrEqual("warc_ts", v) if GraftLakeScan.tsMicros(v).nonEmpty => f
      case EqualTo("warc_ts", v) if GraftLakeScan.tsMicros(v).nonEmpty =>
        GreaterThanOrEqual("warc_ts", v)
    }
    filters // everything residual
  }

  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = {
    val u: Seq[org.apache.spark.sql.sources.Filter] =
      if (urlKeys.isEmpty) Nil
      else Seq(org.apache.spark.sql.sources.In("url", urlKeys.toArray[Any]))
    (u ++ tsRowFilters).toArray
  }

  // --- runtime (dynamic) filtering: when this table is the probe side of
  // a join whose build side is small and selective, Spark collects the
  // build side's join keys at EXECUTION time and hands them here (the
  // Iceberg SupportsRuntimeFiltering discipline) — BatchScanExec then
  // re-plans input partitions, so `big JOIN dim ON url` scans only the
  // keys' buckets/files even though no static predicate existed. Sound for
  // the LWW resolve for the same reason static point-lookup pushdown is:
  // every version of a url lives in its one hash bucket, and within it we
  // keep every file whose bounds/bloom admit the key. Keys are
  // INTERSECTED with statically pushed ones; a key set above
  // [[GraftLakeScan.MaxRuntimeFilterKeys]] is ignored (always allowed —
  // per-key bounds+bloom checks are driver-side work that must not scale
  // with a huge build side).
  override def filterAttributes(): Array[org.apache.spark.sql.connector.expressions.NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("url"))
  override def filter(filters: Array[org.apache.spark.sql.sources.Filter]): Unit = {
    import org.apache.spark.sql.sources.{EqualTo, In}
    val keys = filters.collectFirst {
      case EqualTo("url", v: String) => Seq(v)
      case In("url", vs) if vs.nonEmpty && vs.forall(v => v == null || v.isInstanceOf[String]) =>
        vs.toSeq.collect { case s: String => s }
    }.filter(ks => ks.nonEmpty && ks.size <= GraftLakeScan.MaxRuntimeFilterKeys)
    keys.foreach { ks =>
      urlKeys = if (urlKeys.isEmpty) ks else urlKeys.intersect(ks)
      // a runtime intersection that empties a static key set means the join
      // can match nothing — but an EMPTY urlKeys set here would read as "no
      // pushdown" and scan everything, so keep one impossible sentinel
      // bucket probe instead of widening back to a full scan
      if (urlKeys.isEmpty) urlKeys = ks.take(1)
    }
  }

  /** The post-pruning file set, per bucket — shared by partition planning,
    * [[estimateStatistics]] and [[outputPartitioning]] so Catalyst's size
    * estimate reflects exactly what this scan will read. MEMOIZED on the
    * mutable pushdown state (a plain lazy val would be wrong:
    * [[filter]] narrows `urlKeys` at execution time and the re-plan must
    * re-prune): the selection walks per-file bounds and stats bloom
    * sidecars, and the three planning callers must not triple that
    * driver-side I/O. Driver-single-threaded like the rest of the
    * pushdown state. */
  private var selMemoKey: (Seq[String], Option[(Long, Boolean)]) = _
  private var selMemoVal: Map[Int, Seq[graft.lake.DataFile]] = _
  private def selectedByBucket: Map[Int, Seq[graft.lake.DataFile]] = {
    val key = (urlKeys, tsLower)
    if (selMemoVal == null || selMemoKey != key) {
      selMemoVal = computeSelectedByBucket()
      selMemoKey = key
    }
    selMemoVal
  }

  private def computeSelectedByBucket(): Map[Int, Seq[graft.lake.DataFile]] = {
    // event-time file prune (lower bound only — see tsLower above): a file
    // whose manifest tsMax lies strictly below the bound cannot hold the
    // emitted winner of any url that survives the residual filter
    val timeAdmitted =
      if (tsLower.isEmpty) snap.files
      else snap.files.filter(f =>
        graft.lake.FeedSource.fileAdmitsTime(f, tsLower, hi = None))
    val byBucket = timeAdmitted.groupBy(_.bucket)
      .filter { case (b, _) => bucketFilter.forall(_.contains(b)) }
    val selected =
      if (urlKeys.isEmpty) byBucket
      else {
        val wanted: Map[Int, Seq[String]] = urlKeys
          .groupBy(u => LakeTable.bucketIdOf(u, snap.nBuckets))
        byBucket.collect {
          case (b, fs) if wanted.contains(b) =>
            b -> fs.filter { f =>
              val admitted = wanted(b).filter(u =>
                f.urlMax == LakeTable.NoStatsMax ||
                  (LakeTable.compareUtf8(f.urlMin, u) <= 0 &&
                    LakeTable.compareUtf8(u, f.urlMax) <= 0))
              // bloom sidecar (when present) can skip delta files whose
              // bounds admit the key but that cannot contain it
              admitted.nonEmpty &&
                graft.lake.Bloom.mightContainAny(lake.root.resolve(f.path), admitted)
            }
        }.filter(_._2.nonEmpty)
      }
    selected.map { case (b, fs) => b -> fs.toSeq }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    selectedByBucket.toSeq.sortBy(_._1).map { case (b, fs) =>
      GraftBucketPartition(b,
        fs.map(f => (lake.root.resolve(f.path).toString, f.bytes, f.schemaVersion)),
        snap.schemaVersion, raw, pushedLimit)
    }.toArray
  }

  // --- the read-side partitioning contract: each input partition is ONE
  // url-hash bucket (`bucket(nBuckets, url)` — resolved against the
  // catalog's function, see [[GraftBucketFunction]]), and within it rows
  // drain in ascending url order (the k-way merge pops the minimum url —
  // UTF8String comparison, identical to Spark's StringType sort order).
  // Reporting both makes graft⋈graft on url a storage-partitioned join
  // with ZERO Exchange and ZERO Sort on either side, and a groupBy(url)
  // aggregation shuffle-free (`spark.sql.sources.v2.bucketing.enabled`).
  // Under column pruning that drops url the rule can't resolve the
  // references and quietly claims nothing — a query that doesn't project
  // url can't join or group on it anyway.
  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning =
    new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions.bucket(
        snap.nBuckets, "url")),
      selectedByBucket.size)

  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
      org.apache.spark.sql.connector.expressions.Expressions.column("url"),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))

  /** Manifest-exact scan statistics (O(1), no file opens) so Catalyst can
    * plan broadcast joins against graft tables: without this, DSv2 falls
    * back to `spark.sql.defaultSizeInBytes` (effectively infinite) and a
    * join against even a tiny dimension-sized graft table sort-merges.
    * Reported AFTER pushdown over the pruned file set — a point lookup
    * reports its one bucket's admitted files, so `big JOIN t ON url='x'`
    * subqueries broadcast. Both numbers are upper bounds for the resolved
    * read (LWW emits ≤ stored rows; column pruning reads ≤ file bytes) —
    * upper bounds can only make Catalyst broadcast LESS, never OOM it. */
  override def estimateStatistics(): org.apache.spark.sql.connector.read.Statistics = {
    val fs = selectedByBucket.values.flatten
    val bytes = fs.iterator.map(_.bytes).sum
    val rows = fs.iterator.map(_.rowCount).sum
    new org.apache.spark.sql.connector.read.Statistics {
      override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(rows)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val spark = SparkSession.active
    val out = readSchema()
    // the merge reader's WORKING schema: the projected columns plus the
    // always-needed resolution internals, in the logical layout's order
    val logical = TableSchemas.forVersion(snap.schemaVersion)
    val scanSchema = StructType(logical.fields.filter(f =>
      out.fieldNames.contains(f.name) ||
        GraftBucketReader.MergeInternals.contains(f.name)))
    // one driver-built parquet reader closure per physical schema version
    // (same snapshot object as planInputPartitions — see `snap`); each
    // requests only the working columns it physically holds
    val versions = snap.files.map(_.schemaVersion).distinct.sorted
    val readers = versions.map { v =>
      val phys = TableSchemas.forVersion(v)
      val physRequired = StructType(
        scanSchema.fields.filter(f => phys.fieldNames.contains(f.name))
          .map(f => phys.fields(phys.fieldNames.indexOf(f.name))))
      v -> new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat()
        .buildReaderWithPartitionValues(
          sparkSession = spark,
          dataSchema = phys,
          partitionSchema = new StructType(),
          requiredSchema = physRequired,
          // row-group/page-level skipping INSIDE admitted files, built from
          // the same sound-for-LWW set the file prune uses: url equality/IN
          // (other urls' rows never affect a looked-up url's winner) and
          // the warc_ts LOWER bound (losers it drops lose anyway; winners
          // it drops are residual-filtered). Parquet quietly skips the
          // predicate on files whose physical type can't evaluate it
          // (legacy INT96) — both columns exist in every schema version.
          filters = urlRowFilters ++ tsRowFilters,
          options = Map(org.apache.spark.sql.execution.datasources.FileFormat.OPTION_RETURNING_BATCH -> "false"),
          hadoopConf = spark.sessionState.newHadoopConf())
    }.toMap
    new GraftBucketReaderFactory(readers, scanSchema, out)
  }
}

object GraftLakeScan {
  /** See [[graft.lake.LakeTable.tsLiteralMicros]]. */
  private[sql] def tsMicros(v: Any): Option[Long] =
    graft.lake.LakeTable.tsLiteralMicros(v)

  /** Runtime-filter key ceiling: per-key bounds/bloom admission is
    * driver-side work, so a huge build side must degrade to "no dynamic
    * prune" (sound) rather than an O(keys × files) planning stall. */
  val MaxRuntimeFilterKeys = 10000
}

final class GraftBucketReaderFactory(
    readers: Map[Int, org.apache.spark.sql.execution.datasources.PartitionedFile => Iterator[InternalRow]],
    scanSchema: StructType, outSchema: StructType)
  extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftBucketPartition]
    new GraftBucketReader(p, readers, scanSchema, outSchema)
  }
}

object GraftBucketReader {
  /** Columns the k-way LWW merge itself consumes — always read, whatever
    * the projection: the group key, the winner total order, and the
    * tombstone flag. */
  val MergeInternals: Set[String] =
    Set("url", "warc_ts", "_seq_part", "_seq_offset", "_deleted")
}

/** Streaming k-way LWW merge over one bucket's url-sorted files. */
final class GraftBucketReader(
    p: GraftBucketPartition,
    readers: Map[Int, org.apache.spark.sql.execution.datasources.PartitionedFile => Iterator[InternalRow]],
    scanSchema: StructType, outSchema: StructType)
  extends PartitionReader[InternalRow] {

  // the WORKING layout (projected columns + merge internals, pruned —
  // see createReaderFactory): rows align to it in the SNAPSHOT's logical
  // column order; a pre-evolution snapshot presents its own era's columns;
  // files can never be newer than their snapshot, so alignment only
  // widens/null-fills
  private val full = scanSchema
  private def idx(n: String) = full.fieldNames.indexOf(n)
  private val urlIdx = idx("url")
  private val tsIdx = idx("warc_ts")
  private val offIdx = idx("_seq_offset")
  private val partIdx = idx("_seq_part")
  private val delIdx = idx("_deleted")

  /** Align a physical-version row (already pruned to the working columns it
    * holds, in working order — the parquet readers' requiredSchema) to the
    * working layout: widen-cast present columns, null-fill added ones (the
    * generic form of the DataFrame-side `align`). */
  private def alignProj(version: Int): UnsafeProjection = {
    val phys = TableSchemas.forVersion(version)
    val physRequired = full.fields.filter(f => phys.fieldNames.contains(f.name))
      .map(f => phys.fields(phys.fieldNames.indexOf(f.name)))
    val exprs: Seq[Expression] = full.fields.toSeq.map { f =>
      val i = physRequired.indexWhere(_.name == f.name)
      if (i < 0) Literal.create(null, f.dataType)
      else {
        val br = BoundReference(i, physRequired(i).dataType, physRequired(i).nullable)
        if (physRequired(i).dataType == f.dataType) br
        else Cast(br, f.dataType, Some("UTC"))
      }
    }
    UnsafeProjection.create(exprs.toArray)
  }

  // per-file iterators, each aligned with its OWN projection instance so the
  // heads (one live row per file) occupy distinct buffers
  private val its: Array[Iterator[InternalRow]] = p.files.toArray.map { case (path, bytes, v) =>
    val proj = alignProj(v)
    val pf = org.apache.spark.sql.execution.datasources.PartitionedFile(
      InternalRow.empty, org.apache.spark.paths.SparkPath.fromPathString(path), 0L, bytes)
    // OPTION_RETURNING_BATCH=false → the reader yields rows, never batches
    readers(v)(pf).map(proj)
  }
  private val heads: Array[InternalRow] = its.map(it => if (it.hasNext) it.next() else null)

  // raw mode (compaction/maintenance) keeps tombstone winners; user mode
  // drops them. Either way the emitted columns are EXACTLY outSchema (the
  // pruned projection readSchema() declared), in its order.
  private val outIdxs = outSchema.fieldNames.map(idx)
  private val outProj = UnsafeProjection.create(
    outIdxs.map { srcIdx =>
      BoundReference(srcIdx, full.fields(srcIdx).dataType, full.fields(srcIdx).nullable): Expression
    })

  private def wins(a: InternalRow, b: InternalRow): Boolean = {
    val ta = a.getLong(tsIdx); val tb = b.getLong(tsIdx)
    if (ta != tb) return ta > tb
    val oa = a.getLong(offIdx); val ob = b.getLong(offIdx)
    if (oa != ob) return oa > ob
    a.getInt(partIdx) > b.getInt(partIdx)
  }

  private var current: InternalRow = _
  // pushed LIMIT: stop draining once this partition has emitted its quota
  // (every already-emitted row is a complete, true winner — see pushLimit)
  private var emitted = 0L

  override def next(): Boolean = {
    if (p.limit.exists(emitted >= _)) return false
    while (true) {
      // min url among live heads (unsigned UTF-8 byte order == sort order)
      var minI = -1
      var i = 0
      while (i < heads.length) {
        if (heads(i) != null &&
          (minI < 0 || heads(i).getUTF8String(urlIdx).compareTo(heads(minI).getUTF8String(urlIdx)) < 0))
          minI = i
        i += 1
      }
      if (minI < 0) return false
      // membership is recorded BEFORE any advance: `u` is a view into
      // heads(minI)'s projection buffer, which the advance overwrites
      val u = heads(minI).getUTF8String(urlIdx)
      val inGroup = new Array[Boolean](heads.length)
      inGroup(minI) = true
      var winner = heads(minI)
      var j = minI + 1
      while (j < heads.length) {
        if (heads(j) != null && heads(j).getUTF8String(urlIdx).compareTo(u) == 0) {
          inGroup(j) = true
          if (wins(heads(j), winner)) winner = heads(j)
        }
        j += 1
      }
      // materialize BEFORE any advance; from here the fold state is the
      // projected row plus primitives, so head buffers are free to move.
      // The group url is CLONED to its own buffer (the output row may not
      // contain url at all under column pruning) — constant for the whole
      // run, immune to head advances
      current = outProj(winner)
      var bTs = winner.getLong(tsIdx)
      var bOff = winner.getLong(offIdx)
      var bPart = winner.getInt(partIdx)
      var deleted = winner.getBoolean(delIdx)
      val curUrl = u.clone()
      // advance every in-group file PAST its url run, folding run rows: a
      // file may hold several versions of one url (a multi-batch increment
      // written without per-url dedup), and correctness must not depend on
      // the one-version-per-file writer invariant — a missed run row here
      // leaks a shadowed live row past its tombstone (user mode) or writes
      // duplicate versions into compaction output (raw mode)
      var k = 0
      while (k < heads.length) {
        if (inGroup(k)) {
          heads(k) = if (its(k).hasNext) its(k).next() else null
          while (heads(k) != null && heads(k).getUTF8String(urlIdx).compareTo(curUrl) == 0) {
            val h = heads(k)
            val ts = h.getLong(tsIdx); val off = h.getLong(offIdx); val pt = h.getInt(partIdx)
            if (ts > bTs || (ts == bTs && (off > bOff || (off == bOff && pt > bPart)))) {
              current = outProj(h)
              bTs = ts; bOff = off; bPart = pt
              deleted = h.getBoolean(delIdx)
            }
            heads(k) = if (its(k).hasNext) its(k).next() else null
          }
        }
        k += 1
      }
      if (p.raw || !deleted) { emitted += 1; return true }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
