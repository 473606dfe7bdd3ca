package graft.sql

import java.nio.file.Path

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType, StructType, TimestampType}
import org.apache.spark.unsafe.types.UTF8String

import graft.lake.{LakeTable, Maintain}

/** SQL-callable maintenance procedures (`CALL graft.system.<proc>(…)`) —
  * the operational tier exposed the way Iceberg exposes its stored
  * procedures, so an operator never needs JVM access for day-2 actions:
  *
  * {{{
  *   CALL graft.system.rollback_to_snapshot(`table` => 't', snapshot_id => 7)
  *   CALL graft.system.expire_snapshots(`table` => 't', keep_last => 10)
  *   CALL graft.system.compact(`table` => 't')
  *   CALL graft.system.rebucket(`table` => 't', n_buckets => 128)
  *   CALL graft.system.build_blooms(`table` => 't')
  *   CALL graft.system.remove_orphan_files(`table` => 't', older_than => TIMESTAMP'…')
  * }}}
  *
  * Each returns a one-row result describing what happened. Procedures are
  * driver-side orchestration over the same public API the engine uses
  * ([[graft.lake.LakeTable.rollbackTo]], [[graft.lake.Maintain]]), so the
  * SQL surface cannot drift from the library behavior.
  *
  * Reference analog: none (the reference delegates operations to Kafka
  * Connect tooling) — this is engine-tier operability. */
object GraftProcedures {

  val Namespace: Array[String] = Array("system")

  def idents: Array[Identifier] =
    Array("rollback_to_snapshot", "expire_snapshots", "compact",
      "rebucket", "build_blooms", "remove_orphan_files",
      "create_tag", "drop_tag",
      "create_branch", "publish_branch", "drop_branch")
      .map(Identifier.of(Namespace, _))

  def load(ident: Identifier, warehouse: Path): UnboundProcedure = {
    require(ident.namespace().sameElements(Namespace),
      s"unknown procedure namespace ${ident.namespace().mkString(".")}")
    def root(tableArg: String): Path = {
      val r = tableArg.split('.').foldLeft(warehouse)(_ resolve _)
      require(LakeTable.exists(r), s"no graft table '$tableArg' under $warehouse")
      r
    }
    ident.name() match {
      case "rollback_to_snapshot" => proc("rollback_to_snapshot",
        "Roll the table back to a retained snapshot (new commit, history kept)",
        Seq(in("table", StringType), in("snapshot_id", LongType)),
        Seq("previous_snapshot_id" -> LongType, "current_snapshot_id" -> LongType),
        args => {
          val t = LakeTable.load(root(args.getUTF8String(0).toString))
          val prev = t.currentSnapshotId
          val next = t.rollbackTo(args.getLong(1))
          Array[Any](prev, next.snapshotId)
        })
      case "expire_snapshots" => proc("expire_snapshots",
        "Expire snapshots beyond keep_last (and, if older_than is given, " +
          "only those committed before it) and delete their orphaned files",
        Seq(in("table", StringType), in("keep_last", LongType),
          // optional: time-based retention off the monotonic commit stamps
          ProcedureParameter.in("older_than", TimestampType)
            .defaultValue("CAST(NULL AS TIMESTAMP)").build()),
        Seq("expired_snapshots" -> LongType, "deleted_files" -> LongType),
        args => {
          val t = LakeTable.load(root(args.getUTF8String(0).toString))
          val olderThanMs =
            if (args.numFields < 3 || args.isNullAt(2)) Long.MaxValue
            else Math.floorDiv(args.getLong(2), 1000L) // micros → ms
          val (snaps, files) = Maintain.expireSnapshots(t, args.getLong(1).toInt,
            olderThanMs = olderThanMs)
          Array[Any](snaps.toLong, files.toLong)
        })
      case "compact" => proc("compact",
        "Fold merge-on-read deltas and rewrite buckets (maintenance commit)",
        Seq(in("table", StringType)),
        Seq("snapshot_id" -> LongType, "files" -> LongType),
        args => {
          val t = LakeTable.load(root(args.getUTF8String(0).toString))
          val snap = Maintain.compact(SparkSession.active, t)
          Array[Any](snap.snapshotId, snap.files.size.toLong)
        })
      case "rebucket" => proc("rebucket",
        "Rewrite the table under a new url hash-bucket count (scale lever)",
        Seq(in("table", StringType), in("n_buckets", LongType)),
        Seq("snapshot_id" -> LongType, "n_buckets" -> LongType),
        args => {
          val t = LakeTable.load(root(args.getUTF8String(0).toString))
          val snap = Maintain.rebucket(SparkSession.active, t,
            args.getLong(1).toInt)
          Array[Any](snap.snapshotId, snap.nBuckets.toLong)
        })
      case "build_blooms" => proc("build_blooms",
        "Build missing url bloom sidecars for point-lookup pruning",
        Seq(in("table", StringType)),
        Seq("built" -> LongType),
        args => {
          val t = LakeTable.load(root(args.getUTF8String(0).toString))
          Array[Any](Maintain.buildBlooms(SparkSession.active, t).toLong)
        })
      case "remove_orphan_files" => proc("remove_orphan_files",
        "Delete unreferenced data/staging files older than older_than " +
          "(default: 3 days ago) — crash debris no snapshot references",
        Seq(in("table", StringType),
          // the mtime horizon protecting in-flight writers (Iceberg's
          // contract); default mirrors Iceberg's now − 3 days
          ProcedureParameter.in("older_than", TimestampType)
            .defaultValue("CAST(NULL AS TIMESTAMP)").build(),
          ProcedureParameter.in("dry_run", BooleanType)
            .defaultValue("false").build()),
        Seq("removed_files" -> LongType),
        args => {
          val t = LakeTable.load(root(args.getUTF8String(0).toString))
          val olderThanMs =
            if (args.numFields < 2 || args.isNullAt(1))
              System.currentTimeMillis() - 3L * 24 * 3600 * 1000
            else Math.floorDiv(args.getLong(1), 1000L) // micros → ms
          val dryRun = args.numFields >= 3 && !args.isNullAt(2) && args.getBoolean(2)
          Array[Any](Maintain.removeOrphanFiles(t, olderThanMs, dryRun).size.toLong)
        })
      case "create_tag" => proc("create_tag",
        "Tag a retained snapshot with a durable name (expiry keeps it; " +
          "VERSION AS OF '<tag>' reads it). Default snapshot: current",
        Seq(in("table", StringType), in("tag", StringType),
          ProcedureParameter.in("snapshot_id", LongType)
            .defaultValue("CAST(NULL AS BIGINT)").build()),
        Seq("tag" -> StringType, "snapshot_id" -> LongType),
        args => {
          val t = LakeTable.load(root(args.getUTF8String(0).toString))
          val tag = args.getUTF8String(1).toString
          val id = if (args.numFields < 3 || args.isNullAt(2)) t.currentSnapshotId
            else args.getLong(2)
          t.createTag(tag, id)
          Array[Any](tag, id)
        })
      case "drop_tag" => proc("drop_tag",
        "Drop a snapshot tag; the snapshot becomes expirable again",
        Seq(in("table", StringType), in("tag", StringType)),
        Seq("existed" -> BooleanType),
        args => {
          val t = LakeTable.load(root(args.getUTF8String(0).toString))
          Array[Any](t.dropTag(args.getUTF8String(1).toString))
        })
      case "create_branch" => proc("create_branch",
        "Fork a staging branch at the current main head (write-audit-" +
          "publish; VERSION AS OF '<branch>' reads its staged state)",
        Seq(in("table", StringType), in("branch", StringType)),
        Seq("branch" -> StringType, "fork_snapshot_id" -> LongType),
        args => {
          val t = LakeTable.load(root(args.getUTF8String(0).toString))
          val name = args.getUTF8String(1).toString
          val bt = t.createBranch(name)
          Array[Any](name, bt.currentSnapshotId)
        })
      case "publish_branch" => proc("publish_branch",
        "Squash-publish a staged branch onto main (fails if main advanced " +
          "past the fork) and delete the branch",
        Seq(in("table", StringType), in("branch", StringType)),
        Seq("published_snapshot_id" -> LongType),
        args => {
          val t = LakeTable.load(root(args.getUTF8String(0).toString))
          Array[Any](t.publishBranch(args.getUTF8String(1).toString).snapshotId)
        })
      case "drop_branch" => proc("drop_branch",
        "Drop a staged branch without publishing; its files become " +
          "orphan-GC-able",
        Seq(in("table", StringType), in("branch", StringType)),
        Seq("existed" -> BooleanType),
        args => {
          val t = LakeTable.load(root(args.getUTF8String(0).toString))
          Array[Any](t.dropBranch(args.getUTF8String(1).toString))
        })
      case other =>
        throw new IllegalArgumentException(s"unknown procedure 'system.$other'")
    }
  }

  private def in(name: String, dt: DataType): ProcedureParameter =
    ProcedureParameter.in(name, dt).build()

  /** One side-effecting, one-result-row procedure. `body` receives the
    * argument row ALIGNED to `params` order (Spark binds named/positional
    * CALL arguments before invoking) and returns the result row's values. */
  private def proc(procName: String, doc: String,
      params: Seq[ProcedureParameter], resultCols: Seq[(String, DataType)],
      body: InternalRow => Array[Any]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = doc
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = procName
        override def description(): String = doc
        override def parameters(): Array[ProcedureParameter] = params.toArray
        override def isDeterministic: Boolean = false
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val out = body(input)
          val schema = resultCols.foldLeft(new StructType()) {
            case (s, (n, dt)) => s.add(n, dt, nullable = false)
          }
          val row = InternalRow.fromSeq(out.toSeq.map {
            case s: String => UTF8String.fromString(s)
            case v => v
          })
          java.util.List.of[Scan](new LocalScan {
            override def rows(): Array[InternalRow] = Array(row)
            override def readSchema(): StructType = schema
            override def description(): String = s"graft.system.$procName result"
          }).iterator()
        }
      }
    }
}
