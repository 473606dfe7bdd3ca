package graft.cdc

import java.nio.file.Path

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{Oracle, SparkSpec}
import graft.binlog.{BinlogRead, ChangeEventGen, GenProfile}
import graft.lake.{FeedOffset, FeedSource, LakeTable, TableSchemas}

/** Chained-pipeline suite: the `graft-feed` streaming source + [[Mirror]]
  * must make a destination table converge to the source table's state —
  * byte-identical text — across incremental follow, duplicate replay,
  * COW re-emission, maintenance snapshots, schema evolution, snapshot
  * expiry under the feed's lease, and a two-hop mirror chain; and must
  * fail LOUDLY (never silently diverge) across a rollback. */
class MirrorSpec extends SparkSpec {

  private def gen(p: GenProfile): Path = {
    val dir = tmpDir("binlog")
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 1000, chunkThreshold = 64 * 1024)
    dir
  }

  /** url → (warcMicros, text, lang, content_len) of a table's live state. */
  private def stateOf(table: LakeTable): Map[String, (Long, String, String, Long)] =
    table.read(spark).collect().map { r =>
      val cl = r.getAs[Any]("content_len") match {
        case null => -1L
        case l: Long => l
        case i: Int => i.toLong
      }
      r.getAs[String]("url") -> ((Oracle.micros(r.getAs[java.sql.Timestamp]("warc_ts")),
        r.getAs[String]("text"), r.getAs[String]("lang"), cl))
    }.toMap

  /** Build a source table from a binlog in `n` batches. */
  private def buildSource(binlog: Path, root: Path, total: Long, n: Int,
      mode: MergeMode = Mor, firstBatchId: Long = 0L): LakeTable = {
    val table =
      if (LakeTable.exists(root)) LakeTable.load(root)
      else LakeTable.create(root, nBuckets = 4)
    val step = math.max(1L, total / n + 1)
    var (b, from) = (firstBatchId, 0L)
    while (from < total) {
      Ingest.applyBatch(spark, table, mode = mode)(
        BinlogRead.range(spark, binlog.toString, from, from + step), b)
      b += 1; from += step
    }
    table
  }

  private def mirror(src: Path, dst: Path, ckpt: Path, mode: MergeMode = Mor,
      fromSnapshot: String = "full"): Unit = {
    val q = Mirror.startMirror(spark, src, dst, ckpt.toString,
      fromSnapshot = fromSnapshot, mode = mode, trigger = Trigger.AvailableNow())
    q.awaitTermination()
  }

  test("mirror converges to the source state and both match the oracle (MOR)") {
    val p = GenProfile.adversarialOrder().copy(partitions = 2, eventsPerPartition = 1000)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    val a = buildSource(binlog, aRoot, p.eventsPerPartition, n = 3)
    mirror(aRoot, bRoot, ckpt)
    val b = LakeTable.load(bRoot)
    val oracle = Oracle.finalState(p)
    assert(stateOf(a) == oracle)
    assert(stateOf(b) == oracle, "mirror diverged from source")
    // tombstones propagated physically, not just as missing rows
    assert(b.readRaw(spark).filter(col("_deleted")).count() > 0)
    // feed-domain lineage: one contiguous [0, head] chain on the reserved
    // partition — the mirror's gap-free "which source snapshots applied"
    val runs = b.currentSnapshot.batches.flatMap(_.lineage)
      .filter(_.partition == FeedSource.LineagePartition).sortBy(_.startOffset)
    assert(runs.nonEmpty)
    assert(runs.head.startOffset == 0L)
    runs.sliding(2).foreach {
      case Seq(x, y) => assert(y.startOffset == x.startOffset + x.count, "feed span gap")
      case _ =>
    }
    assert(runs.last.startOffset + runs.last.count == a.currentSnapshotId)
  }

  test("incremental follow + exactly-once: new source batches flow, idle re-run is a no-op") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1200)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    buildSource(binlog, aRoot, 700, n = 2)
    mirror(aRoot, bRoot, ckpt)
    val b = LakeTable.load(bRoot)
    val afterFirst = b.currentSnapshotId
    // source advances; the SAME checkpoint follows incrementally
    val a = buildSource(binlog, aRoot, p.eventsPerPartition, n = 2, firstBatchId = 2L)
    mirror(aRoot, bRoot, ckpt)
    assert(stateOf(LakeTable.load(bRoot)) == stateOf(a))
    assert(LakeTable.load(bRoot).currentSnapshotId > afterFirst)
    // nothing new: replay is a pure no-op (no snapshot, no marker)
    val afterSecond = LakeTable.load(bRoot).currentSnapshotId
    mirror(aRoot, bRoot, ckpt)
    assert(LakeTable.load(bRoot).currentSnapshotId == afterSecond,
      "idle mirror run committed a snapshot")
  }

  test("COW source re-emits rewritten buckets; the mirror still converges") {
    val p = GenProfile.adversarialOrder().copy(partitions = 2, eventsPerPartition = 800)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    // COW: every batch rewrites whole buckets — the feed re-emits old
    // winners with their original envelopes; re-applying a loser is a no-op
    val a = buildSource(binlog, aRoot, p.eventsPerPartition, n = 4, mode = Cow)
    mirror(aRoot, bRoot, ckpt, mode = Cow)
    assert(stateOf(LakeTable.load(bRoot)) == stateOf(a))
  }

  test("maintenance snapshots (compaction) emit no feed rows") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1000)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    val a = buildSource(binlog, aRoot, p.eventsPerPartition, n = 4)
    mirror(aRoot, bRoot, ckpt)
    val before = stateOf(LakeTable.load(bRoot))
    val liveBefore = LakeTable.load(bRoot).currentSnapshot.totalRows
    // compact ALL buckets: a full-rewrite snapshot with NO new batch markers
    Merge.compactBuckets(spark, a, (0 until a.currentSnapshot.nBuckets).toSet)
    assert(a.currentSnapshot.batches.size == a.snapshot(a.currentSnapshot.parentId).batches.size)
    mirror(aRoot, bRoot, ckpt)
    val b = LakeTable.load(bRoot)
    assert(stateOf(b) == before)
    assert(b.currentSnapshot.totalRows == liveBefore,
      "a maintenance-only span changed the mirror's stored rows")
  }

  test("mirror follows the source across a WAP publish; staged branch stays invisible") {
    val p = GenProfile.adversarialOrder().copy(partitions = 2, eventsPerPartition = 1200)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    val a = buildSource(binlog, aRoot, 600, n = 2)
    mirror(aRoot, bRoot, ckpt)

    // audit stages the tail on a branch: INVISIBLE to the feed until
    // publish — a drain while staged must reproduce main's state only
    val branch = a.createBranch("audit")
    Ingest.applyBatch(spark, branch, mode = Mor)(
      BinlogRead.range(spark, binlog.toString, 600, p.eventsPerPartition),
      Ingest.branchBatchId("wap-mirror-ck", 0L))
    mirror(aRoot, bRoot, ckpt)
    assert(stateOf(LakeTable.load(bRoot)) == stateOf(a),
      "staged branch leaked into the change feed")

    // main compacts while the audit is staged, then the squash lands on
    // the maintenance-advanced head — the adversarial increment shape for
    // the feed: the squash's file diff REMOVES the compacted files and
    // RE-ADDS fork-era + branch files, so prefix rows are re-emitted and
    // the mirror must converge through LWW idempotence (the COW
    // re-emission discipline), tombstones included
    graft.lake.Maintain.compact(spark, a)
    a.publishBranch("audit")
    mirror(aRoot, bRoot, ckpt)
    val oracle = Oracle.finalState(p)
    assert(stateOf(LakeTable.load(aRoot)) == oracle)
    assert(stateOf(LakeTable.load(bRoot)) == oracle,
      "mirror diverged across the WAP publish")
  }

  test("rollback on the source fails the feed loudly — no silent divergence") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 900)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    val a = buildSource(binlog, aRoot, 600, n = 2)
    mirror(aRoot, bRoot, ckpt)
    val target = a.currentSnapshotId
    buildSource(binlog, aRoot, p.eventsPerPartition, n = 1, firstBatchId = 2L)
    a.rollbackTo(target): Unit
    val q = Mirror.startMirror(spark, aRoot, bRoot, ckpt.toString,
      trigger = Trigger.AvailableNow())
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("ROLLBACK")), s"wrong failure: $e")
  }

  test("INSERT OVERWRITE on the source fails the feed loudly — equal marker count is not maintenance") {
    // the adversarial shape for the old count-based guard: source has ONE
    // marker, the overwrite leaves ONE marker (count 1 → 1) — a count
    // check would classify it as maintenance and the mirror would
    // silently keep every overwritten row; the marker-PREFIX guard must
    // fail the stream loudly through the real feed path
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 400)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("ovr-a"), tmpDir("ovr-b"), tmpDir("ovr-ck"))
    val a = buildSource(binlog, aRoot, 2L * p.eventsPerPartition, n = 2) // one batch, one marker
    assert(a.currentSnapshot.batches.size == 1)
    mirror(aRoot, bRoot, ckpt)
    val replacement = spark.range(5).selectExpr(
      "concat('ovr', id) AS url",
      "timestamp_micros(1900000000000000 + id) AS warc_ts",
      "cast('<o/>' AS BINARY) AS html", "'en' AS lang",
      "CAST(0 AS INT) AS partition", "id AS offset", "'upsert' AS op")
    Merge.overwrite(spark, a, replacement, (1L << 62) | 7L): Unit // SQL-domain id
    assert(LakeTable.load(aRoot).currentSnapshot.batches.size == 1,
      "test shape requires the equal-marker-count rewrite")
    val q = Mirror.startMirror(spark, aRoot, bRoot, ckpt.toString,
      trigger = Trigger.AvailableNow())
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("REWRITE")), s"wrong failure: $e")
  }

  test("schema pin guard: a stream pinned at v1 fails loudly on v2 files") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 300)
    val binlog = gen(p)
    val root = tmpDir("feed-a")
    val table = LakeTable.create(root, nBuckets = 2, schemaVersion = 1)
    Ingest.applyBatch(spark, table)(BinlogRead.range(spark, binlog.toString, 0L, 150L), 0L)
    val from = table.currentSnapshotId
    table.evolveSchema(2)
    Ingest.applyBatch(spark, table)(BinlogRead.range(spark, binlog.toString, 150L, 300L), 1L)
    // a stream that pinned v1 before the evolve now crosses a v2 file
    val stream = new graft.lake.FeedMicroBatchStream(root, pinnedVersion = 1,
      fromSnapshot = from.toString, maxSnapshotsPerBatch = 0,
      pinEnabled = false, pinOwner = None, lineageToken = None,
      checkpointLocation = tmpDir("feed-ck").toString)
    val e = intercept[IllegalStateException] {
      stream.planInputPartitions(FeedOffset(from), FeedOffset(table.currentSnapshotId))
    }
    assert(e.getMessage.contains("evolved past"))
  }

  test("mirror across a source schema evolution (restart re-pins) converges") {
    val p = GenProfile.evolving().copy(partitions = 2, eventsPerPartition = 1000)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    val boundary = (p.eventsPerPartition * p.v2FromFraction).toLong
    val a = LakeTable.create(aRoot, nBuckets = 4, schemaVersion = 1)
    Ingest.applyBatch(spark, a)(BinlogRead.range(spark, binlog.toString, 0L, boundary), 0L)
    mirror(aRoot, bRoot, ckpt) // v1-era mirror (feed pinned at v1)
    a.evolveSchema(2)
    Ingest.applyBatch(spark, a)(
      BinlogRead.range(spark, binlog.toString, boundary, p.eventsPerPartition), 1L)
    mirror(aRoot, bRoot, ckpt) // restart: feed re-pins at v2
    val bState = stateOf(LakeTable.load(bRoot))
    val aState = stateOf(a)
    // the destination was created at the CURRENT schema, so v1-era rows it
    // stored already read as v2 (lang null, widened len) — same as source
    assert(bState == aState)
    assert(bState.values.exists(_._3 != null), "v2-era lang rows missing")
  }

  test("feed lease survives aggressive source expiry; unconsumed span stays readable") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1500)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    buildSource(binlog, aRoot, 500, n = 2)
    mirror(aRoot, bRoot, ckpt)
    val a = LakeTable.load(aRoot)
    // the committed cursor holds an owned lease
    val pins = a.pinnedSnapshotIds()
    assert(pins.contains(a.currentSnapshotId), s"no feed lease on ${a.currentSnapshotId} (pins: $pins)")
    // source advances 4 snapshots, then expires down to 1 — the lease must
    // retain the feed's forward span
    buildSource(binlog, aRoot, p.eventsPerPartition, n = 4, firstBatchId = 2L)
    graft.lake.Maintain.expireSnapshots(a, keepLast = 1): Unit
    mirror(aRoot, bRoot, ckpt)
    assert(stateOf(LakeTable.load(bRoot)) == stateOf(a))
  }

  test("fromSnapshot=latest mirrors only the post-attach span") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1200)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    buildSource(binlog, aRoot, 800, n = 2)
    val a = LakeTable.load(aRoot)
    val attachAt = a.currentSnapshotId
    mirror(aRoot, bRoot, ckpt, fromSnapshot = "latest")
    assert(stateOf(LakeTable.load(bRoot)).isEmpty, "latest-attach emitted pre-attach state")
    buildSource(binlog, aRoot, p.eventsPerPartition, n = 1, firstBatchId = 2L)
    mirror(aRoot, bRoot, ckpt, fromSnapshot = "latest")
    // expected: LWW over exactly the post-attach increment's winner rows
    val dataCols = TableSchemas.v2.fieldNames.toSeq.filterNot(TableSchemas.internalNames.contains)
    val inc = a.readIncrement(spark, attachAt)
    val seq = struct(col("warc_ts"), col("_seq_offset"), col("_seq_part"))
    val expected = inc.groupBy(col("url"))
      .agg(max_by(struct(dataCols.map(col) :+ col("_deleted"): _*), seq).as("w"))
      .filter(!col("w._deleted"))
      .select(col("url"), col("w.warc_ts"), col("w.text"), col("w.lang"), col("w.content_len"))
      .collect()
      .map(r => r.getString(0) -> ((Oracle.micros(r.getTimestamp(1)), r.getString(2),
        r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    assert(stateOf(LakeTable.load(bRoot)) == expected)
  }

  test("two-hop chain A -> B -> C converges end to end, byte-identical") {
    val p = GenProfile.adversarialOrder().copy(partitions = 2, eventsPerPartition = 800)
    val binlog = gen(p)
    val (aRoot, bRoot, cRoot) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-c"))
    val (ckB, ckC) = (tmpDir("feed-ckb"), tmpDir("feed-ckc"))
    val a = buildSource(binlog, aRoot, 500, n = 2)
    mirror(aRoot, bRoot, ckB)
    mirror(bRoot, cRoot, ckC)
    assert(stateOf(LakeTable.load(cRoot)) == stateOf(a))
    // both hops advance
    buildSource(binlog, aRoot, p.eventsPerPartition, n = 2, firstBatchId = 2L)
    mirror(aRoot, bRoot, ckB)
    mirror(bRoot, cRoot, ckC)
    val oracle = Oracle.finalState(p)
    assert(stateOf(LakeTable.load(aRoot)) == oracle)
    assert(stateOf(LakeTable.load(bRoot)) == oracle)
    assert(stateOf(LakeTable.load(cRoot)) == oracle, "second hop diverged")
  }

  test("latest-attach lease protects the attach snapshot BEFORE any batch plans") {
    // the eager initialOffset pin: a latest attach may not plan a batch
    // until the source advances — expiry in that window must not GC the
    // attach snapshot out from under the checkpoint
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1200)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    buildSource(binlog, aRoot, 600, n = 2)
    mirror(aRoot, bRoot, ckpt, fromSnapshot = "latest") // zero-data attach
    val a = LakeTable.load(aRoot)
    val attachAt = a.currentSnapshotId
    assert(a.pinnedSnapshotIds().contains(attachAt),
      s"attach point $attachAt not leased (pins: ${a.pinnedSnapshotIds()})")
    // the source advances and aggressively expires while the mirror idles
    buildSource(binlog, aRoot, p.eventsPerPartition, n = 3, firstBatchId = 2L)
    graft.lake.Maintain.expireSnapshots(a, keepLast = 1): Unit
    mirror(aRoot, bRoot, ckpt, fromSnapshot = "latest")
    // post-attach span fully mirrored (the lease kept it readable)
    val dataCols = TableSchemas.v2.fieldNames.toSeq.filterNot(TableSchemas.internalNames.contains)
    val inc = a.readIncrement(spark, attachAt)
    val seq = struct(col("warc_ts"), col("_seq_offset"), col("_seq_part"))
    val expected = inc.groupBy(col("url"))
      .agg(max_by(struct(dataCols.map(col) :+ col("_deleted"): _*), seq).as("w"))
      .filter(!col("w._deleted"))
      .select(col("url"), col("w.warc_ts"), col("w.text"), col("w.lang"), col("w.content_len"))
      .collect()
      .map(r => r.getString(0) -> ((Oracle.micros(r.getTimestamp(1)), r.getString(2),
        r.getString(3), if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    assert(expected.nonEmpty)
    assert(stateOf(LakeTable.load(bRoot)) == expected)
  }

  test("rollback re-seed under a fresh checkpoint: salted batch ids apply, no silent skip") {
    // epoch ids restart at 0 per checkpoint — without the per-attachment
    // salt the re-seeded batches would collide with the first attachment's
    // markers (retained by the destination's own rollback) and be skipped
    // as replays, silently losing the whole re-seeded span
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1200)
    val binlog = gen(p)
    val (aRoot, bRoot) = (tmpDir("feed-a"), tmpDir("feed-b"))
    val (ck1, ck2) = (tmpDir("feed-ck1"), tmpDir("feed-ck2"))
    buildSource(binlog, aRoot, 600, n = 2)
    mirror(aRoot, bRoot, ck1)
    val a = LakeTable.load(aRoot)
    val (srcGood, dstGood) = (a.currentSnapshotId, LakeTable.load(bRoot).currentSnapshotId)
    // incident: a bad span lands on the source and gets mirrored
    buildSource(binlog, aRoot, 900, n = 1, firstBatchId = 2L)
    mirror(aRoot, bRoot, ck1)
    // recover both in step, then RE-SEED the mirror from the rollback point
    a.rollbackTo(srcGood): Unit
    LakeTable.load(bRoot).rollbackTo(dstGood): Unit
    val reseedFrom = a.currentSnapshotId // the rollback commit
    buildSource(binlog, aRoot, p.eventsPerPartition, n = 1, firstBatchId = 3L)
    mirror(aRoot, bRoot, ck2, fromSnapshot = reseedFrom.toString)
    val oracle = Oracle.finalState(p)
    assert(stateOf(LakeTable.load(aRoot)) == oracle)
    assert(stateOf(LakeTable.load(bRoot)) == oracle,
      "re-seeded mirror diverged (batch-id collision with the first attachment?)")
  }

  test("selective mirror: destination == source state restricted to the url predicate") {
    val p = GenProfile.adversarialOrder().copy(partitions = 2, eventsPerPartition = 900)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    buildSource(binlog, aRoot, 600, n = 2)
    val pred = "url LIKE '%/p0/%'"
    def filteredMirror(): Unit = {
      Mirror.startMirror(spark, aRoot, bRoot, ckpt.toString, where = Some(pred),
        trigger = Trigger.AvailableNow()).awaitTermination()
    }
    filteredMirror()
    // source advances (deletes included); the same checkpoint follows
    val a = buildSource(binlog, aRoot, p.eventsPerPartition, n = 2, firstBatchId = 2L)
    filteredMirror()
    val b = LakeTable.load(bRoot)
    val oracle = Oracle.finalState(p).filter(_._1.contains("/p0/"))
    assert(oracle.nonEmpty && oracle.size < Oracle.finalState(p).size,
      "predicate must select a strict non-empty subset for this test to mean anything")
    assert(stateOf(a) == Oracle.finalState(p))
    assert(stateOf(b) == oracle, "selective mirror diverged from the url-restricted state")
    // deletes of MATCHING urls propagate physically; nothing outside the
    // predicate ever lands (tombstones included)
    val rawB = b.readRaw(spark)
    assert(rawB.filter(col("_deleted")).count() > 0, "no tombstones propagated")
    assert(rawB.filter(!col("url").like("%/p0/%")).count() == 0,
      "rows outside the predicate reached the destination")
    // idle re-run is a no-op (exactly-once under the filter)
    val head = b.currentSnapshotId
    filteredMirror()
    assert(LakeTable.load(bRoot).currentSnapshotId == head)
  }

  test("single-tenant mirror: a point predicate converges and extracts prune keys") {
    // point-predicate shapes yield exact url keys (feed-side file pruning);
    // other shapes fall back to unpruned-but-filtered
    assert(Mirror.urlKeysOf(spark, "url = 'x'") == Seq("x"))
    assert(Mirror.urlKeysOf(spark, "'x' = url") == Seq("x"))
    assert(Mirror.urlKeysOf(spark, "url IN ('a', 'b')") == Seq("a", "b"))
    assert(Mirror.urlKeysOf(spark, "url LIKE 'a%'") == Nil)
    assert(Mirror.urlKeysOf(spark, "url = 'x' OR url = 'y'") == Nil)

    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 600)
    val binlog = gen(p)
    val (aRoot, bRoot, ckpt) = (tmpDir("feed-a"), tmpDir("feed-b"), tmpDir("feed-ck"))
    val a = buildSource(binlog, aRoot, p.eventsPerPartition, n = 3)
    val oracle = Oracle.finalState(p)
    val k = oracle.keys.min // a live url
    Mirror.startMirror(spark, aRoot, bRoot, ckpt.toString,
      where = Some(s"url = '$k'"), trigger = Trigger.AvailableNow())
      .awaitTermination()
    assert(stateOf(a) == oracle)
    assert(stateOf(LakeTable.load(bRoot)) == Map(k -> oracle(k)),
      "single-tenant mirror holds more or less than its key")
  }

  test("selective mirror rejects mutable-column, nondeterministic, and subquery predicates") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 200)
    val binlog = gen(p)
    val (aRoot, bRoot) = (tmpDir("feed-a"), tmpDir("feed-b"))
    buildSource(binlog, aRoot, 200, n = 1)
    def tryPred(pred: String): IllegalArgumentException =
      intercept[IllegalArgumentException] {
        Mirror.startMirror(spark, aRoot, bRoot, tmpDir("feed-ck").toString,
          where = Some(pred), trigger = Trigger.AvailableNow())
      }
    assert(tryPred("lang = 'en'").getMessage.contains("stable key column"))
    assert(tryPred("url LIKE '%x%' AND warc_ts > TIMESTAMP'2020-01-01'")
      .getMessage.contains("stable key column"))
    assert(tryPred("rand() < 0.5").getMessage.contains("deterministic"))
    // subqueries don't even parse as a standalone predicate expression (the
    // in-code SubqueryExpression guard is defense-in-depth behind this)
    intercept[org.apache.spark.sql.catalyst.parser.ParseException] {
      Mirror.startMirror(spark, aRoot, bRoot, tmpDir("feed-ck").toString,
        where = Some("url IN (SELECT 'u1')"), trigger = Trigger.AvailableNow())
    }
  }

  test("feed offset JSON round-trips") {
    for (o <- Seq(FeedOffset(0L, pendingFull = true), FeedOffset(42L), FeedOffset(Long.MaxValue)))
      assert(FeedOffset.fromJson(o.json()) == o)
  }
}
