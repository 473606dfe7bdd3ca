package graft.lake

import java.nio.file.{Files, Path}

import graft.{Oracle, SparkSpec}
import graft.binlog.{BinlogRead, ChangeEventGen, EventCodec, GenProfile}
import graft.cdc.Ingest

/** Write-audit-publish branches (Iceberg WAP semantics): a staging branch
  * is a shadow snapshot chain forked from main — invisible to every main
  * surface until `publishBranch` squashes it onto main as ONE commit that
  * carries the branch head's files, schema, row count AND batch markers.
  * The marker transfer is the subtle half: a published audit stream's
  * checkpoint epochs must land in main's exactly-once space WITHOUT
  * colliding with the main stream's own epochs (the mixed-writer data-loss
  * class — see [[graft.cdc.Ingest.BranchBatchIdBit]]). */
class BranchSpec extends SparkSpec {

  private def engineState(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getAs[String]("url") ->
      Oracle.micros(r.getAs[java.sql.Timestamp]("warc_ts"))).toMap

  private def assertState(df: org.apache.spark.sql.DataFrame,
      oracle: Map[String, (Long, String, String, Long)], hint: String): Unit = {
    val got = engineState(df)
    assert(got.size == oracle.size, s"$hint: engine=${got.size} oracle=${oracle.size}")
    oracle.foreach { case (u, (ts, _, _, _)) =>
      assert(got(u) == ts, s"$hint: warc_ts mismatch at $u") }
  }

  test("WAP end-to-end: branch isolates, publish squashes, salted markers never collide with main epochs") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 2200)
    val binlog = tmpDir("wap-binlog")
    val root = tmpDir("wap-tbl")
    val ckptMain = tmpDir("wap-ckpt-main").toString
    val ckptAudit = tmpDir("wap-ckpt-audit").toString

    // phase A: only the first 800 events/partition exist; MAIN stream drains
    // them under small-natural checkpoint epochs
    ChangeEventGen.writeSegments(p.copy(eventsPerPartition = 800), binlog, segmentEvents = 400)
    Ingest.startStream(spark, binlog.toString, root, ckptMain,
      maxEventsPerBatch = 500, nBuckets = 4).awaitTermination()
    val main = LakeTable.load(root)
    val oracleA = Oracle.finalState(p.copy(eventsPerPartition = 800))
    assertState(main.read(spark), oracleA, "main after phase A")
    val mainHeadA = main.currentSnapshotId
    val mainMarkersA = main.currentSnapshot.committedBatchIds

    // phase B: 700 more events/partition arrive; an AUDIT stream ingests the
    // WHOLE log (fresh checkpoint ⇒ its own epochs 0,1,… overlap main's)
    // into a staging branch — main must not see any of it
    (0 until p.partitions).foreach { part =>
      var off = 800L
      val w = new graft.binlog.SegmentWriter(binlog, part, off)
      while (off < 1500L) { w.writeEvent(ChangeEventGen.event(p, part, off), EventCodec.V2); off += 1 }
      w.close()
    }
    Ingest.startStream(spark, binlog.toString, root, ckptAudit,
      maxEventsPerBatch = 500, nBuckets = 4, branch = Some("audit")).awaitTermination()
    val oracleB = Oracle.finalState(p.copy(eventsPerPartition = 1500))
    assert(main.currentSnapshotId == mainHeadA, "branch commits must not move main")
    assertState(main.read(spark), oracleA, "main during audit")
    // the audit read: the branch handle resolves the staged state
    assertState(main.branchTable("audit").read(spark), oracleB, "branch head")
    // $branches surface
    val entries = main.branchEntries
    assert(entries.map(_._1) == Seq("audit") && entries.head._3 == mainHeadA)
    // every branch-minted marker sits in the salted branch domain — raw
    // epochs here would collide with main's own after publish
    val branchMinted = main.branchTable("audit").currentSnapshot.committedBatchIds -- mainMarkersA
    assert(branchMinted.nonEmpty &&
      branchMinted.forall(id => (id & Ingest.BranchBatchIdBit) != 0L),
      s"branch markers must carry bit 59: $branchMinted")
    // the fork lease holds the fork snapshot against main expiry
    assert(main.pinnedSnapshotIds().contains(mainHeadA))

    // PUBLISH: one squash commit onto main; branch metadata gone
    val pub = main.publishBranch("audit")
    assert(pub.parentId == mainHeadA && pub.snapshotId == mainHeadA + 1)
    assertState(main.read(spark), oracleB, "main after publish")
    assert(!main.branchExists("audit") && main.branchEntries.isEmpty)
    assert(!main.pinnedSnapshotIds().contains(mainHeadA), "fork lease released at publish")
    assert(branchMinted.subsetOf(pub.committedBatchIds) &&
      mainMarkersA.subsetOf(pub.committedBatchIds),
      "squash must carry BOTH chains' exactly-once markers")

    // phase C: the MAIN stream resumes from ITS checkpoint and ingests the
    // tail under epochs that numerically equal already-published audit
    // epochs — the salted domain is what keeps them from being skipped as
    // already-durable replays (raw epochs here would silently drop batches)
    (0 until p.partitions).foreach { part =>
      var off = 1500L
      val w = new graft.binlog.SegmentWriter(binlog, part, off)
      while (off < p.eventsPerPartition) { w.writeEvent(ChangeEventGen.event(p, part, off), EventCodec.V2); off += 1 }
      w.close()
    }
    Ingest.startStream(spark, binlog.toString, root, ckptMain,
      maxEventsPerBatch = 500, nBuckets = 4).awaitTermination()
    assertState(main.read(spark), Oracle.finalState(p), "main after resumed stream")
  }

  test("publish conflicts when main advanced past the fork; drop + re-fork recovers") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 600)
    val binlog = tmpDir("cf-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 300)
    val main = LakeTable.create(tmpDir("cf-tbl"), nBuckets = 4)
    Ingest.applyBatch(spark, main)(BinlogRead.range(spark, binlog.toString, 0, 200), 0L)

    val branch = main.createBranch("audit")
    Ingest.applyBatch(spark, branch)(BinlogRead.range(spark, binlog.toString, 200, 400),
      Ingest.branchBatchId("cf-audit", 0L))
    // main advances concurrently — the audit base is now stale
    Ingest.applyBatch(spark, main)(BinlogRead.range(spark, binlog.toString, 400, 600), 1L)
    val e = intercept[CommitConflict](main.publishBranch("audit"))
    assert(e.getMessage.contains("stale base"))
    assert(main.branchExists("audit"), "failed publish must not destroy the branch")
    // drop, re-fork at the NEW head, re-run the audit, publish cleanly
    assert(main.dropBranch("audit"))
    assert(!main.dropBranch("audit"), "second drop reports absence")
    val b2 = main.createBranch("audit")
    Ingest.applyBatch(spark, b2)(BinlogRead.range(spark, binlog.toString, 200, 400),
      Ingest.branchBatchId("cf-audit2", 0L))
    main.publishBranch("audit")
    assertState(main.read(spark), Oracle.finalState(p), "re-forked audit published")
  }

  test("publish tolerates maintenance-only movement of main; data movement still conflicts until rolled back") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 900)
    val binlog = tmpDir("mt-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 300)
    val main = LakeTable.create(tmpDir("mt-tbl"), nBuckets = 4)
    Ingest.applyBatch(spark, main)(BinlogRead.range(spark, binlog.toString, 0, 300), 0L)

    // audit stages the middle third; main COMPACTS concurrently — same
    // markers/schema/layout, only the files rearranged. A routine
    // maintenance cadence must not conflict the audit.
    val b1 = main.createBranch("audit")
    Ingest.applyBatch(spark, b1)(BinlogRead.range(spark, binlog.toString, 300, 600),
      Ingest.branchBatchId("mt-audit", 0L))
    val fork1 = main.currentSnapshotId
    Maintain.compact(spark, main)
    assert(main.currentSnapshotId > fork1, "precondition: main moved past the fork")
    main.publishBranch("audit")
    assert(!main.branchExists("audit") && main.pinnedSnapshotIds().isEmpty)

    // second audit stages the last third; main applies a poison batch —
    // DATA movement conflicts — then rolls BACK to the fork (markers equal
    // the fork's again): the base is logically restored, publish proceeds.
    val fork2 = main.currentSnapshotId
    val b2 = main.createBranch("audit2")
    Ingest.applyBatch(spark, b2)(BinlogRead.range(spark, binlog.toString, 600, 900),
      Ingest.branchBatchId("mt-audit2", 0L))
    Ingest.applyBatch(spark, main)(BinlogRead.range(spark, binlog.toString, 600, 900), 1L)
    val e = intercept[CommitConflict](main.publishBranch("audit2"))
    assert(e.getMessage.contains("stale base"))
    assert(main.branchExists("audit2"), "conflicted publish must keep the audit")
    main.rollbackTo(fork2)

    // crash-sim: the squash lands on the maintenance-moved head but cleanup
    // never runs — the retry must recognize content identity even though
    // the squash's parent is NOT the fork, and just finish the cleanup
    val bHead = main.branchTable("audit2").currentSnapshot
    val cur = main.currentSnapshot
    main.commit(bHead.copy(snapshotId = cur.snapshotId + 1, parentId = cur.snapshotId),
      Some(cur.commitTsMs))
    val retried = main.publishBranch("audit2")
    assert(retried.snapshotId == cur.snapshotId + 1)
    assert(!main.branchExists("audit2") && main.pinnedSnapshotIds().isEmpty)
    assertState(main.read(spark), Oracle.finalState(p),
      "both audits published across maintenance + rollback movement")
  }

  test("publishing an untouched branch is a drop; crashed publish retry completes cleanup") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 300)
    val binlog = tmpDir("em-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 300)
    val main = LakeTable.create(tmpDir("em-tbl"), nBuckets = 4)
    Ingest.applyBatch(spark, main)(BinlogRead.range(spark, binlog.toString, 0, 300), 0L)
    val head = main.currentSnapshotId

    main.createBranch("noop")
    val s = main.publishBranch("noop") // no commits since fork
    assert(s.snapshotId == head && !main.branchExists("noop"),
      "empty-audit publish must be a pure drop")

    // crashed publish: the squash landed on main but cleanup never ran —
    // a retry must detect the head as this branch's squash and just clean up
    val b = main.createBranch("crash")
    Ingest.applyBatch(spark, b)(BinlogRead.range(spark, binlog.toString, 0, 300),
      Ingest.branchBatchId("crash-ck", 0L))
    val bHead = b.currentSnapshot
    val cur = main.currentSnapshot
    main.commit(bHead.copy(snapshotId = cur.snapshotId + 1, parentId = cur.snapshotId),
      Some(cur.commitTsMs)) // the squash, sans cleanup (the crash point)
    val retried = main.publishBranch("crash")
    assert(retried.snapshotId == cur.snapshotId + 1)
    assert(!main.branchExists("crash") && main.pinnedSnapshotIds().isEmpty)
  }

  test("re-forked branch data dirs are disjoint from the published incarnation's live files") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 600)
    val binlog = tmpDir("rf-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 300)
    val main = LakeTable.create(tmpDir("rf-tbl"), nBuckets = 4)
    Ingest.applyBatch(spark, main)(BinlogRead.range(spark, binlog.toString, 0, 200), 0L)

    // incarnation 1: two branch commits, published — its ref-dirs are now
    // MAIN's live files
    val b1 = main.createBranch("wap")
    Ingest.applyBatch(spark, b1)(BinlogRead.range(spark, binlog.toString, 200, 300),
      Ingest.branchBatchId("rf1", 0L))
    Ingest.applyBatch(spark, b1)(BinlogRead.range(spark, binlog.toString, 300, 400),
      Ingest.branchBatchId("rf1", 1L))
    main.publishBranch("wap")
    val published = engineState(main.read(spark))
    val livePrefixed = main.currentSnapshot.files.map(_.path).filter(_.contains("ref-wap-"))
    assert(livePrefixed.nonEmpty, "published squash must carry the branch's data files")

    // incarnation 2: same name, NEW fork id — its snapshot ids retrace the
    // old incarnation's, so without the fork id in the dir prefix its
    // overwrite-mode writes would clobber main's published files
    val b2 = main.createBranch("wap")
    Ingest.applyBatch(spark, b2)(BinlogRead.range(spark, binlog.toString, 400, 500),
      Ingest.branchBatchId("rf2", 0L))
    Ingest.applyBatch(spark, b2)(BinlogRead.range(spark, binlog.toString, 500, 600),
      Ingest.branchBatchId("rf2", 1L))
    assert(engineState(main.read(spark)) == published,
      "re-forked branch writes must leave main's published files untouched")
    assert(b2.currentSnapshot.files.map(_.path).filter(_.contains("ref-wap-"))
      .forall(!livePrefixed.contains(_)), "incarnations must not share data dirs")
    main.publishBranch("wap")
    assertState(main.read(spark), Oracle.finalState(p), "second publish lands")
  }

  test("GC interplay: expiry keeps the fork readable; orphan GC spares live branches, reaps dropped ones") {
    import java.nio.file.attribute.FileTime
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 600)
    val binlog = tmpDir("gc-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 300)
    val main = LakeTable.create(tmpDir("gc-tbl"), nBuckets = 4)
    Ingest.applyBatch(spark, main)(BinlogRead.range(spark, binlog.toString, 0, 200), 0L)
    val fork = main.currentSnapshotId

    val b = main.createBranch("live")
    Ingest.applyBatch(spark, b)(BinlogRead.range(spark, binlog.toString, 200, 400),
      Ingest.branchBatchId("gc1", 0L))
    // expiry is main-only, and the fork lease must survive it
    intercept[IllegalArgumentException](Maintain.expireSnapshots(b, keepLast = 1))
    Ingest.applyBatch(spark, main)(BinlogRead.range(spark, binlog.toString, 400, 600), 1L)
    Maintain.expireSnapshots(main, keepLast = 1)
    assert(main.snapshotIds.contains(fork), "fork snapshot pinned against expiry")
    assert(b.read(spark).count() > 0, "branch still readable after main expiry")

    // orphan GC: backdate the branch's data files past the horizon — a LIVE
    // branch's files are referenced (chain walk), a DROPPED one's age out
    val branchFiles = b.currentSnapshot.files.map(f => main.root.resolve(f.path))
      .filter(_.toString.contains("ref-live-"))
    assert(branchFiles.nonEmpty)
    val old = FileTime.fromMillis(System.currentTimeMillis() - 2 * 3600 * 1000L)
    def backdate(path: Path): Unit = { Files.setLastModifiedTime(path, old): Unit }
    branchFiles.foreach(backdate)
    val horizon = System.currentTimeMillis() - 3600 * 1000L
    intercept[IllegalArgumentException](Maintain.removeOrphanFiles(b, horizon))
    assert(Maintain.removeOrphanFiles(main, horizon).isEmpty,
      "live branch files are not orphans")
    branchFiles.foreach(f => assert(Files.exists(f)))
    main.dropBranch("live")
    val reaped = Maintain.removeOrphanFiles(main, horizon)
    assert(branchFiles.forall(f => !Files.exists(f)),
      s"dropped branch files must age out (reaped: $reaped)")
  }

  test("publish guards: raw-id markers rejected; marker-less main advance conflicts, never discards the audit") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 300)
    val binlog = tmpDir("pg-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 300)
    val main = LakeTable.create(tmpDir("pg-tbl"), nBuckets = 4, schemaVersion = 1)
    Ingest.applyBatch(spark, main)(BinlogRead.range(spark, binlog.toString, 0, 300), 0L)

    // (1) a branch whose markers sit OUTSIDE the reserved staging domains
    // (bits 59–62) is rejected at publish: raw small-natural ids would
    // collide with the main stream's own checkpoint epochs after the squash
    val raw = main.createBranch("raw")
    Ingest.applyBatch(spark, raw)(BinlogRead.range(spark, binlog.toString, 0, 300), 7L)
    val e = intercept[IllegalArgumentException](main.publishBranch("raw"))
    assert(e.getMessage.contains("reserved staging domains"), e.getMessage)
    assert(main.branchExists("raw"), "rejected publish must not destroy the branch")
    assert(main.dropBranch("raw"))

    // (2) crashed-publish retry identity is the FULL squash content, not
    // markers alone: branch stages schema evolution (marker-less commit),
    // main lands an unrelated marker-less commit (rebucket) — batches are
    // EQUAL but the head is NOT our squash, so publish must raise
    // CommitConflict instead of silently discarding the audit
    val fork = main.currentSnapshotId
    val audit = main.createBranch("audit")
    audit.evolveSchema(2)
    Maintain.rebucket(spark, main, 8)
    assert(main.currentSnapshot.parentId == fork &&
      main.currentSnapshot.committedBatchIds ==
        audit.currentSnapshot.committedBatchIds,
      "precondition: marker sets equal, head not the squash")
    val c = intercept[CommitConflict](main.publishBranch("audit"))
    assert(c.getMessage.contains("stale base"), c.getMessage)
    assert(main.branchExists("audit"), "conflicted publish must keep the audit")
    assert(main.currentSnapshot.schemaVersion == 1,
      "main must not have absorbed the audit's evolution")
  }

  test("fork-lease hygiene: crashed-create debris reaped behind the horizon; live-audit leases heartbeat") {
    import java.nio.file.attribute.FileTime
    import scala.jdk.CollectionConverters._
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 400)
    val binlog = tmpDir("lh-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 400)
    val main = LakeTable.create(tmpDir("lh-tbl"), nBuckets = 4)
    Ingest.applyBatch(spark, main)(BinlogRead.range(spark, binlog.toString, 0, 200), 0L)

    def pinsFor(owner: String): Vector[Path] = {
      val dir = main.root.resolve("meta").resolve("pins")
      if (!Files.isDirectory(dir)) Vector.empty
      else {
        val s = Files.list(dir)
        try s.iterator().asScala.toVector.filter { q =>
          val parts = q.getFileName.toString.split("-")
          parts.length == 4 && parts(2) == owner
        } finally s.close()
      }
    }
    val old = FileTime.fromMillis(System.currentTimeMillis() - 2 * 3600 * 1000L)
    val horizon = System.currentTimeMillis() - 3600 * 1000L

    // the fork-lease owner prefix is reserved: a user lease named into it
    // would be reaped as crashed-create debris once aged
    intercept[IllegalArgumentException](main.pin(main.currentSnapshotId, "branch_mirror"))
    // crashed createBranch: the fork lease exists but no branch VERSION ever
    // published (simulated via the internal path the reservation protects) —
    // aged debris is reaped by orphan GC, fresh debris (a cross-process
    // create mid-flight) survives the mtime horizon
    main.pinUnchecked(main.currentSnapshotId, "branch_ghost")
    pinsFor("branch_ghost").foreach(Files.setLastModifiedTime(_, old))
    main.pinUnchecked(main.currentSnapshotId, "branch_young")
    Maintain.removeOrphanFiles(main, horizon)
    assert(pinsFor("branch_ghost").isEmpty, "aged crashed-create lease must be reaped")
    assert(pinsFor("branch_young").nonEmpty, "fresh lease must survive the horizon")

    // a LIVE branch's aged lease is never debris (branch exists)…
    val b = main.createBranch("live")
    val fork = main.currentSnapshotId
    pinsFor("branch_live").foreach(Files.setLastModifiedTime(_, old))
    Maintain.removeOrphanFiles(main, horizon)
    assert(pinsFor("branch_live").nonEmpty, "live branch lease is not debris")
    // …and a multi-hour audit heartbeats it: loading the handle and every
    // branch commit bump the lease mtime, so a pin-horizon expiry
    // (`ignorePinsOlderThanMs`) never mistakes the audit for a crashed
    // holder. (The orphan-GC walk above heartbeats too — it loads live
    // branch handles to walk their chains — so re-backdate before each.)
    def leaseAgeMs(): Long = pinsFor("branch_live")
      .map(q => System.currentTimeMillis() - Files.getLastModifiedTime(q).toMillis).min
    pinsFor("branch_live").foreach(Files.setLastModifiedTime(_, old))
    assert(leaseAgeMs() > 3600 * 1000L)
    main.branchTable("live")
    assert(leaseAgeMs() < 60 * 1000L, "branchTable load must heartbeat the lease")
    pinsFor("branch_live").foreach(Files.setLastModifiedTime(_, old))
    Ingest.applyBatch(spark, b)(BinlogRead.range(spark, binlog.toString, 200, 300),
      Ingest.branchBatchId("lh-ck", 0L))
    assert(leaseAgeMs() < 60 * 1000L, "branch commit must heartbeat the lease")
    // with the lease fresh, an aggressive pin-horizon expiry keeps the fork
    Ingest.applyBatch(spark, main)(BinlogRead.range(spark, binlog.toString, 300, 400), 1L)
    Maintain.expireSnapshots(main, keepLast = 1, ignorePinsOlderThanMs = 3600 * 1000L)
    assert(main.snapshotIds.contains(fork), "heartbeated fork survives pin-horizon expiry")
    assert(b.read(spark).count() > 0)
  }

  test("re-fork with a used checkpoint refused; path-traversing branch lookups rejected") {
    val p = GenProfile.uniformSmall().copy(partitions = 1, eventsPerPartition = 200)
    val binlog = tmpDir("rk-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 200)
    val root = tmpDir("rk-tbl")
    val ckpt = tmpDir("rk-ck").toString
    Ingest.startStream(spark, binlog.toString, root, ckpt,
      maxEventsPerBatch = 100, nBuckets = 4, branch = Some("audit")).awaitTermination()
    val main = LakeTable.load(root)
    assert(main.branchExists("audit"))
    // the branch is dropped after the stream ran — restarting on the SAME
    // checkpoint would re-fork and silently skip the already-read span
    // (hole-filled staging table); it must fail loudly instead
    assert(main.dropBranch("audit"))
    val e = intercept[IllegalArgumentException](Ingest.startStream(
      spark, binlog.toString, root, ckpt, branch = Some("audit")))
    assert(e.getMessage.contains("FRESH checkpoint"), e.getMessage)
    // lookups are charset-validated BEFORE touching the filesystem: '..'
    // would resolve meta/refs/../VERSION — main's own VERSION — and read
    // main while claiming a branch read
    assert(!main.branchExists(".."))
    assert(!main.branchExists("a/../b"))
    assert(!main.branchExists("main"))
    intercept[IllegalArgumentException](main.branchTable(".."))
  }

  test("guards: names validated, branch-handle misuse rejected, maintenance cadences refused") {
    val main = LakeTable.create(tmpDir("gd-tbl"), nBuckets = 4)
    intercept[IllegalArgumentException](main.createBranch("main"))
    intercept[IllegalArgumentException](main.createBranch("1234"))
    intercept[IllegalArgumentException](main.createBranch("a/b"))
    intercept[IllegalArgumentException](main.createBranch(""))
    intercept[IllegalArgumentException](main.branchTable("nope"))
    val b = main.createBranch("ok")
    intercept[IllegalArgumentException](main.createBranch("ok")) // exists
    intercept[IllegalArgumentException](b.createBranch("nested"))
    intercept[IllegalArgumentException](b.branchTable("ok"))
    intercept[IllegalArgumentException](b.publishBranch("ok"))
    intercept[IllegalArgumentException](b.dropBranch("ok"))
    intercept[IllegalArgumentException](b.createTag("t", b.currentSnapshotId))
    // a branch ingest stream must not run table-wide maintenance
    intercept[IllegalArgumentException](Ingest.startStream(spark,
      tmpDir("gd-bl").toString, main.root, tmpDir("gd-ck").toString,
      branch = Some("ok"), expireEveryBatches = 1))
    intercept[IllegalArgumentException](Ingest.startStream(spark,
      tmpDir("gd-bl2").toString, main.root, tmpDir("gd-ck2").toString,
      branch = Some("ok"), retainBinlogEveryBatches = 1))
    main.dropBranch("ok")
  }
}
