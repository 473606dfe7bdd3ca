package graft.lake

import java.nio.file.Files

import graft.{Oracle, SparkSpec}
import graft.binlog.{ChangeEventGen, GenProfile}

/** Optimistic-concurrency commits: a maintenance job (compaction) may run
  * concurrently with a merge-on-read ingest stream. Add-only commits rebase
  * over concurrent heads; replacement commits rebase over concurrent ADDs
  * and no-op cleanly when a competitor already replaced their inputs.
  * Correctness rests on resolve-on-read LWW commuting with any interleaving
  * (winner rows keep their (warc_ts, offset, partition) envelopes). */
class ConcurrencySpec extends SparkSpec {

  private def fakeFile(table: LakeTable, name: String, bucket: Int, rows: Long): DataFile = {
    val p = table.root.resolve(s"data/$name")
    Files.createDirectories(p.getParent)
    Files.write(p, Array[Byte](1))
    DataFile(s"data/$name", bucket, rows, "a", "z", TableSchemas.current, 1L)
  }

  test("commitAppend rebases over a concurrent commit; exactly-once marker honored") {
    val table = LakeTable.create(tmpDir("cc-app"), nBuckets = 4)
    val a = fakeFile(table, "a.parquet", 0, 10L)
    val b = fakeFile(table, "b.parquet", 1, 5L)
    // stale-head interleaving: a competitor commits while our append is in flight
    val snap0 = table.currentSnapshot
    table.commit(snap0.copy(snapshotId = 1L, parentId = 0L, files = Vector(a), totalRows = 10L))
    val next = table.commitAppend(Seq(b),
      Some(BatchMarker(7L, Seq(PartLineage(0, 0L, 5L, 5L)), 5L, 0L)))
    assert(next.snapshotId == 2L && next.parentId == 1L)
    assert(next.files.map(_.path).toSet == Set("data/a.parquet", "data/b.parquet"))
    assert(next.totalRows == 15L && next.committedBatchIds.contains(7L))
    // replaying the same batch id is a no-op returning the head unchanged
    val again = table.commitAppend(Seq(fakeFile(table, "dup.parquet", 0, 1L)),
      Some(BatchMarker(7L, Nil, 1L, 0L)))
    assert(again.snapshotId == next.snapshotId && again.files == next.files)
  }

  test("commitReplace rebases over concurrent adds; no-ops when inputs vanished") {
    val table = LakeTable.create(tmpDir("cc-rep"), nBuckets = 4)
    val a = fakeFile(table, "a.parquet", 0, 10L)
    val b = fakeFile(table, "b.parquet", 1, 5L)
    val snap0 = table.currentSnapshot
    table.commit(snap0.copy(snapshotId = 1L, parentId = 0L, files = Vector(a, b), totalRows = 15L))

    // a competitor APPENDS d while our compaction (a → c) is writing
    val d = fakeFile(table, "d.parquet", 0, 2L)
    table.commitAppend(Seq(d), None)
    val c = fakeFile(table, "c.parquet", 0, 10L)
    val next = table.commitReplace(Seq(a), Seq(c))
    assert(next.files.map(_.path).toSet ==
      Set("data/b.parquet", "data/d.parquet", "data/c.parquet"),
      s"concurrent add must survive the replacement rebase: ${next.files.map(_.path)}")
    assert(next.totalRows == 17L)

    // a second compactor targeting the SAME input (a — now gone) must no-op
    // and remove its own output from disk
    val e = fakeFile(table, "e.parquet", 0, 10L)
    val after = table.commitReplace(Seq(a), Seq(e))
    assert(after.snapshotId == next.snapshotId, "vanished input → head unchanged")
    assert(!Files.exists(table.root.resolve("data/e.parquet")), "orphan output deleted")
  }

  test("MOR ingest with CONCURRENT compaction loop equals the oracle") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 3000)
    val binlog = tmpDir("cc-binlog")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 1000, chunkThreshold = 64 * 1024)
    val tblDir = tmpDir("cc-tbl").resolve("t")

    @volatile var stop = false
    @volatile var compactions = 0
    @volatile var maintErr: Throwable = null
    val maint = new Thread(() => {
      try {
        while (!stop) {
          if (LakeTable.exists(tblDir)) {
            val t = LakeTable.load(tblDir)
            if (t.currentSnapshot.files.nonEmpty) {
              Maintain.compact(spark, t)
              compactions += 1
            }
          }
          Thread.sleep(50)
        }
      } catch { case e: Throwable => maintErr = e }
    }, "cc-maintenance")
    maint.start()
    val table =
      try graft.cdc.Ingest.replayBatch(spark, binlog.toString, tblDir,
        eventsPerBatch = 300, nBuckets = 8, mode = graft.cdc.Mor)
      finally { stop = true; maint.join(30000) }
    assert(maintErr == null, s"maintenance thread failed: $maintErr")
    assert(compactions > 0, "interleaving never happened — weaken the sleep")

    // final state identical to the single-writer oracle, byte-identical text
    val oracle = Oracle.finalState(p)
    val got = table.read(spark).collect().map { r =>
      r.getAs[String]("url") -> ((Oracle.micros(r.getAs[java.sql.Timestamp]("warc_ts")),
        r.getAs[String]("text")))
    }.toMap
    assert(got.size == oracle.size,
      s"engine=${got.size} oracle=${oracle.size}")
    oracle.foreach { case (url, (ts, text, _, _)) =>
      assert(got(url)._1 == ts, s"warc_ts mismatch at $url")
      assert(got(url)._2 == text, s"text not byte-identical at $url")
    }
    // exactly-once audit intact: every batch marker present, lineage gap-free
    val lin = table.currentSnapshot.batches.flatMap(_.lineage)
    (0 until p.partitions).foreach { part =>
      val runs = lin.filter(_.partition == part).sortBy(_.startOffset)
      runs.sliding(2).foreach {
        case Seq(x, y) => assert(y.startOffset == x.startOffset + x.count)
        case _ =>
      }
      assert(runs.map(_.count).sum == p.eventsPerPartition)
    }
  }
}
