package graft.cdc

import org.apache.spark.sql.functions._

import graft.{Oracle, SparkSpec}
import graft.binlog.{ChangeEventGen, GenProfile}
import graft.lake.LakeTable

/** Multi-topic consumption: one query per topic subdirectory, per-topic
  * remap, CONCURRENT queries on one session with uncorrupted exactly-once
  * lineage (the round-1 ADVICE hazard: the path-keyed registry let
  * concurrent queries clobber each other's planned ranges — token keying
  * must keep them separate even when both tail the same root). */
class TopicSetSpec extends SparkSpec {

  test("topic set ingests concurrently; per-topic remap; lineage uncorrupted") {
    val root = tmpDir("topics")
    val pA = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1500)
    val pB = GenProfile.uniformSmall(seed = 77L).copy(partitions = 3, eventsPerPartition = 1000)
    ChangeEventGen.writeSegments(pA, root.resolve("pages"), segmentEvents = 700)
    ChangeEventGen.writeSegments(pB, root.resolve("docs"), segmentEvents = 700)

    val work = tmpDir("topic-tables")
    val queries = Ingest.startTopicSet(spark, root.toString,
      topics = Seq("pages", "docs"),
      tableRootFor = t => work.resolve(t),
      checkpointRootDir = tmpDir("topic-ckpt").toString,
      remap = t => if (t == "docs") "docs_archive" else t,
      maxEventsPerBatch = 800, nBuckets = 8)
    assert(queries.keySet == Set("pages", "docs"))
    queries.values.foreach(_.awaitTermination())

    val pages = LakeTable.load(work.resolve("pages"))
    val docs = LakeTable.load(work.resolve("docs_archive"))

    // each table matches ITS topic's oracle exactly
    for ((table, profile) <- Seq((pages, pA), (docs, pB))) {
      val oracle = Oracle.finalState(profile)
      val got = table.read(spark).collect().map { r =>
        r.getAs[String]("url") -> Oracle.micros(r.getAs[java.sql.Timestamp]("warc_ts"))
      }.toMap
      assert(got.size == oracle.size)
      assert(got.forall { case (u, ts) => oracle(u)._1 == ts })
    }

    // lineage audit per table: gap-free per-partition chains covering
    // exactly that topic's offset space (cross-talk would break coverage)
    def audit(table: LakeTable, partitions: Int, perPartition: Long): Unit = {
      val byPart = table.currentSnapshot.batches.flatMap(_.lineage).groupBy(_.partition)
      assert(byPart.keySet == (0 until partitions).toSet)
      byPart.foreach { case (_, ls) =>
        val sorted = ls.sortBy(_.startOffset)
        assert(sorted.head.startOffset == 0L)
        sorted.sliding(2).foreach {
          case Seq(a, b) => assert(a.startOffset + a.count == b.startOffset)
          case _ =>
        }
        assert(sorted.map(_.count).sum == perPartition)
      }
    }
    audit(pages, pA.partitions, pA.eventsPerPartition)
    audit(docs, pB.partitions, pB.eventsPerPartition)
  }
}
