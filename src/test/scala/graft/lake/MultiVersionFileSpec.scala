package graft.lake

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Oracle, SparkSpec}
import graft.binlog.{ChangeEventGen, GenProfile}
import graft.cdc.Ingest

/** The engine's writers keep a one-version-per-url-per-file invariant, but
  * readers must not DEPEND on it (a pre-fix table, a foreign writer, a bug):
  * this spec hand-crafts a delta file holding TWO versions of each probed
  * url — winner first in one run, winner last in the other — and drives it
  * through every resolve path: the co-located catalog read
  * (GraftBucketReader), the co-located COW merge fold (KWayLwwIterator via
  * BucketMergeExec), and compaction (raw-mode resolve). Each must fold the
  * whole url run, not just the head row per file. */
class MultiVersionFileSpec extends SparkSpec {

  private val usPerSec = 1000000L

  test("readers LWW-resolve multiple versions of a url inside ONE file") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 1500)
    val binlog = tmpDir("mvf-bl")
    ChangeEventGen.writeSegments(p, binlog, segmentEvents = 750)
    val table = Ingest.replayBatch(spark, binlog.toString, tmpDir("mvf-tbl"),
      eventsPerBatch = 500, nBuckets = 8, mode = graft.cdc.Mor)
    // collapse to one base file per bucket so the crafted delta is the ONLY
    // second file in its bucket (the k-way paths engage per multi-file bucket)
    Maintain.compact(spark, table)
    val snap0 = table.currentSnapshot
    assert(snap0.files.groupBy(_.bucket).values.forall(_.size == 1))

    val before = table.read(spark).collect()
      .map(r => r.getAs[String]("url") ->
        ((r.getAs[Timestamp]("warc_ts"), r.getAs[String]("text")))).toMap
    val urls = before.keys.toSeq.sorted
    val (urlA, urlB) = (urls.head, urls(1))
    def bumped(u: String, s: Long) =
      new Timestamp(before(u)._1.getTime + s * 1000)

    // one delta file per bucket, each holding a two-version url run:
    //  urlA: live update at +1s, TOMBSTONE at +2s (winner), winner FIRST in
    //        file order (offset sort below) — expect urlA to disappear;
    //  urlB: tombstone at +1s, live update at +2s (winner), winner LAST —
    //        expect urlB to carry the new text.
    val schema = StructType(TableSchemas.v2.fields :+ StructField("bucket", IntegerType))
    def row(u: String, ts: Timestamp, html: Array[Byte], text: String,
        off: Long, del: Boolean): Row =
      Row(u, ts, html, if (del) null else text,
        if (del || html == null) null else html.length.toLong,
        "en", 9, off, del, LakeTable.bucketIdOf(u, snap0.nBuckets))
    val rows = Seq(
      row(urlA, bumped(urlA, 2), null, null, off = 10L, del = true), // winner
      row(urlA, bumped(urlA, 1), "<p>stale A</p>".getBytes, "stale A", off = 20L, del = false),
      row(urlB, bumped(urlB, 1), null, null, off = 10L, del = true),
      row(urlB, bumped(urlB, 2), "<p>new B</p>".getBytes, "new B", off = 20L, del = false)) // winner
    val crafted = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
      .repartition(1).sortWithinPartitions(col("url"), col("_seq_offset"))
    val files = table.writeDataFilesTo(crafted, "mvf-delta", TableSchemas.current)
    table.commitAppend(files.map(_.copy(tier = DataFile.TierDelta)), None)

    // path 1: co-located catalog read (GraftBucketReader run-drain)
    def state(): Map[String, String] = table.read(spark).collect()
      .map(r => r.getAs[String]("url") -> r.getAs[String]("text")).toMap
    val s1 = state()
    assert(!s1.contains(urlA), "tombstone inside a run must beat the live row before it")
    assert(s1(urlB) == "new B", s"live run row must beat the tombstone: got ${s1(urlB)}")
    assert(s1.size == before.size - 1)
    (urls.drop(2)).foreach(u => assert(s1(u) == before(u)._2))

    // path 2: co-located COW merge (KWayLwwIterator run-drain) — the batch
    // touches urlB's bucket, so its base + crafted delta k-way fold feeds
    // the merge; urlA's bucket stays multi-file and unread by the merge
    val batchSchema = StructType(Seq(
      StructField("partition", IntegerType, nullable = false),
      StructField("offset", LongType, nullable = false),
      StructField("op", StringType, nullable = false),
      StructField("url", StringType, nullable = false),
      StructField("warc_ts", TimestampType, nullable = false),
      StructField("html", BinaryType, nullable = true),
      StructField("lang", StringType, nullable = true)))
    val batch = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(0, 0L, "upsert", urlB, bumped(urlB, 3), "<p>cow B</p>".getBytes, "en")), 1), batchSchema)
    graft.cdc.Merge(spark, table, batch, batchId = 9999L,
      lineage = Seq(PartLineage(0, 0L, 1L, 1L)), mode = graft.cdc.Cow)
    val s2 = state()
    assert(!s2.contains(urlA))
    assert(s2(urlB) == "cow B")

    // path 3: compaction (raw-mode resolve) restores the invariant exactly
    Maintain.compact(spark, table)
    val snap2 = table.currentSnapshot
    assert(snap2.files.groupBy(_.bucket).values.forall(_.size == 1))
    val perUrl = table.readRaw(spark).groupBy(col("url")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(perUrl == 1L, s"compaction must emit one version per url, saw $perUrl")
    val s3 = state()
    assert(s3 == s2)
  }
}
