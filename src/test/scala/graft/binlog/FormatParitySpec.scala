package graft.binlog

import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.model.ChangeEvent

/** Reference format/layout parity added in round 2:
  *  - header as its own gzip chunk with index byteOffset skip
  *    (≙ BlockGZIPFileWriterTest.java:42-72 header case);
  *  - grouped_by_date / grouped_by_topic layouts + date-pruned listing
  *    (≙ GroupedByDateLayout/GroupedByTopicLayout);
  *  - option-driven codec selection with aliases (≙ Configure.createFormat).
  */
class FormatParitySpec extends SparkSpec {

  private def ev(p: Int, o: Long): ChangeEvent =
    ChangeEvent(p, o, ChangeEvent.OpUpsert, s"https://x/$o",
      new Timestamp(1700000000000L + o), s"<b>doc $o</b>\nwith newline".getBytes(StandardCharsets.UTF_8), "en")

  test("header written as its own gzip member; chunks skip it; records unaffected") {
    val dir = tmpDir("hdr")
    val header = """{"format":"framed","version":2}""".getBytes(StandardCharsets.UTF_8)
    val w = new SegmentWriter(dir, 0, 0L, chunkThreshold = 64, header = header)
    (0L until 50L).foreach(o => w.writeEvent(ev(0, o)))
    val idx = w.close()
    // the first data chunk starts AFTER the header member
    assert(idx.chunks.head.byteOffset > 0)
    val f = Segment.list(dir, 0).head
    assert(Segment.readHeader(f).sameElements(header))
    // mid-file resume still lands on the right records (range math unaffected)
    val got = Segment.read(f, 17L).map(_.offset).toVector
    assert(got == (17L until 50L).toVector)
    // a headerless segment reports an empty header
    val w2 = new SegmentWriter(dir, 1, 0L)
    (0L until 5L).foreach(o => w2.writeEvent(ev(1, o)))
    w2.close()
    assert(Segment.readHeader(Segment.list(dir, 1).head).isEmpty)
  }

  test("grouped_by_date and grouped_by_topic layouts round-trip; listing prunes dates") {
    import org.apache.spark.sql.functions._
    val events = (0L until 300L).map(o => ev((o % 2).toInt, o / 2))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(events, 2))
      .select(col("partition"), col("offset"), col("op"), col("url"),
        col("warc_ts"), col("html"), col("lang"))

    for ((layout, name) <- Seq(Layout.GroupedByDate -> "bydate", Layout.GroupedByTopic -> "bytopic")) {
      val dest = tmpDir(s"arch-$name")
      Archive.archiveBatch(spark, dest, segmentEvents = 40, chunkThreshold = 1 << 20,
        layout = layout, topic = "pages", date = "2026-08-17")(df, 0L)
      val listed = Layout.listUnder(dest, layout)
      assert(listed.nonEmpty)
      assert(listed.forall(_._1.topic == "pages"))
      // read everything back through the layout listing — content identical
      val back = listed.flatMap { case (_, sf) => Segment.read(sf, sf.startOffset) }
      assert(back.map(e => (e.partition, e.offset)).sorted ==
        events.map(e => (e.partition, e.offset)).sorted)
      // date pruning skips the only date dir → nothing listed, no file touched
      assert(Layout.listUnder(dest, layout, dateFilter = _ < "2026-01-01").isEmpty)
      assert(Layout.listUnder(dest, layout, dateFilter = _ >= "2026-01-01").size == listed.size)
    }
  }

  test("reference-style path shapes parse back to (topic, partition, startOffset)") {
    assert(Layout.GroupedByDate.parse("2026-08-17/pages-00003-000000000120.gz")
      .contains(BlockMeta("pages", 3, 120L)))
    assert(Layout.GroupedByTopic.parse("pages/2026-08-17/00003-000000000120.gz")
      .contains(BlockMeta("pages", 3, 120L)))
    assert(Layout.Flat.parse("p00003-000000000120.gz").contains(BlockMeta("", 3, 120L)))
    assert(Layout.GroupedByDate.parse("junk.gz").isEmpty)
  }

  test("codec registry: aliases resolve; delimited round-trips binary payloads via source options") {
    assert(CodecSpec(name = "binary").codec == FramedCodec)
    assert(CodecSpec(name = "text").codec.isInstanceOf[DelimitedEventCodec])
    intercept[IllegalArgumentException](CodecSpec(name = "nope").codec)

    // archive with the delimited codec, read back through the DSv2 source
    // with format options — payloads contain raw newlines (base64-safe)
    import org.apache.spark.sql.functions._
    val events = (0L until 100L).map(o => ev((o % 2).toInt, o / 2))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(events, 2))
      .select(col("partition"), col("offset"), col("op"), col("url"),
        col("warc_ts"), col("html"), col("lang"))
    val dest = tmpDir("arch-delim")
    Archive.archiveBatch(spark, dest, segmentEvents = 1000, chunkThreshold = 1 << 20,
      codecSpec = CodecSpec(name = "delimited"))(df, 0L)
    val back = spark.read.format("graft.binlog.BinlogSourceProvider")
      .option("path", dest.toString)
      .option("format", "delimited")
      .load()
    assert(back.count() == 100)
    val html = back.filter(col("url") === "https://x/7").select(col("html")).head().getAs[Array[Byte]](0)
    assert(new String(html, StandardCharsets.UTF_8) == "<b>doc 7</b>\nwith newline")
    // reading delimited bytes with the framed codec must fail loudly, not
    // return garbage (corrupt-record error semantics)
    intercept[Exception] {
      spark.read.format("graft.binlog.BinlogSourceProvider")
        .option("path", dest.toString).load().count()
    }
  }
}
