package graft.streaming

import graft.SparkSpec
import graft.binlog.{ChangeEventGen, GenProfile}
import graft.streaming.FlushWindows.{Chunk, EventLite}

/** The anchored flush window must reproduce, across micro-batch boundaries,
  * exactly what a single-threaded fold over each partition's stream decides
  * (≙ the reference's flush-interval IT, `S3SinkConnectorIT.java:235-312`:
  * the triggering record starts the NEXT file). */
class FlushWindowsSpec extends SparkSpec {

  test("streaming chunk boundaries equal the single-threaded fold oracle across batches") {
    val p = GenProfile.uniformSmall().copy(partitions = 2, eventsPerPartition = 3000)
    val dir = tmpDir("fw")
    ChangeEventGen.writeSegments(p, dir, segmentEvents = 1000)
    val intervalUs = 300L * 1000000 // 300 s of event time ≈ 300 events

    // small batches → state must survive many micro-batch boundaries
    FlushWindows.runToMemory(spark, dir.toString, intervalUs, "fw_out", maxEventsPerBatch = 800)
    val got = spark.table("fw_out").as[Chunk](org.apache.spark.sql.Encoders.product[Chunk])
      .collect().toSet

    val oracle = (0 until p.partitions).flatMap { part =>
      val evts = ChangeEventGen.events(p, part).map { e =>
        EventLite(part, e.offset, graft.Oracle.micros(e.warc_ts),
          if (e.html == null) 0L else e.html.length.toLong)
      }
      FlushWindows.foldEvents(evts, None, intervalUs)._1
    }.toSet

    assert(got.nonEmpty && got.size > 10, s"expected many chunks, got ${got.size}")
    assert(got == oracle,
      s"mismatch: extra=${(got -- oracle).take(3)}, missing=${(oracle -- got).take(3)}")
    // chunk chains are contiguous per partition (gap-free, like the index chain)
    (0 until p.partitions).foreach { part =>
      val chain = got.filter(_.partition == part).toSeq.sortBy(_.startOffset)
      chain.sliding(2).foreach {
        case Seq(a, b) => assert(b.startOffset == a.startOffset + a.numRecords)
        case _ =>
      }
    }
  }
}
