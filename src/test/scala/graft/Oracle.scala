package graft

import graft.binlog.{ChangeEventGen, GenProfile}
import graft.model.{ChangeEvent, TextExtract}

/** Pure-Scala, single-threaded last-writer-wins oracle (FIXTURES.md F4):
  * fold the full event log keeping, per url, the event with max
  * `(warc_ts, offset, partition)`; drop urls whose winner is a delete;
  * `text` = extractor(html). Engine output must equal this exactly,
  * including byte-identical `text`. */
object Oracle {
  final case class Winner(url: String, warcMicros: Long, offset: Long, partition: Int,
      op: String, html: Array[Byte], lang: String)

  def micros(t: java.sql.Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000

  def fold(events: Iterator[ChangeEvent]): Map[String, Winner] = {
    val ord = Ordering.Tuple3[Long, Long, Int]
    val m = scala.collection.mutable.HashMap.empty[String, Winner]
    events.foreach { e =>
      val cand = Winner(e.url, micros(e.warc_ts), e.offset, e.partition, e.op, e.html, e.lang)
      m.get(e.url) match {
        case Some(w) if ord.gteq((w.warcMicros, w.offset, w.partition),
          (cand.warcMicros, cand.offset, cand.partition)) => ()
        case _ => m(e.url) = cand
      }
    }
    m.toMap
  }

  /** Final table state: url → (warcMicros, text, lang, content_len). */
  def finalState(p: GenProfile): Map[String, (Long, String, String, Long)] =
    fold(ChangeEventGen.allEvents(p))
      .collect { case (url, w) if w.op == ChangeEvent.OpUpsert =>
        url -> ((w.warcMicros, TextExtract.extract(w.html), w.lang, w.html.length.toLong))
      }
}
