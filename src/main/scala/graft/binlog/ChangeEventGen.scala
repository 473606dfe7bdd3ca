package graft.binlog

import java.nio.charset.StandardCharsets
import java.nio.file.Path
import java.sql.Timestamp

import scala.collection.parallel.CollectionConverters._

import graft.model.ChangeEvent
import graft.util.Rng

/** Deterministic Common-Crawl-style change-stream generator (FIXTURES.md F1).
  *
  * Every event is a pure function of `(seed, partition, offset)` via
  * SplitMix64 — splittable per record, no shared state, no wall clock — so
  * the same profile yields identical bytes on every run and at any
  * parallelism, satisfying "synthesise it deterministically; no external
  * data".
  *
  * Skew: domains are drawn from a Zipf(s) pool — the hot-domain skew the
  * north rule requires the engine to defuse. Urls are sticky to a partition
  * (producer-side keyed partitioning, like Kafka's default partitioner).
  */
final case class GenProfile(
    name: String,
    seed: Long,
    partitions: Int,
    eventsPerPartition: Long,
    urlPoolPerPartition: Int, // duplicates arise when pool < events
    domains: Int = 1000,
    zipfS: Double = 1.2,
    deleteRatio: Double = 0.10,
    lateRatio: Double = 0.05, // out-of-order warc_ts
    tieRatio: Double = 0.02, // exact (warc_ts) duplicates
    htmlMeanBytes: Int = 900,
    // schema evolution: events with offset < v2FromOffset are emitted as v1
    // (no lang column on the wire)
    v2FromFraction: Double = 0.0,
    // KEY skew: when > 0, the url id itself is Zipf-drawn, so a handful of
    // urls receive a large share of all events (hot-KEY test, beyond the
    // hot-DOMAIN string skew of `zipfS`)
    keyZipfS: Double = 0.0)

object GenProfile {
  /** 2 partitions × 5k events, ~30% duplicate urls, 10% deletes. */
  def uniformSmall(seed: Long = 42L): GenProfile =
    GenProfile("uniform-small", seed, partitions = 2, eventsPerPartition = 5000,
      urlPoolPerPartition = 3500, domains = 200, zipfS = 0.0)
  /** Zipf-skewed domains; top domain ~20% of events. */
  def skewed(seed: Long = 42L, partitions: Int = 8, perPartition: Long = 100000): GenProfile =
    GenProfile("skewed", seed, partitions, perPartition,
      urlPoolPerPartition = math.max(1, (perPartition / 2).toInt), domains = 1000, zipfS = 1.2)
  /** First 40% of each partition emits wire-schema v1 (no lang). */
  def evolving(seed: Long = 42L): GenProfile =
    GenProfile("evolving", seed, partitions = 2, eventsPerPartition = 5000,
      urlPoolPerPartition = 3500, v2FromFraction = 0.4)
  /** Hot KEYS: a few urls own a large share of all events (Zipf s=1.3 over
    * the url pool) — exercises salted dedup and reducer skew. */
  def hotKeys(seed: Long = 42L, partitions: Int = 4, perPartition: Long = 5000): GenProfile =
    GenProfile("hot-keys", seed, partitions, perPartition,
      urlPoolPerPartition = math.max(1, perPartition.toInt / 2), zipfS = 0.0, keyZipfS = 1.3)

  /** Dense ties and delete/upsert races on a tiny key pool. */
  def adversarialOrder(seed: Long = 42L): GenProfile =
    GenProfile("adversarial-order", seed, partitions = 4, eventsPerPartition = 2000,
      urlPoolPerPartition = 50, deleteRatio = 0.3, tieRatio = 0.5, zipfS = 0.0)
}

object ChangeEventGen {
  private val langs = Array("en", "de", "fr", "es", "ja", "zh", "ru", "pt", "it", "nl")
  private val words = Array(
    "stream", "table", "merge", "offset", "commit", "snapshot", "replay", "batch",
    "shard", "vector", "crawl", "index", "page", "anchor", "footer", "header",
    "article", "section", "quote", "amp", "data", "lake", "spark", "scala")
  private val baseMicros = 1700000000000000L // 2023-11-14T22:13:20Z, fixed epoch

  /** The url key space: partition-sticky, Zipf-skewed domain. */
  def url(p: GenProfile, partition: Int, urlId: Int): String = {
    val zipf = zipfFor(p)
    val domain = zipf.sample(Rng.key(p.seed, 0x0d0d, partition.toLong, urlId.toLong))
    s"https://d$domain.example.org/p$partition/doc$urlId"
  }

  // Zipf tables are deterministic per (domains, s); cache per profile shape.
  private val zipfCache = new java.util.concurrent.ConcurrentHashMap[(Int, Long), Rng.Zipf]()
  private def zipfFor(p: GenProfile): Rng.Zipf = {
    val s = if (p.zipfS <= 0.0) 0.0001 else p.zipfS
    zipfCache.computeIfAbsent((p.domains, java.lang.Double.doubleToLongBits(s)),
      _ => new Rng.Zipf(p.domains, s))
  }
  private def keyZipf(p: GenProfile): Rng.Zipf =
    zipfCache.computeIfAbsent((p.urlPoolPerPartition, java.lang.Double.doubleToLongBits(p.keyZipfS)),
      _ => new Rng.Zipf(p.urlPoolPerPartition, p.keyZipfS))

  /** Deterministic pseudo-HTML for (url, version): the payload whose
    * extraction must be byte-identical under replay. Includes tags, a
    * script block, entities and multi-byte chars so the extractor is
    * actually exercised. */
  def html(url: String, version: Long, seed: Long, meanBytes: Int): Array[Byte] = {
    val k0 = Rng.key(seed, 0x17a6, url.hashCode.toLong, version)
    val nWords = 20 + Rng.nextInt(Rng.mix64(k0), math.max(1, meanBytes / 6))
    val sb = new StringBuilder(nWords * 8 + 256)
    sb.append("<html><head><title>").append(url).append(" v").append(version)
      .append("</title><script>var x=").append(version).append(";</script></head><body>")
    var i = 0
    while (i < nWords) {
      val wk = Rng.key(k0, i.toLong)
      if (i % 17 == 5) sb.append("<p class=\"s\">")
      sb.append(words(Rng.nextInt(wk, words.length)))
      if (i % 23 == 7) sb.append(" &amp; café &#8212;")
      sb.append(' ')
      i += 1
    }
    sb.append("</body></html>")
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Generate event (partition, offset) of a profile. Pure function. */
  def event(p: GenProfile, partition: Int, offset: Long): ChangeEvent = {
    val k = Rng.key(p.seed, partition.toLong, offset)
    val urlId =
      if (p.keyZipfS > 0) keyZipf(p).sample(Rng.key(k, 1))
      else Rng.nextInt(Rng.key(k, 1), p.urlPoolPerPartition)
    val u = url(p, partition, urlId)
    val isDelete = Rng.uniform(Rng.key(k, 2)) < p.deleteRatio
    // warc_ts: base + offset seconds, ± jitter; some late, some exact ties
    val r = Rng.uniform(Rng.key(k, 3))
    val micros =
      if (r < p.tieRatio) baseMicros + (offset / 10) * 10000000L // deliberate exact ties
      else if (r < p.tieRatio + p.lateRatio) baseMicros + math.max(0L, offset - 500) * 1000000L // late
      else baseMicros + offset * 1000000L + Rng.nextInt(Rng.key(k, 4), 1000000).toLong
    val ts = new Timestamp(micros / 1000)
    ts.setNanos(((micros % 1000000) * 1000).toInt)
    val lang = langs(Rng.nextInt(Rng.key(k, 5), langs.length))
    if (isDelete)
      ChangeEvent(partition, offset, ChangeEvent.OpDelete, u, ts, null, lang)
    else
      ChangeEvent(partition, offset, ChangeEvent.OpUpsert, u, ts,
        html(u, offset, p.seed, p.htmlMeanBytes), lang)
  }

  /** Wire schema version for (profile, offset) — `evolving` profile emits v1
    * for the first `v2FromFraction` of the stream. */
  def wireVersion(p: GenProfile, offset: Long): Byte =
    if (p.v2FromFraction > 0 && offset < (p.eventsPerPartition * p.v2FromFraction).toLong)
      EventCodec.V1
    else EventCodec.V2

  def events(p: GenProfile, partition: Int): Iterator[ChangeEvent] =
    Iterator.range(0L, p.eventsPerPartition).map(o => event(p, partition, o))

  def allEvents(p: GenProfile): Iterator[ChangeEvent] =
    Iterator.range(0, p.partitions).flatMap(events(p, _))

  /** Materialize a profile as binlog segment files under `dir`, rolling
    * segments every `segmentEvents` records. Single-threaded per partition
    * (offsets must be contiguous); partitions in parallel. */
  def writeSegments(p: GenProfile, dir: Path, segmentEvents: Long = 2000,
      chunkThreshold: Long = 256 * 1024): Unit = {
    (0 until p.partitions).par.foreach { part =>
      var off = 0L
      while (off < p.eventsPerPartition) {
        val w = new SegmentWriter(dir, part, off, chunkThreshold)
        val end = math.min(off + segmentEvents, p.eventsPerPartition)
        while (off < end) {
          w.writeEvent(event(p, part, off), wireVersion(p, off))
          off += 1
        }
        w.close()
      }
    }
  }
}
