package graft.binlog

import java.nio.file.{Files, Path}

import graft.lake.LakeTable

/** Binlog RETENTION — the role Kafka's log retention plays for the
  * reference connector (kafka-connect-s3 tails a topic and trusts the
  * broker to truncate it; this engine's binlog directories otherwise grow
  * forever — at 10¹⁰ events the retained log IS the storage bill).
  *
  * The safe horizon is ENGINE-NATIVE: a table's exactly-once lineage
  * markers record precisely which offset ranges have been durably applied,
  * and the specs hold that chain gap-free per partition — so "the
  * contiguous applied prefix" is the exact point below which a segment can
  * never be read again by that consumer, even across checkpoint rewinds
  * (a rewind replays a committed batch, which the marker no-ops without
  * re-reading data). Multiple consumers of one directory take the
  * per-partition MINIMUM of their horizons ([[minHorizon]]).
  *
  * Deletion is crash/reader-safe by the listing protocol: the chunk INDEX
  * is unlinked first, and `index-present = committed`
  * ([[Segment.listAll]]), so a concurrent lister observes a mid-delete
  * segment as uncommitted and skips it — never a dangling index over
  * missing data. Consumers already tolerate truncated heads: a fresh query
  * anchors at the first AVAILABLE offset (`listStarts`), and a
  * checkpointed one plans only above its own committed offsets, which the
  * horizon guarantees are above everything deleted.
  */
object Retention {

  /** Per-partition contiguous applied prefix of a table's lineage chain:
    * the first offset NOT yet durably applied, i.e. everything below it is
    * replay-dead for this consumer. Runs are folded from the chain's own
    * head (not 0 — bootstrapped/handoff tables start above the cut).
    *
    * CONTRACT: valid only for a table whose lineage comes from ONE binlog
    * directory — the engine's single-streaming-writer-per-table rule (two
    * streams on one table would collide on checkpoint-epoch batch ids; SQL
    * commands and bootstrap sit in reserved id domains and commit lineage
    * = Nil, so they never pollute the horizon). A table fed by library-level
    * `applyBatch` calls with caller-synthesized envelopes, or by the
    * `graft-lake` sink (epoch-anchored synthetic offsets), has lineage in a
    * DIFFERENT offset space: computing a horizon from it and expiring some
    * unrelated directory would delete unread segments. Pass such tables'
    * horizons only for the directory their envelopes actually index. */
  def appliedHorizon(table: LakeTable): Map[Int, Long] =
    table.currentSnapshot.batches.flatMap(_.lineage)
      .groupBy(_.partition).map { case (p, rs) =>
        val sorted = rs.sortBy(_.startOffset)
        var end = sorted.head.startOffset
        sorted.foreach { r =>
          if (r.startOffset <= end) end = math.max(end, r.startOffset + r.count)
        }
        p -> end
      }

  /** Combine consumers: a partition is truncatable only below EVERY
    * consumer's horizon; a consumer with no lineage for a partition has
    * applied nothing of it, so the partition is withheld entirely. */
  def minHorizon(horizons: Seq[Map[Int, Long]]): Map[Int, Long] =
    horizons.flatMap(_.keySet).distinct.flatMap { p =>
      val vals = horizons.map(_.get(p))
      if (vals.forall(_.isDefined)) Some(p -> vals.flatten.min) else None
    }.toMap

  /** Delete every COMMITTED segment lying fully below the horizon
    * (`endOffset <= horizon(partition)`); straddling segments stay whole —
    * truncation is segment-granular, exactly like Kafka's. Index unlinked
    * before data (see object doc). Returns the number of segments removed. */
  def expireSegments(dir: Path, horizon: Map[Int, Long]): Int = {
    var n = 0
    Segment.listAll(dir).foreach { sf =>
      horizon.get(sf.partition).foreach { h =>
        if (sf.endOffset <= h) {
          Files.deleteIfExists(sf.indexPath): Unit
          Files.deleteIfExists(sf.path): Unit
          n += 1
        }
      }
    }
    n
  }

  /** One-call retention for the single-consumer case: truncate `dir` below
    * everything `table` has durably applied. */
  def expireApplied(table: LakeTable, dir: Path): Int =
    expireSegments(dir, appliedHorizon(table))

  /** [[expireSegments]] over an ARCHIVE tree in any layout (flat /
    * grouped_by_date / grouped_by_topic): horizons are keyed by
    * `(topic, partition)` because grouped_by_topic trees reuse partition
    * numbers across topics — a partition-only horizon would cross-truncate.
    * Same index-first unlink discipline; empty date/topic directories are
    * left in place (cheap, and a concurrent writer may be about to reuse
    * them). */
  def expireArchive(root: Path, layout: Layout,
      horizon: Map[(String, Int), Long]): Int = {
    var n = 0
    Layout.listUnder(root, layout).foreach { case (m, sf) =>
      horizon.get((m.topic, m.partition)).foreach { h =>
        if (sf.endOffset <= h) {
          Files.deleteIfExists(sf.indexPath): Unit
          Files.deleteIfExists(sf.path): Unit
          n += 1
        }
      }
    }
    n
  }
}
