package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The persisted incremental MinHash-LSH index: batch-at-a-time
  * probe-then-append must find exactly the pairs the one-shot band pipeline
  * finds across the same split, the probe plan must partition-prune the
  * index read and broadcast the probes, and the hot-bucket cap must bound
  * probe fan-out. */
class LshIndexSpec extends SparkSpec {
  private val dir = sfDir("0.01")
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private val P = LshIndex.Params(n = 3, bands = 4, rowsPerBand = 2, shards = 16)

  test("incremental probe-then-append over 4 batches == one-shot cross pairs") {
    val idx = tmpDir("lshidx")
    LshIndex.create(idx, P)
    // 4 batches by doc_id % 4; probe each against everything appended before
    val got = scala.collection.mutable.Set.empty[(Long, Long, Double)]
    (0 until 4).foreach { b =>
      val batch = docs.filter(pmod(col("doc_id"), lit(4)) === b)
      val hits = LshIndex.probeAndAppend(spark, batch, "text", "doc_id", idx)
      hits.collect().foreach(r => got += ((r.getLong(0), r.getLong(1), r.getDouble(2))))
    }
    // reference: ALL-pairs signature-match via the one-shot pipeline, each
    // unordered pair counted once — the union of per-batch cross hits must
    // equal all pairs whose members landed in DIFFERENT batches, plus none
    // within one batch (a batch is never probed against itself)
    val sigs = DedupOps.withMinhashes(
      docs.select(col("doc_id").as("id"), col("text").as("txt")), "txt", P.n, P.k)
      .filter(col("mh0").isNotNull)
    val bandCol = (a: String) => (0 until P.bands).map { b =>
      struct(lit(b).as("band"),
        md5(to_binary(concat_ws("|", (0 until P.rowsPerBand).map(r =>
          col(s"$a.mh${b * P.rowsPerBand + r}")): _*), lit("utf-8"))).as("bucket"))
    }
    val bands = sigs.select(col("id"), explode(array((0 until P.bands).map { b =>
      struct(lit(b).as("band"),
        md5(to_binary(concat_ws("|", (0 until P.rowsPerBand).map(r =>
          col(s"mh${b * P.rowsPerBand + r}")): _*), lit("utf-8"))).as("bucket"))
    }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    val matchFrac = {
      val eq = (0 until P.k).map(i =>
        when(col(s"x.mh$i") === col(s"y.mh$i"), 1).otherwise(0)).reduce(_ + _)
      round(eq.cast("double") / lit(P.k.toDouble), 4)
    }
    val allPairs = bands.alias("a").join(bands.alias("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") =!= col("b.id"))
      .select(col("a.id").as("i1"), col("b.id").as("i2")).distinct()
      .join(sigs.alias("x"), col("i1") === col("x.id"))
      .join(sigs.alias("y"), col("i2") === col("y.id"))
      .select(col("i1"), col("i2"), matchFrac.as("frac"))
      .filter(col("frac") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val crossExpected = allPairs.filter { case (i1, i2, _) =>
      (i1 % 4) != (i2 % 4) && (i1 % 4) > (i2 % 4) // probe batch b sees earlier batches
    }.map { case (i1, i2, f) => (i1, i2, f) }.toSet
    assert(got.nonEmpty, "testdata should contain cross-batch near-dups")
    assert(got.toSet == crossExpected,
      s"incremental hits must equal one-shot cross pairs (got ${got.size}, want ${crossExpected.size})")
  }

  test("probe plan: index read is partition-pruned and probes are broadcast") {
    val idx = tmpDir("lshplan")
    LshIndex.create(idx, P)
    LshIndex.append(docs.filter(pmod(col("doc_id"), lit(5)) =!= 0), "text", "doc_id", idx)
    // a tiny probe batch touches few shards
    val probe = docs.filter(col("doc_id") < 25)
    val out = LshIndex.nearDupsOf(spark, probe, "text", "doc_id", idx, minMatchFrac = 0.0)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("pb#"),
      s"index scan must carry a pb partition filter:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"probe side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"the index must not be shuffled by a probe:\n$plan")
    out.collect(): Unit
  }

  test("params survive reload; append validates against stored shape") {
    val idx = tmpDir("lshparams")
    LshIndex.create(idx, LshIndex.Params(n = 2, bands = 3, rowsPerBand = 4, shards = 8))
    val p = LshIndex.load(idx)
    assert(p == LshIndex.Params(2, 3, 4, 8) && p.k == 12)
    intercept[IllegalArgumentException] {
      LshIndex.create(idx, P) // double create refused
    }
  }

  test("span-keyed appends are replay-idempotent; caps count DISTINCT ids") {
    import spark.implicits._
    val boiler = (0L until 50L)
      .map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val probe = Seq((9000L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    // span-keyed: replaying the SAME span overwrites instead of duplicating
    val idx = tmpDir("lshspan")
    LshIndex.create(idx, P)
    LshIndex.append(boiler, "text", "doc_id", idx, span = Some("0-1"))
    val bands = idx.resolve("bands").toString
    val n1 = spark.read.parquet(bands).count()
    LshIndex.append(boiler, "text", "doc_id", idx, span = Some("0-1")) // crash-replay
    val n2 = spark.read.parquet(bands).count()
    assert(n2 == n1, s"replayed span must overwrite its rows (got $n2, want $n1)")
    // the bucket holds exactly cap-many distinct ids — must NOT be dropped
    val hits = LshIndex.nearDupsOf(spark, probe, "text", "doc_id", idx,
      minMatchFrac = 0.5, maxBucketSize = 50).count()
    assert(hits == 50L, s"near-cap bucket dropped after replay (got $hits)")
    // ad-hoc (non-keyed) double-append DOES duplicate rows — the DISTINCT-id
    // cap still keeps the bucket where a row-count cap would silently drop it
    val idx2 = tmpDir("lshadhoc")
    LshIndex.create(idx2, P)
    LshIndex.append(boiler, "text", "doc_id", idx2)
    LshIndex.append(boiler, "text", "doc_id", idx2)
    assert(spark.read.parquet(idx2.resolve("bands").toString).count() == 2 * n1)
    val got2 = LshIndex.nearDupsOf(spark, probe, "text", "doc_id", idx2,
      minMatchFrac = 0.5, maxBucketSize = 50).count()
    assert(got2 == 50L, s"replay-inflated bucket must survive the distinct-id cap (got $got2)")
  }

  test("span tags are validated, not rewritten; the ad-hoc tag is reserved") {
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val idx = tmpDir("lshtags")
    LshIndex.create(idx, P)
    // a lossy sanitize would collapse 'a/b', 'a b', 'a_b' onto ONE span dir —
    // overwrite semantics then silently delete another span's rows; tags
    // outside the safe charset must be REJECTED instead
    for (bad <- Seq("a/b", "a b", "a=b", "", "a\tb"))
      intercept[IllegalArgumentException] {
        LshIndex.append(docs, "text", "doc_id", idx, span = Some(bad))
      }
    // a keyed append under the reserved ad-hoc tag would OVERWRITE the whole
    // accumulated un-keyed history
    intercept[IllegalArgumentException] {
      LshIndex.append(docs, "text", "doc_id", idx, span = Some("adhoc"))
    }
    // nothing was written by the rejected calls; valid tags still work and
    // coexist with ad-hoc appends
    LshIndex.append(docs, "text", "doc_id", idx, span = Some("a_b-1.0"))
    LshIndex.append(docs, "text", "doc_id", idx) // un-keyed accumulator
    val spans = java.nio.file.Files.list(idx.resolve("bands")).iterator()
    val names = Iterator.continually(spans).takeWhile(_.hasNext).map(_.next().getFileName.toString).toSet
    assert(names == Set("span=a_b-1.0", "span=adhoc"), s"got $names")
  }

  test("hot-bucket cap bounds probe fan-out on the pruned slice") {
    import spark.implicits._
    val idx = tmpDir("lshhot")
    LshIndex.create(idx, P)
    // 200 identical boilerplate docs + 2 genuinely similar rare docs
    val boiler = (0L until 200L).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    val rare = Seq(
      (1000L, "rare unique text body alpha beta gamma delta epsilon zeta"),
      (1001L, "rare unique text body alpha beta gamma delta epsilon eta"))
    LshIndex.append((boiler ++ rare).toDF("doc_id", "text"), "text", "doc_id", idx)
    val probeBoiler = Seq((5000L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("doc_id", "text")
    val probeRare = Seq((5001L, "rare unique text body alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    // capped: the viral bucket is dropped, so the boilerplate probe fans out to 0
    val cappedHits = LshIndex.nearDupsOf(spark, probeBoiler, "text", "doc_id", idx,
      minMatchFrac = 0.5, maxBucketSize = 50).count()
    assert(cappedHits == 0, s"viral bucket must be dropped under the cap (got $cappedHits)")
    // the rare probe still matches through its (small) buckets
    val rareHits = LshIndex.nearDupsOf(spark, probeRare, "text", "doc_id", idx,
      minMatchFrac = 0.5, maxBucketSize = 50).count()
    assert(rareHits >= 1, "rare-bucket matches must survive the cap")
    // uncapped: the boilerplate probe matches all 200
    val uncapped = LshIndex.nearDupsOf(spark, probeBoiler, "text", "doc_id", idx,
      minMatchFrac = 0.5, maxBucketSize = 0).count()
    assert(uncapped == 200L)
  }

  test("empty-batch append returns 0 and leaves the index usable") {
    // a curation span whose docs ALL fail the quality gate appends an empty
    // batch — the observed row count must resolve to 0 (not hang or throw),
    // and later appends/probes must be unaffected
    import spark.implicits._
    val idx = tmpDir("lsh-empty")
    LshIndex.create(idx, P)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(LshIndex.append(empty, "text", "doc_id", idx, span = Some("0-1")) == 0L)
    val one = Seq((1L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    assert(LshIndex.append(one, "text", "doc_id", idx, span = Some("1-2")) > 0L)
    assert(LshIndex.nearDupsOf(spark, one, "text", "doc_id", idx).count() >= 0L)
  }

  test("span compaction: one span out, probes unchanged, exact dups removed") {
    val idx = tmpDir("lshcmp")
    LshIndex.create(idx, P)
    (0 until 4).foreach { b =>
      LshIndex.append(docs.filter(pmod(col("doc_id"), lit(4)) === b),
        "text", "doc_id", idx, span = Some(s"$b-${b + 1}")): Unit
    }
    val probe = docs.filter(col("doc_id") < 50)
    def hits() = LshIndex.nearDupsOf(spark, probe, "text", "doc_id", idx,
      minMatchFrac = 0.0).collect().map(_.toString).sorted.toSeq
    val before = hits()
    val rowsBefore = spark.read.parquet(idx.resolve("bands").toString).count()
    assert(LshIndex.spanTags(idx).size == 4)
    // self-read guard: the output span must not be an input
    intercept[IllegalArgumentException] {
      LshIndex.compactSpans(spark, idx, LshIndex.spanTags(idx), "0-1")
    }
    val n = LshIndex.compactSpans(spark, idx, LshIndex.spanTags(idx), "cmp-4-0")
    assert(n == rowsBefore, s"fold must keep every row (got $n, want $rowsBefore)")
    assert(LshIndex.spanTags(idx) == Seq("cmp-4-0"), "inputs deleted, one span left")
    assert(hits() == before, "probe results must be unchanged by compaction")
    // a crashed fold's leftovers are EXACT duplicate rows across two spans —
    // the fold's full-row distinct removes them (and only them)
    val dupDocs = docs.filter(col("doc_id") < 100)
    val nA = LshIndex.append(dupDocs, "text", "doc_id", idx, span = Some("dup-a"))
    LshIndex.append(dupDocs, "text", "doc_id", idx, span = Some("dup-b")): Unit
    // an empty span dir (all docs gated out) folds away without breaking the read
    LshIndex.append(dupDocs.limit(0), "text", "doc_id", idx, span = Some("dup-e")): Unit
    val n2 = LshIndex.compactSpans(spark, idx, Seq("dup-a", "dup-b", "dup-e"), "cmp-5-0")
    assert(n2 == nA, s"exact dup rows must fold to one copy (got $n2, want $nA)")
    assert(LshIndex.spanTags(idx) == Seq("cmp-4-0", "cmp-5-0"))
  }

  test("crashed-fold leftovers self-heal: staged-only dirs are invisible and fold away") {
    import java.nio.file.Files
    // a fold that crashes mid-write leaves its output span holding ONLY
    // committer staging (_temporary/**.parquet) — Spark reads filter those
    // out, so the emptiness checks must match Spark's visibility rule, not
    // Files.walk: misclassifying the dir as non-empty wedges every retry
    def forgeStaged(idx: java.nio.file.Path, tag: String): Unit = {
      val d = idx.resolve(s"bands/span=$tag/_temporary/0")
      Files.createDirectories(d)
      Files.write(d.resolve("part-0.parquet"), Array[Byte](1, 2, 3)): Unit
    }
    val probe = docs.filter(col("doc_id") < 25)
    // fresh index whose ONLY span is staged-only: probes must take the
    // empty-corpus path, not fail schema inference
    val idx0 = tmpDir("lshstage0")
    LshIndex.create(idx0, P)
    forgeStaged(idx0, "cmp-1-0")
    assert(LshIndex.nearDupsOf(spark, probe, "text", "doc_id", idx0).count() == 0)
    // populated index + staged-only leftover: probes ignore it, and a fold
    // with it among the inputs removes it and proceeds
    val idx = tmpDir("lshstage")
    LshIndex.create(idx, P)
    LshIndex.append(docs.filter(col("doc_id") < 200), "text", "doc_id", idx,
      span = Some("0-1")): Unit
    forgeStaged(idx, "cmp-1-0")
    assert(LshIndex.nearDupsOf(spark, probe, "text", "doc_id", idx,
      minMatchFrac = 0.0).count() > 0)
    val n = LshIndex.compactSpans(spark, idx, Seq("0-1", "cmp-1-0"), "cmp-1-1")
    assert(n > 0)
    assert(LshIndex.spanTags(idx) == Seq("cmp-1-1"),
      s"staged-only dir must fold away (got ${LshIndex.spanTags(idx)})")
  }

  test("legacy-layout index: writes and probes fail fast; rebuild migrates") {
    import spark.implicits._
    // forge a pre-versioning index: params.json without `layout` (old trees
    // hold flat bands/pb=… dirs with hex-string sigs — one new span-keyed
    // long-sig append would brick every subsequent read, so the guard must
    // fire BEFORE any file lands)
    val idx = tmpDir("lsh-legacy").resolve("index")
    java.nio.file.Files.createDirectories(idx)
    java.nio.file.Files.write(idx.resolve("params.json"),
      """{"n":3,"bands":4,"rowsPerBand":2,"shards":8}""".getBytes("UTF-8"))
    val batch = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    val e1 = intercept[IllegalStateException](
      LshIndex.append(batch, "text", "doc_id", idx))
    assert(e1.getMessage.contains("legacy layout"))
    val e2 = intercept[IllegalStateException](
      LshIndex.nearDupsOf(spark, batch, "text", "doc_id", idx))
    assert(e2.getMessage.contains("legacy layout"))
    assert(!java.nio.file.Files.exists(idx.resolve("bands")),
      "the failed append must not have written anything")
    // migration: rebuild re-shingles the caller's corpus into a fresh
    // layout-2 tree (it never reads the old files) — then writes work
    LshIndex.rebuild(spark, batch, "text", "doc_id", idx)
    assert(LshIndex.append(batch, "text", "doc_id", idx, span = Some("1-2")) > 0)
    assert(LshIndex.nearDupsOf(spark, batch, "text", "doc_id", idx).columns.length == 3)
  }
}
