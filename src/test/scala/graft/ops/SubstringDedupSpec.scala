package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Exact-substring span dedup (Lee et al. ACL'22, rolling-window
  * form): inventory shape, cross-doc span detection, self-repetition,
  * short-doc handling, and the ratio arithmetic.
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("id", "text")

  test("window inventory: one window per start position, none for short docs") {
    val df = docs(
      1L -> "a b c d e",   // 5 tokens, W=3 -> 3 windows
      2L -> "x y")         // 2 tokens  -> none
    val inv = SubstringDedup.windowInventory(df, col("id"), col("text"), 3)
      .orderBy("doc_id", "pos").collect()
    assert(inv.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1L, 0, "a b c"), (1L, 1, "b c d"), (1L, 2, "c d e")))
  }

  test("repeatedSpans finds a span embedded in two otherwise-different docs") {
    val span = "the quick brown fox"
    val df = docs(
      1L -> s"alpha beta $span gamma delta",
      2L -> s"one two three $span four",
      3L -> "unrelated words only here now")
    val spans = SubstringDedup.repeatedSpans(df, col("id"), col("text"),
      windowTokens = 4, minDocs = 2).collect()
    // exactly the 4-token windows common to docs 1 and 2: just `span`
    // itself (its neighbors differ between the docs)
    assert(spans.map(_.getString(0)).toSeq == Seq(span))
    assert(spans.head.getLong(1) == 2L) // n_docs
    assert(spans.head.getLong(2) == 2L) // n_occ
  }

  test("spanDupStats: cross-doc duplication and the ratio") {
    val df = docs(
      1L -> "p q r s t",       // windows: pqr qrs rst
      2L -> "p q r x y",       // windows: pqr qrx rxy -> shares pqr
      3L -> "m n o u v")       // all unique
    val stats = SubstringDedup.spanDupStats(df, col("id"), col("text"), 3)
      .orderBy("doc_id").collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 3L, 0L)))
    assert(math.abs(stats(0).getDouble(3) - 1.0 / 3.0) < 1e-12)
    assert(stats(2).getDouble(3) == 0.0)
  }

  test("self-repetition inside one document counts as duplication") {
    val df = docs(1L -> "a b a b a b")
    // W=2 windows: "a b","b a","a b","b a","a b" -> all duplicated
    val stats = SubstringDedup.spanDupStats(df, col("id"), col("text"), 2)
      .collect()
    assert(stats.head.getLong(1) == 5L)
    assert(stats.head.getLong(2) == 5L)
    assert(stats.head.getDouble(3) == 1.0)
  }

  test("documents shorter than the window report (0, 0, 0.0), not dropped") {
    val df = docs(1L -> "only two", 2L -> "a b c d")
    val stats = SubstringDedup.spanDupStats(df, col("id"), col("text"), 3)
      .orderBy("doc_id").collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 0L), (2L, 2L, 0L)))
    assert(stats(0).getDouble(3) == 0.0)
  }

  test("a long shared span yields L-W+1 consecutive duplicated windows") {
    val shared = (1 to 6).map(i => s"s$i").mkString(" ") // 6 tokens
    val df = docs(
      1L -> s"head1 $shared tail1",
      2L -> s"head2 $shared tail2")
    val spans = SubstringDedup.repeatedSpans(df, col("id"), col("text"),
      windowTokens = 4, minDocs = 2).collect()
    // windows fully inside the shared span: 6-4+1 = 3
    assert(spans.length == 3)
    assert(spans.forall(_.getLong(1) == 2L))
  }

  test("scrub removes the non-canonical occurrence, keeps the first") {
    val span = "the quick brown fox jumps"
    val df = docs(
      1L -> s"alpha $span omega",
      2L -> s"one two $span three")
    val out = SubstringDedup.scrubDuplicatedSpans(df, col("id"), col("text"), 5)
      .orderBy("doc_id").collect()
    // doc 1 holds the canonical occurrence: untouched
    assert(out(0).getString(1) == s"alpha $span omega")
    assert(out(0).getLong(2) == 0L)
    // doc 2 loses exactly the 5 span tokens
    assert(out(1).getString(1) == "one two three")
    assert(out(1).getLong(2) == 5L)
  }

  test("scrub collapses self-repetition to one occurrence") {
    val df = docs(1L -> "x y x y x y")
    // W=2 duplicated windows: every occurrence after the canonical
    // "x y"@0 / "y x"@1 is dropped -> tokens 2..5 go
    val out = SubstringDedup.scrubDuplicatedSpans(df, col("id"), col("text"), 2)
      .collect()
    assert(out.head.getString(1) == "x y")
    assert(out.head.getLong(2) == 4L)
  }

  test("scrub passes short and untouched docs through verbatim") {
    val df = docs(1L -> "tiny", 2L -> "all words here are unique tokens now")
    val out = SubstringDedup.scrubDuplicatedSpans(df, col("id"), col("text"), 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("tiny", "all words here are unique tokens now"))
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("scrub plan has no mandatory broadcast on the drop-set side") {
    // the drop-set volume scales with the corpus duplication rate
    // (unbounded); a forced broadcast hint would OOM a dup-heavy
    // corpus at scale. AQE may still CHOOSE broadcast when small —
    // what must be absent is the mandatory hint in the logical plan.
    val df = docs(1L -> "a b c d e f", 2L -> "a b c d x y")
    val analyzed = SubstringDedup.scrubDuplicatedSpans(
      df, col("id"), col("text"), 3).queryExecution.analyzed
    val hints = analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"forced join-strategy hint present:\n$analyzed")
  }

  test("scrub rebuild survives a heavily duplicated document") {
    // every window duplicated: the drop set covers most of the doc;
    // the array_except mask must drop exactly the non-canonical span
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = docs(1L -> span, 2L -> span, 3L -> span)
    val out = SubstringDedup.scrubDuplicatedSpans(df, col("id"), col("text"), 4)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == span && out(0).getLong(2) == 0L)
    assert(out(1).getString(1) == "" && out(1).getLong(2) == 10L)
    assert(out(2).getString(1) == "" && out(2).getLong(2) == 10L)
  }

  test("inventory is narrow: no shuffle before the window rows exist") {
    val df = docs(1L -> "a b c d e f g h")
    val plan = SubstringDedup.windowInventory(df, col("id"), col("text"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"window inventory should not shuffle:\n$plan")
  }

  /** Brute doc pairs sharing a literal minLen-char run (codepoints). */
  private def brutePairs(rows: Seq[(Long, String)], minLen: Int): Seq[(Long, Long)] = {
    def grams(t: String): Set[String] = {
      val cps = t.codePoints.toArray
      (0 to cps.length - minLen).map(p => new String(cps, p, minLen)).toSet
    }
    val g = rows.map { case (id, t) => id -> grams(t) }
    (for {
      (a, ga) <- g; (b, gb) <- g
      if a < b && (ga intersect gb).nonEmpty
    } yield (a, b)).sortBy(identity)
  }

  test("verbatimDupPairs == brute gram-pair truth (winnowed pair probe is exact)") {
    val span = "The five boxing wizards jump quickly tonight" // 45 chars
    val rows = Seq(
      1L -> s"xx$span tail one",
      2L -> s"$span tail two",                       // pairs with 1, 4
      3L -> "nothing shared with anyone, long enough to have grams here",
      4L -> s"prefix then $span end",                // pairs with 1, 2
      5L -> s"short${span.take(31)}",                // 31-char overlap: NO pair
      // (no separator: a shared boundary space would extend the run to 32)
      6L -> ("ab" * 30),                             // periodic self-content
      7L -> ("zz" + "ab" * 20 + "qq"))               // periodic overlap with 6
    val got = SubstringDedup.verbatimDupPairs(
        rows.toDF("doc_id", "text"), col("doc_id"), col("text"),
        minLen = 32, k = 16)
      .orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got == brutePairs(rows, 32))
    assert(got.contains((1L, 2L)) && got.contains((2L, 4L)) &&
      got.contains((6L, 7L)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L), "31-char overlap leaked")
  }

  test("verbatimDupPairs matches brute truth on the sf corpus") {
    val d = graft.Tables.documents(spark, SparkTestSession.Sf)
    val rows = d.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.filter(_._2 != null)
    val got = SubstringDedup.verbatimDupPairs(d, col("doc_id"), col("text"),
        minLen = 32, k = 16)
      .orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got == brutePairs(rows, 32))
    assert(got.nonEmpty, "sf corpus has no verbatim pairs — fixture too weak")
  }

  test("sharedVerbatimDupPairs: equal corpus plans alias, results match the plain probe") {
    // one winnow-probe-extend pass per (session, corpus, geometry):
    // two callers with semantically equal inputs read the SAME cached
    // pair table (the q_winnow_pairs / q_leakage_split_verbatim
    // sharing), and the artifact equals the uncached operator
    def d = graft.Tables.documents(spark, SparkTestSession.Sf)
    val r1 = SubstringDedup.sharedVerbatimDupPairs(d, col("doc_id"),
      col("text"), minLen = 32, k = 16, cacheKey = Some("svdp_spec"))
    val r2 = SubstringDedup.sharedVerbatimDupPairs(d, col("doc_id"),
      col("text"), minLen = 32, k = 16, cacheKey = Some("svdp_spec"))
    assert(r1 eq r2, "equal corpus plans must read one cached artifact")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs(r1) == pairs(SubstringDedup.verbatimDupPairs(d,
      col("doc_id"), col("text"), minLen = 32, k = 16)))
    // a different geometry under the same key never aliases
    val other = SubstringDedup.sharedVerbatimDupPairs(d, col("doc_id"),
      col("text"), minLen = 48, k = 16, cacheKey = Some("svdp_spec"))
    assert(!(other eq r1), "different params must never alias")
  }

  test("saveVerbatimPairs/loadVerbatimPairs round-trips; policy reads the loaded artifact") {
    val d = graft.Tables.documents(spark, SparkTestSession.Sf)
    val pairs = SubstringDedup.verbatimDupPairs(d, col("doc_id"), col("text"),
      minLen = 32, k = 16)
    val dir = java.nio.file.Files.createTempDirectory("verb_pairs_art").toString
    SubstringDedup.saveVerbatimPairs(pairs, minLen = 32, k = 16, dir)
    val (loaded, minLen, k) = SubstringDedup.loadVerbatimPairs(spark, dir)
    assert(minLen == 32 && k == 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(rows(loaded) == rows(pairs))
    // a fresh session's policy layer runs off the loaded artifact:
    // the cluster closure over the persisted table equals the one
    // over the freshly derived pairs — no re-derivation pass
    def comps(p: org.apache.spark.sql.DataFrame) =
      ConnectedComponents.components(p, "id_a", "id_b")
        .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(comps(loaded) == comps(pairs))
    // manifest hygiene: missing geometry refuses (a pair verified at
    // one minLen is not a pair at another)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "params.json"), """{"minLen":32}""")
    val e = intercept[IllegalArgumentException] {
      SubstringDedup.loadVerbatimPairs(spark, dir) }
    assert(e.getMessage.contains("params.json missing k"))
  }

  test("verbatimDupPairsCapped == verbatimDupPairs when no bucket caps") {
    val d = graft.Tables.documents(spark, SparkTestSession.Sf)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs(SubstringDedup.verbatimDupPairsCapped(d, col("doc_id"),
        col("text"), minLen = 32, k = 16, maxBucket = 100000L)) ==
      pairs(SubstringDedup.verbatimDupPairs(d, col("doc_id"), col("text"),
        minLen = 32, k = 16)))
  }

  // the planted hot-span fleet: 1000 documents that ARE one constant
  // boilerplate run, two doc pairs sharing private cold runs (one
  // also carrying the hot span), unique tails keeping non-identical
  // rows distinct
  private lazy val hotSpanFixture: (org.apache.spark.sql.DataFrame, String) = {
    val hot = "All work and no play makes Jack a dull boy; every page of " +
      "the winter manuscript repeats this exact boilerplate sentence again."
    val cold0 = "a genuinely unique shared sentence number zero lives here"
    val cold1 = "another private overlap that only the last pair carries on"
    val rows =
      (0L until 1000L).map(i => (i, hot)) ++
        Seq(2000L -> s"$cold0 tail-2000", 2001L -> s"$cold0 tail-2001",
          3000L -> s"$hot $cold1 tail-3000", 3001L -> s"$hot $cold1 tail-3001")
    (rows.toDF("doc_id", "text").cache(), hot)
  }

  test("hot-span audit: the boilerplate buckets are flagged with their true multiplicity") {
    val (df, hot) = hotSpanFixture
    // pure-copy selections are fully content-determined: the audit's
    // over-500 buckets are EXACTLY the hot span's winnowed grams, each
    // selected by all 1000 copies (+ the two hot-carrying cold docs on
    // interior grams)
    val expected = SubstringDedup.winnowedGramsOf(hot, 32, 16)
    assert(expected.distinct.length == expected.length)
    val audit = SubstringDedup.winnowBucketAudit(df, col("doc_id"),
      col("text"), minLen = 32, k = 16, minBucket = 500L)
      .as[(Long, Long, Long)].collect()
    assert(audit.length == expected.length,
      s"audit buckets ${audit.length} != planted grams ${expected.length}")
    assert(audit.forall(_._3 >= 1000L))
    val grams = SubstringDedup.winnowBucketAuditGrams(df, col("doc_id"),
      col("text"), minLen = 32, k = 16, minBucket = 500L)
      .select("gram").as[String].collect().toSet
    assert(grams == expected.toSet,
      s"audit grams must name the boilerplate: $grams")
  }

  test("hot-span cap: candidate mass bounded, cold pairs survive, hot-only pairs silenced (audited)") {
    val (df, _) = hotSpanFixture
    val src = df.select(col("doc_id"), col("text").as("t"))
    val wfps = SuffixArray.winnowedFps(src, 16, 17)
    // uncapped seed mass is quadratic in the hot multiplicity
    // (~C(1000,2) per hot gram); the cap removes the hot buckets from
    // the self-join entirely
    val uncappedSeeds = SubstringDedup.seedPairs(wfps).count()
    val okBuckets = wfps.groupBy(col("h"))
      .agg(count(lit(1)).as("n")).filter(col("n") <= 500L).select(col("h"))
    val cappedSeeds = SubstringDedup.seedPairs(
      wfps.join(okBuckets, Seq("h"), "left_semi")).count()
    assert(uncappedSeeds > 1000000L, s"fixture too weak: $uncappedSeeds")
    assert(cappedSeeds < uncappedSeeds / 1000L,
      s"cap did not bound candidate mass: $cappedSeeds vs $uncappedSeeds")
    // capped pairs: the two cold pairs exactly — (3000, 3001) still
    // surfaces through its private cold run even though its hot seeds
    // are capped (the first-surviving-seed exception, inherent: the
    // cap drops seed rows, not pairs); all hot-only pairs are gone,
    // and the audit above is precisely what says so
    val capped = SubstringDedup.verbatimDupPairsCapped(df, col("doc_id"),
        col("text"), minLen = 32, k = 16, maxBucket = 500L)
      .orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(capped == Seq((2000L, 2001L), (3000L, 3001L)), s"got $capped")
  }

  test("WinnowIndex: extend == rebuild; dupPairsAgainst == pairs touching the batch; save/load round-trips") {
    val d = graft.Tables.documents(spark, SparkTestSession.Sf)
    val standing = d.filter(col("doc_id") % 2 === 0)
    val batch = d.filter(col("doc_id") % 2 === 1)
    def fpsRows(idx: SubstringDedup.WinnowIndex) =
      idx.fps.orderBy("doc_id", "pos").as[(Long, Long, Long)].collect().toSeq
    val idx = SubstringDedup.buildWinnowIndex(standing, col("doc_id"), col("text"))
    // extend is a plain append == one-shot build over the union
    // (winnowing is per-document)
    val extended = SubstringDedup.extendWinnowIndex(idx, batch,
      col("doc_id"), col("text"))
    assert(fpsRows(extended) ==
      fpsRows(SubstringDedup.buildWinnowIndex(d, col("doc_id"), col("text"))))
    // the incremental probe == the full pair truth restricted to
    // pairs with a batch member
    val got = SubstringDedup.dupPairsAgainst(idx, standing, batch,
        col("doc_id"), col("text"))
      .orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq
    val full = SubstringDedup.verbatimDupPairs(d, col("doc_id"), col("text"),
        minLen = 32, k = 16)
      .as[(Long, Long)].collect().toSeq
    assert(got == full.filter(p => p._1 % 2 == 1 || p._2 % 2 == 1)
      .sorted)
    assert(got.nonEmpty, "sf corpus has no cross-half pairs — fixture too weak")
    // persistence round-trip probes identically
    val dir = java.nio.file.Files.createTempDirectory("winnow_idx").toString
    SubstringDedup.saveWinnowIndex(idx, dir)
    val loaded = SubstringDedup.loadWinnowIndex(spark, dir)
    assert(loaded.minLen == 32 && loaded.k == 16)
    assert(SubstringDedup.dupPairsAgainst(loaded, standing, batch,
        col("doc_id"), col("text"))
      .orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq == got)
  }

  test("incremental hot-span cap: touched-bucket audit fires, hot batch↔standing pairs silenced, cold survive") {
    // standing corpus: 1000 copies of one boilerplate span; batch: two
    // docs carrying the hot span AND a private cold run, plus one pure
    // hot carrier — the crawl arrival of a boilerplate page
    val (df, hot) = hotSpanFixture
    val standing = df.filter(col("doc_id") < 2000L) // the 1000 copies
    val idx = SubstringDedup.buildWinnowIndex(standing, col("doc_id"), col("text"))
    val cold = "a private overlap only the batch pair carries tonight ok"
    val batch = Seq(
      9001L -> s"$hot $cold tail-9001",
      9002L -> s"$hot $cold tail-9002",
      9003L -> s"$hot lone-carrier").toDF("doc_id", "text")
    // the probe-side audit sees the standing multiplicity of the
    // touched hot buckets (probe-bounded: only batch-touched hashes)
    val audit = SubstringDedup.probeBucketAudit(idx, batch, col("doc_id"),
        col("text"), minBucket = 500L)
      .as[(Long, Long, Long)].collect()
    assert(audit.nonEmpty && audit.forall(_._3 >= 1000L))
    // uncapped: every batch doc pairs with all 1000 standing copies
    val uncapped = SubstringDedup.dupPairsAgainst(idx, standing, batch,
      col("doc_id"), col("text")).count()
    assert(uncapped >= 3000L, s"got $uncapped")
    // capped at 500: ALL batch↔standing pairs are silenced — standing
    // docs are pure copies, so every seed they carry is in an over-cap
    // bucket (exactly what the audit lists); the batch-internal cold
    // pair survives via its below-cap seeds. (Batch-internal
    // hot-carrier pairs may also survive through straddle-window
    // selections — those seeds are genuinely below cap, so surviving
    // is correct behavior, not asserted either way.)
    val capped = SubstringDedup.dupPairsAgainstCapped(idx, standing, batch,
        col("doc_id"), col("text"), maxBucket = 500L)
      .orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(capped.contains((9001L, 9002L)), s"cold pair lost: $capped")
    assert(capped.forall(p => p._1 >= 9000L && p._2 >= 9000L),
      s"a hot-only batch↔standing pair leaked through the cap: $capped")
  }

  test("seed→text extension is block-bounded: one text-join row per (pair, block)") {
    // two docs sharing one LONG run (~3 ScrubBlockChars blocks of
    // distinct content): hundreds of aligned seeds collapse to a
    // handful of (pair, block) list rows before the text join
    val run = (0 until 1500).map(i => s"w$i").mkString(" ") // ~10k chars
    val df = Seq(11L -> run, 22L -> s"pre $run").toDF("doc_id", "text")
    val seeds = SubstringDedup.seedPairs(SuffixArray.winnowedFps(
      df.select(col("doc_id"), col("text").as("t")), 16, 17))
    val grouped = SubstringDedup.groupedSeedPairs(seeds)
    val nSeeds = seeds.count()
    val nGroups = grouped.count()
    val nDistinct = seeds.select(col("id_a"), col("id_b"),
      (col("pos_a") / lit(4096L)).cast("long")).distinct().count()
    assert(nGroups == nDistinct)
    // every seed survives into exactly one block list
    assert(grouped.select(sum(size(col("pp")))).as[Long].head() == nSeeds)
    // and the text join pays per block, not per seed
    assert(nGroups <= 4, s"expected ~3 blocks, got $nGroups")
    assert(nSeeds > 100L, s"fixture too weak: $nSeeds seeds")
    // the blocked path's answer is unchanged
    assert(SubstringDedup.verbatimDupPairs(df, col("doc_id"), col("text"),
        minLen = 32, k = 16).as[(Long, Long)].collect().toSeq ==
      Seq((11L, 22L)))
  }
}
