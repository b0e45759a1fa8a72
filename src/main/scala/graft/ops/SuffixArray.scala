package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** DISTRIBUTED SUFFIX RANKING by prefix doubling (Manber & Myers
  * 1990; the Flick & Aluru 2015 distributed formulation) — the exact
  * foundation under suffix-array substring dedup of training corpora
  * (Lee et al., ACL 2022), complementing [[SubstringDedup]]'s
  * rolling-hash windows with EXACT (collision-free) repeat classes.
  *
  * Semantics: one suffix per character position, never crossing a
  * document boundary; suffixes are ranked globally in lexicographic
  * order (dense ranks — identical suffix strings share a rank; a
  * proper prefix sorts before its extensions). After k doubling
  * rounds the rank key compares exactly the first 2^k characters, by
  * induction: round k refines (rank_{k−1}(p), rank_{k−1}(p+2^{k−1}))
  * with an exhausted-suffix sentinel 0 that sorts below every real
  * rank (dense ranks start at 1).
  *
  * Everything distributes: each round is (a) the 2^{k−1}-shifted rank
  * fetched by a PER-DOCUMENT `lead()` window (positions are
  * consecutive within a document by construction — one doc-keyed
  * shuffle, never a corpus×corpus self-join, never a global window),
  * and (b) an exact dense rank computed IN a [[PrefixScan]] two-pass
  * scan over the range-partitioned sorted pairs (NO global window —
  * the [[Rank]] discipline — and no rank-table join-back either; see
  * [[scanRanks]]). O(log maxLen) rounds; driver traffic per round is
  * numPartitions
  * prefix accumulators + one distinct-count scalar (the early-unique
  * stop). Lineage is pinned per round (eager localCheckpoint — the
  * [[ConnectedComponents]] loop discipline).
  *
  * Scale note: a character-level suffix table is CORPUS-SIZED (one
  * row per byte) — at 100 TB this op is the per-shard/per-partition
  * repeat miner (exactly how suffix-array dedup pipelines run it),
  * not a whole-corpus single pass; each round's shuffles are linear
  * in the shard and the round count is log(maxDocLen), independent of
  * corpus size.
  */
object SuffixArray {

  /** One row per character position:
    * (did, pos 0-based, slen = suffix length, ch).
    *
    * Chars come from ONE linear `split` pass per document (a
    * transform/substring per position is O(pos) each on UTF8String —
    * quadratic per doc, measured minutes-for-seconds at ×64), with
    * empties filtered order-preserving (split('') emits boundary
    * empties). The pre-explode repartition matters: a small parquet
    * source arrives as ONE partition, and without the shuffle the
    * whole corpus-sized explode + first rank round would run as a
    * single task.
    */
  private def positions(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("did"), textCol.as("t"))
      .repartition(col("did"))
      .select(col("did"), length(col("t")).cast("long").as("len"),
        posexplode(expr("filter(split(t, ''), x -> x != '')"))
          .as(Seq("pos", "ch")))
      .select(col("did"), col("pos").cast("long").as("pos"),
        (col("len") - col("pos")).as("slen"), col("ch"))

  /** Dense-rank the (r1, r2) pairs IN the scan: one range-partitioned
    * sort of the full position table, then a [[PrefixScan]] whose
    * monoid is the segmented distinct-count
    * (first pair, last pair, #distinct) — merging adjacent summaries
    * subtracts the boundary duplicate. Each row's dense rank falls out
    * of its exclusive prefix directly, so there is NO distinct pass
    * and NO corpus-sized rank join-back (the first cut of this op did
    * both — 2× the round cost and two OOM modes at ×64: an AQE
    * broadcast of the RDD-derived rank table, then a shuffled-hash
    * build; the scan form needs neither join). Returns
    * ((did, pos, slen, r), the pinned sort backing it) — the caller
    * unpersists the pin once the NEXT round is materialized.
    */
  private def scanRanks(paired: DataFrame): (DataFrame, DataFrame) = {
    val spark = paired.sparkSession
    import spark.implicits._
    val sorted = paired
      .select(col("did"), col("pos"), col("slen"), col("r1"), col("r2"))
      .repartitionByRange(32, col("r1"), col("r2"))
      .sortWithinPartitions(col("r1"), col("r2"))
      .as[(Long, Long, Long, Long, Long)]
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    // A = (first r1, first r2, last r1, last r2, distinct count);
    // count 0 is the empty identity
    type A = (Long, Long, Long, Long, Long)
    val zero: A = (0L, 0L, 0L, 0L, 0L)
    def fold(a: A, t: (Long, Long, Long, Long, Long)): A =
      if (a._5 == 0L) (t._4, t._5, t._4, t._5, 1L)
      else if (a._3 == t._4 && a._4 == t._5) a
      else (a._1, a._2, t._4, t._5, a._5 + 1L)
    def merge(a: A, b: A): A =
      if (a._5 == 0L) b
      else if (b._5 == 0L) a
      else (a._1, a._2, b._3, b._4,
        a._5 + b._5 - (if (a._3 == b._1 && a._4 == b._2) 1L else 0L))
    val ranked = PrefixScan.scan(sorted, zero)(fold)(merge)
      .map { case ((did, pos, slen, r1, r2), ex, _) =>
        val r = if (ex._5 != 0L && ex._3 == r1 && ex._4 == r2) ex._5
                else ex._5 + 1L
        (did, pos, slen, r)
      }.toDF("did", "pos", "slen", "r")
    (ranked, sorted.toDF)
  }

  /** Run `doublings` rounds (comparison depth 2^doublings), stopping
    * early once every suffix has a unique rank if `stopWhenUnique`.
    * Returns (did, pos, slen, r) — unless `rankLast` is false, in
    * which case the LAST round's pair is returned un-renumbered as
    * (did, pos, slen, r1, r2): the pair partitions positions exactly
    * as its dense rank would, so equality consumers
    * ([[repeatGroups]]) can skip a whole rank-and-join round.
    *
    * The 2^{k−1} shift is a per-document `lead()` — positions are
    * consecutive within a document by construction, so the window
    * (partitioned by doc, never global) replaces a corpus×corpus
    * self-join; the lead default 0 IS the exhausted-suffix sentinel.
    */
  private def doublingRanks(docs: DataFrame, idCol: Column, textCol: Column,
                            doublings: Int, stopWhenUnique: Boolean,
                            rankLast: Boolean = true): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("did").orderBy("pos")
    val pos = positions(docs, idCol, textCol)
    // round 0: rank single characters. The window runs over the
    // ALPHABET (distinct chars — bounded by construction, the
    // Bpe.tokenIds pattern), never the corpus.
    val charRanks = pos.select(col("ch")).distinct()
      .withColumn("r", dense_rank()
        .over(org.apache.spark.sql.expressions.Window.orderBy("ch"))
        .cast("long"))
    var cur = pos.join(broadcast(charRanks), Seq("ch"))
      .select(col("did"), col("pos"), col("slen"), col("r"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    // each round pins a corpus-sized sort; once the NEXT round's pin
    // is materialized the previous one is dead weight — drop it (the
    // ConnectedComponents loop discipline; without this, O(log depth)
    // corpus-sized snapshots pile up in the block manager — ~20 GB of
    // pinned state at the ×64 curve point)
    var prevPin: DataFrame = cur
    val n = if (stopWhenUnique) cur.count() else -1L
    var width = 1
    var k = 0
    // an empty position table (all-NULL text) is vacuously unique —
    // skip the loop rather than NPE on the max-rank probe
    var done = stopWhenUnique && n == 0L
    while (k < doublings && !done) {
      val paired = cur.select(col("did"), col("pos"), col("slen"),
        col("r").as("r1"),
        lead(col("r"), width, 0L).over(byDoc).as("r2"))
      if (k == doublings - 1 && !rankLast) {
        val out = paired.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        ConnectedComponents.unpersistCheckpoint(prevPin)
        return out
      }
      val (ranked, pin) = scanRanks(paired)
      cur = ranked
      ConnectedComponents.unpersistCheckpoint(prevPin)
      prevPin = pin
      // distinct-pair count = the max dense rank — one map pass over
      // the round's pinned sort, no extra shuffle
      if (stopWhenUnique &&
        cur.agg(max(col("r"))).collect()(0).getLong(0) == n) done = true
      width *= 2
      k += 1
    }
    cur
  }

  /** Lexicographic suffix ranks: (doc_id, pos, r) — r is the dense
    * rank of the suffix among ALL suffixes of the corpus, at a
    * comparison depth of min(maxDepth ROUNDED UP to a power of two,
    * longest document) leading characters — pass a power of two (the
    * intended usage; the doubling rounds can only realize those) or
    * the default for FULL suffix order. Rounds run until the depth is
    * covered — one bounded scalar collect for the max length — or
    * ranks go unique, whichever is first. A bounded depth is the
    * standard dedup-pipeline variant (repeats longer than the depth
    * are what the miner is after; the round count is log2(depth),
    * independent of document length). An empty (or all-NULL-text)
    * corpus returns an empty frame.
    */
  def suffixRanks(docs: DataFrame, idCol: Column, textCol: Column,
                  maxDepth: Int = Int.MaxValue): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val maxLenRow = docs.agg(max(length(textCol))).collect()(0)
    if (maxLenRow.isNullAt(0))
      return Seq.empty[(Long, Long, Long)].toDF("doc_id", "pos", "r")
    val maxLen = maxLenRow.getInt(0).toLong
    val target = math.min(maxLen, maxDepth.toLong)
    var d = 0
    while ((1L << d) < target) d += 1
    doublingRanks(docs, idCol, textCol, d, stopWhenUnique = true)
      .select(col("did").as("doc_id"), col("pos"), col("r"))
  }

  /** EXACT cross-document repeated `minLen`-grams (minLen a power of
    * two): every position whose suffix is ≥ minLen long and whose
    * first minLen characters recur in ≥ 2 positions across ≥ 2
    * documents, labeled by its repeat class (the class's minimum
    * (doc, pos), a canonical engine-independent id). Exactly
    * log2(minLen) doubling rounds — the rank key then compares
    * precisely the first minLen characters, so classes are exact
    * string equality, no hash collisions. Output:
    * (doc_id, pos, grp_did, grp_pos).
    */
  def repeatGroups(docs: DataFrame, idCol: Column, textCol: Column,
                   minLen: Int): DataFrame = {
    require(minLen >= 2 && (minLen & (minLen - 1)) == 0,
      s"minLen must be a power of two, got $minLen")
    val d = java.lang.Integer.numberOfTrailingZeros(minLen)
    // the final round's (r1, r2) pair partitions eligible positions
    // exactly as its dense rank would — group on it directly and
    // skip the last rank-and-join round
    val elig = doublingRanks(docs, idCol, textCol, d,
        stopWhenUnique = false, rankLast = false)
      .filter(col("slen") >= minLen)
    // canonical class id: min packed (did, pos) — did < 2^31 and
    // pos < 2^32 by construction, so the packing preserves the
    // lexicographic (did, pos) order
    val groups = elig.groupBy(col("r1"), col("r2")).agg(
        min(col("did") * lit(4294967296L) + col("pos")).as("gkey"),
        count(lit(1)).as("n_occ"),
        countDistinct(col("did")).as("n_docs"))
      .filter(col("n_occ") >= 2 && col("n_docs") >= 2)
    // groups can approach corpus size on repeat-heavy corpora — same
    // no-broadcast, spill-safe sort-merge discipline as the rank join
    elig.join(groups.hint("merge"), Seq("r1", "r2"))
      .select(col("did").as("doc_id"), col("pos"),
        expr("gkey div 4294967296").as("grp_did"),
        expr("gkey % 4294967296").as("grp_pos"))
  }

  /** [[repeatGroups]] behind the session artifact cache — the repeat
    * inventory is mined once per (corpus, minLen) and every consumer
    * ([[repeatGroups]] reporting, [[scrubRepeats]]) reads the same
    * table; the log-depth doubling rounds run once per session (the
    * `Tfidf.pairsCache` / `sharedImageHashes` discipline).
    */
  def sharedRepeatGroups(docs: DataFrame, idCol: Column, textCol: Column,
                         minLen: Int,
                         cacheKey: Option[String] = None): DataFrame =
    cacheKey match {
      case None => repeatGroups(docs, idCol, textCol, minLen)
      case Some(src) => SessionArtifactCache.getOrBuild(
        docs.select(idCol, textCol), tag = s"sa_repeats:$src",
        params = s"minLen=$minLen") {
        repeatGroups(docs, idCol, textCol, minLen)
      }
    }

  /** EXACT-substring SCRUB (the Lee et al. pipeline's last step, on
    * the suffix-array classes instead of hash windows): every
    * character covered by a NON-CANONICAL occurrence of a cross-doc
    * repeated minLen-gram is removed; the class's canonical occurrence
    * (its min-(doc, pos) member) survives, so exactly one copy of
    * every repeated span remains in the corpus. Overlapping covers
    * union position-wise. Output: (doc_id, clean_text, n_dropped),
    * one row per input document.
    *
    * Scale: the cover table is |members|·minLen rows (bounded by the
    * mining output, not the corpus²); reassembly is one groupBy(doc)
    * whose collect_list is bounded by the document length.
    */
  def scrubRepeats(docs: DataFrame, idCol: Column, textCol: Column,
                   minLen: Int,
                   cacheKey: Option[String] = None): DataFrame = {
    val members = sharedRepeatGroups(docs, idCol, textCol, minLen, cacheKey)
    val covered = members
      .filter(!(col("doc_id") === col("grp_did") &&
        col("pos") === col("grp_pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(minLen - 1L)))
          .as("pos"))
      .distinct()
    val kept = positions(docs, idCol, textCol)
      .withColumnRenamed("did", "doc_id")
      .join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id").agg(
        concat_ws("", transform(
          array_sort(collect_list(struct(col("pos"), col("ch")))),
          x => x.getField("ch"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    docs.select(idCol.as("doc_id"),
        length(textCol).cast("long").as("len"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        (col("len") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }
}
