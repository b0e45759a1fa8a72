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
    *
    * Granularity note: repartitioning BY `did` makes one document one
    * task for this explode stage — a pathologically long document is
    * one long task here (document-bounded by design; every downstream
    * round re-range-partitions by rank, so the skew does not
    * propagate). Splitting a document across tasks would need a
    * (did, block) salt and an extra length join for `slen`; not worth
    * it while documents ≪ partition budget.
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
  private def scanRanks(paired: DataFrame, nPart: Int): (DataFrame, DataFrame) = {
    val spark = paired.sparkSession
    import spark.implicits._
    val sorted = paired
      .select(col("did"), col("pos"), col("slen"), col("r1"), col("r2"))
      .repartitionByRange(nPart, col("r1"), col("r2"))
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
    * which case the LAST round's key tuple is returned un-renumbered
    * as (did, pos, slen, ks: array<long>): the key partitions
    * positions exactly as its dense rank would, so equality consumers
    * ([[repeatGroups]]) can skip a whole rank-and-join round.
    *
    * The 2^{k−1} shift is a per-document `lead()` — positions are
    * consecutive within a document by construction, so the window
    * (partitioned by doc, never global) replaces a corpus×corpus
    * self-join; the lead default 0 IS the exhausted-suffix sentinel.
    */
  /** Measured per-shard sizing rule for the doubling sorts (BASELINE
    * ×64 curve: ~4M positions per 2 GB-heap core) — range partitions
    * grow with the corpus so one sort partition never outgrows the
    * rule.
    */
  private val PositionsPerPartition = 4000000L

  /** Max packed key columns in the radix initial round: 8 longs of
    * key per row (64 chars of depth at a 7-bit alphabet) — enough to
    * cover the shipped depths in ONE ranked round while keeping the
    * sort key bounded.
    */
  private val PackColsMax = 8L

  private def doublingRanks(docs: DataFrame, idCol: Column, textCol: Column,
                            doublings: Int, stopWhenUnique: Boolean,
                            rankLast: Boolean = true): DataFrame = {
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("did").orderBy("pos")
    // partition sizing for every ranked round: never below the
    // session's shuffle width (the cluster-parallelism knob — the old
    // hardcoded 32 capped a 1000-executor cluster at 32 tasks), and
    // grows with the corpus per the heap rule (one cheap narrow agg
    // over the doc table, amortized across all log-depth rounds).
    // LAZY: the fully-packed rankLast=false path returns before any
    // ranked round, and then neither the position count nor the
    // partition sizing is ever needed — skipping the agg job is one
    // fewer pass per sharded-miner shard (guide §1.2).
    lazy val totalPos = docs.agg(sum(length(textCol))).collect()(0) match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    lazy val nPart = math.max(
      docs.sparkSession.sessionState.conf.numShufflePartitions.toLong,
      totalPos / PositionsPerPartition + 1L).toInt
    val pos = positions(docs, idCol, textCol)
    // round 0: rank single characters. The window runs over the
    // ALPHABET (distinct chars — bounded by construction, the
    // Bpe.tokenIds pattern), never the corpus. Eagerly pinned
    // (alphabet-sized) so the packing-width probe below and the
    // broadcast join share one distinct pass.
    val charRanks = pos.select(col("ch")).distinct()
      .withColumn("r", dense_rank()
        .over(org.apache.spark.sql.expressions.Window.orderBy("ch"))
        .cast("long"))
      .localCheckpoint()
    val charRanked = pos.join(broadcast(charRanks), Seq("ch"))
      .select(col("did"), col("pos"), col("slen"), col("r"))
    // RADIX-PACKED INITIAL ROUND (guide §1.2 step 1 — remove whole
    // passes): instead of starting the doubling at depth 1, pack runs
    // of c char-ranks into longs (b bits each, exhausted-suffix
    // sentinel 0 packs as zero bits) and dense-rank the packed KEY
    // TUPLE — depth c·nKeys after a single ranked round. Each packed
    // long orders exactly as its (r_off..r_{off+c-1}) block, and the
    // key tuple orders exactly as the first c·nKeys characters with
    // exhaustion-first — the invariant the doubling rounds maintain —
    // so the dense ranks are VALUE-identical to log2(c·nKeys)
    // doubling rounds (dense ranks over the same total order are
    // equal), and every later round is untouched. c is a power of two
    // so the realized depths stay the 2^k grid the rankLast contract
    // needs; it adapts to the alphabet: ≤127 distinct chars → 8 chars
    // × 7 bits, ≤32767 → 4 × 15, else 2 × 31 (56/60/62 bits — no
    // sign-bit overflow). Up to PackColsMax key longs cover depth 64
    // (7-bit alphabet) in ONE ranked round — suffixRanks at depth 64
    // runs 1 ranked round (was 3 with the pair pack, originally 6),
    // and the minLen ≤ 64 class miners run ZERO ranked rounds: the
    // packed tuple IS the class key (see rankLast below). Each saved
    // round is a full corpus-sized range sort + scan.
    val alpha = charRanks.count()
    val targetDepth = 1L << doublings
    val cMax = if (alpha <= 127L) 8L else if (alpha <= 32767L) 4L else 2L
    val c = math.min(cMax, targetDepth).toInt
    val packBits = if (alpha <= 127L) 7 else if (alpha <= 32767L) 15 else 31
    // each round pins a corpus-sized sort; once the NEXT round's pin
    // is materialized the previous one is dead weight — drop it (the
    // ConnectedComponents loop discipline; without this, O(log depth)
    // corpus-sized snapshots pile up in the block manager — ~20 GB of
    // pinned state at the ×64 curve point)
    var cur: DataFrame = null
    var prevPin: DataFrame = null
    // an empty position table (all-NULL text) is vacuously unique —
    // skip the rounds rather than NPE on the max-rank probe.
    // position count == Σ length (one row per character) — the sizing
    // agg already paid for it, so the early-unique reference needs no
    // extra count job
    var done = stopWhenUnique && totalPos == 0L
    var width = 1L
    if (done || c <= 1 || doublings < 1) {
      cur = charRanked.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      prevPin = cur
    } else {
      // ONE LINEAR PASS for the packed keys (guide §1.2 — the former
      // expression form exploded one row per character and paid a
      // per-document window sort plus c·nKeys lead() frames just to
      // line the char ranks up again; the chars of one document are
      // already adjacent in its string). The alphabet rank map is
      // collected once (alphabet-sized — the same frame the window
      // form broadcast) and each document packs its whole key-tuple
      // array in one string traversal, exactly the packFrom
      // arithmetic: Horner base 2^packBits over the char ranks,
      // out-of-range positions packing the exhaustion sentinel 0.
      val rankMap = charRanks.collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      def packedKeyRows(nKeys: Int): DataFrame = {
        val bc = docs.sparkSession.sparkContext.broadcast(rankMap)
        val cc = c; val bits = packBits
        val packUdf = udf { (t: String) =>
          if (t == null) Array.empty[Array[Long]]
          else {
            // same segmentation as the expression path's
            // split(t, '') + non-empty filter
            val chars = t.split("").filter(_.nonEmpty)
            val n = chars.length
            val m = bc.value
            val rs = new Array[Long](n)
            var i = 0
            while (i < n) { rs(i) = m(chars(i)); i += 1 }
            Array.tabulate(n) { p =>
              val ks = new Array[Long](nKeys)
              var j = 0
              while (j < nKeys) {
                var acc = 0L
                var i2 = 0
                while (i2 < cc) {
                  val q = p + j * cc + i2
                  acc = (acc << bits) + (if (q < n) rs(q) else 0L)
                  i2 += 1
                }
                ks(j) = acc
                j += 1
              }
              ks
            }
          }
        }
        docs.select(idCol.as("did"), textCol.as("t"))
          .repartition(col("did"))
          .select(col("did"), length(col("t")).cast("long").as("len"),
            packUdf(col("t")).as("arr"))
          .select(col("did"), col("len"),
            posexplode(col("arr")).as(Seq("pos", "ks")))
          .select(col("did"), col("pos").cast("long").as("pos"),
            (col("len") - col("pos")).as("slen"), col("ks"))
      }
      // ZERO-ROUND CLASS PATH: an equality consumer whose target
      // depth fits the key-width bound needs NO ranked round at all —
      // the packed key tuple IS the depth-`targetDepth` class key
      // (it partitions positions exactly as the dense rank would),
      // and the downstream groupBy/join on the array stays inside
      // Tungsten. The ranked path below deliberately keeps 2-long
      // keys: wide array keys through the RDD-based PrefixScan cost
      // more in boxing and array ordering than the rounds they save
      // (measured: q_sa_ranks 16 → 21 s isolated with 8-long keys).
      if (!rankLast && targetDepth <= c.toLong * PackColsMax) {
        val nKeys = math.max(1L, targetDepth / c).toInt
        return packedKeyRows(nKeys)
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      }
      // pair-pack the second half whenever the target depth allows it
      val realized = if (2L * c <= targetDepth) 2L * c else c.toLong
      val nKeysInit = (realized / c).toInt
      val paired = packedKeyRows(nKeysInit).select(
        col("did"), col("pos"), col("slen"),
        element_at(col("ks"), 1).as("r1"),
        (if (nKeysInit == 2) element_at(col("ks"), 2) else lit(0L)).as("r2"))
      val (ranked, pin) = scanRanks(paired, nPart)
      cur = ranked
      prevPin = pin
      ConnectedComponents.unpersistCheckpoint(charRanks)
      if (stopWhenUnique &&
        cur.agg(max(col("r"))).collect()(0).getLong(0) == totalPos) done = true
      width = realized
    }
    // RANK-PAIR PACKING in the loop (the initial round's trick applied
    // to the doubling itself): while every dense rank fits in 31 bits
    // (r ≤ n < 2^31), pack two width-w ranks per long — the pair
    // (pack(r_p, r_{p+w}), pack(r_{p+2w}, r_{p+3w})) orders exactly as
    // the 4-tuple, which orders exactly as the first 4w characters —
    // so one ranked round QUADRUPLES the depth instead of doubling it
    // (the sentinel 0 packs as zero bits == the lead() default).
    // Above 2^31 positions the classic pair round is used unchanged.
    lazy val quadOk = totalPos < (1L << 31)
    while (width < targetDepth && !done) {
      val quad = quadOk && 4L * width <= targetDepth
      val wi = width.toInt
      val paired =
        if (quad) cur.select(col("did"), col("pos"), col("slen"),
          (col("r") * lit(1L << 31) +
            lead(col("r"), wi, 0L).over(byDoc)).as("r1"),
          (lead(col("r"), 2 * wi, 0L).over(byDoc) * lit(1L << 31) +
            lead(col("r"), 3 * wi, 0L).over(byDoc)).as("r2"))
        else cur.select(col("did"), col("pos"), col("slen"),
          col("r").as("r1"),
          lead(col("r"), wi, 0L).over(byDoc).as("r2"))
      val newWidth = if (quad) 4L * width else 2L * width
      if (newWidth == targetDepth && !rankLast) {
        val out = paired
          .select(col("did"), col("pos"), col("slen"),
            array(col("r1"), col("r2")).as("ks"))
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        ConnectedComponents.unpersistCheckpoint(prevPin)
        return out
      }
      val (ranked, pin) = scanRanks(paired, nPart)
      cur = ranked
      ConnectedComponents.unpersistCheckpoint(prevPin)
      prevPin = pin
      // distinct-key count = the max dense rank — one map pass over
      // the round's pinned sort, no extra shuffle
      if (stopWhenUnique &&
        cur.agg(max(col("r"))).collect()(0).getLong(0) == totalPos) done = true
      width = newWidth
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
    // the final round's key tuple partitions eligible positions
    // exactly as its dense rank would — group on it directly and
    // skip the last rank-and-join round (at minLen ≤ 64 on a small
    // alphabet the radix-packed tuple needs NO ranked round at all)
    val elig = doublingRanks(docs, idCol, textCol, d,
        stopWhenUnique = false, rankLast = false)
      .filter(col("slen") >= minLen)
    // canonical class id: min packed (did, pos) — the packing
    // preserves lexicographic (did, pos) order only for
    // did ∈ [0, 2^31) (pos < 2^32 holds by construction: it is a
    // string offset). Fail loudly on out-of-range ids instead of
    // silently corrupting grp_did/grp_pos (the Sharding.assign
    // precedent); one bounded-scalar aggregate, no extra pass over
    // the (larger) position table.
    val idBounds = docs.agg(min(idCol).cast("long"), max(idCol).cast("long"))
      .collect()(0)
    if (!idBounds.isNullAt(0)) {
      val (lo, hi) = (idBounds.getLong(0), idBounds.getLong(1))
      require(lo >= 0L && hi < (1L << 31),
        s"repeatGroups packs doc ids as did*2^32+pos: ids must be in " +
          s"[0, 2^31), got [$lo, $hi]")
    }
    val groups = elig.groupBy(col("ks")).agg(
        min(col("did") * lit(4294967296L) + col("pos")).as("gkey"),
        count(lit(1)).as("n_occ"),
        countDistinct(col("did")).as("n_docs"))
      .filter(col("n_occ") >= 2 && col("n_docs") >= 2)
    // groups can approach corpus size on repeat-heavy corpora — same
    // no-broadcast, spill-safe sort-merge discipline as the rank join
    elig.join(groups.hint("merge"), Seq("ks"))
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
    * mining output, not the corpus²); reassembly is block-segmented
    * (see [[scrubFromMembers]]) so no single aggregation buffer ever
    * holds a whole document.
    */
  def scrubRepeats(docs: DataFrame, idCol: Column, textCol: Column,
                   minLen: Int,
                   cacheKey: Option[String] = None): DataFrame =
    scrubFromMembers(docs, idCol, textCol, minLen,
      sharedRepeatGroups(docs, idCol, textCol, minLen, cacheKey))

  /** Block width (characters) shared by the candidate-buffer
    * disciplines that group positions by `pos div ScrubBlockChars`
    * ([[literalGrams]], the winnow/verbatim extension joins) — a
    * repeat-heavy book-length document becomes len/4096 block rows,
    * never one doc-length aggregation buffer.
    */
  private[ops] val ScrubBlockChars = 4096L

  /** Scrub `docs` against an explicit repeat-member inventory
    * (doc_id, pos, grp_did, grp_pos) — the shared tail of
    * [[scrubRepeats]] and [[shardedScrub]].
    *
    * INTERVAL reassembly (guide §2.3/§8 — shuffle metadata, slice the
    * payload once): the non-canonical member STARTS are the only rows
    * that move (one long per member through one doc-keyed exchange);
    * the kept text is then sliced out of the original string in one
    * narrow pass. Because every covered interval has the same length
    * (minLen), interval ends are monotone in their starts, so a
    * sorted start array yields the kept gaps directly: before start
    * sᵢ the kept slice is [prev = sᵢ₋₁ + minLen, sᵢ) (empty when the
    * intervals overlap or abut — `substr` of a non-positive length is
    * ""), plus the tail [s_last + minLen, len). Slice concatenation in
    * position order is byte-identical to the former per-character
    * reassembly; the per-doc aggregation buffer holds one long per
    * member start (the former design's final block-concat buffer
    * already held the whole cleaned text, so peak per-doc memory only
    * shrinks). The corpus-sized per-character explode, its distinct,
    * the anti-join and the two block aggregations — four corpus-scale
    * exchanges of (doc, pos, ch) rows — are gone entirely.
    */
  private[ops] def scrubFromMembers(docs: DataFrame, idCol: Column,
                                    textCol: Column, minLen: Int,
                                    members: DataFrame): DataFrame = {
    val minL = lit(minLen.toLong)
    val starts = members
      .filter(!(col("doc_id") === col("grp_did") &&
        col("pos") === col("grp_pos")))
      .groupBy(col("doc_id"))
      // collect_set: tolerant of duplicate member rows (the former
      // covered-position path carried an explicit distinct)
      .agg(array_sort(collect_set(col("pos"))).as("ss"))
    val t = col("t")
    // kept slice ahead of each start (1-based substr; non-positive
    // length yields "")
    val headSlices = transform(col("ss"), (s, i) => {
      val prevEnd = when(i === 0, lit(0L))
        .otherwise(element_at(col("ss"), i) + minL)
      t.substr((prevEnd + 1L).cast("int"), (s - prevEnd).cast("int"))
    })
    val tailStart = element_at(col("ss"), -1) + minL
    val cleanRaw = when(col("ss").isNull, t)
      .otherwise(concat(concat_ws("", headSlices),
        t.substr((tailStart + 1L).cast("int"),
          (col("len") - tailStart).cast("int"))))
    docs.select(idCol.as("doc_id"), textCol.as("t"),
        length(textCol).cast("long").as("len"))
      .join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(cleanRaw, lit("")).as("clean_text"),
        (col("len") - coalesce(length(cleanRaw).cast("long"), lit(0L)))
          .as("n_dropped"))
  }

  // ---- corpus-scale sharded mining --------------------------------

  // Rabin–Karp gram fingerprints: two independent 31-bit polynomial
  // hashes over CODEPOINTS, packed into one positive long (h1·2^31 +
  // h2, effectively 62 bits — collisions only cost verification work,
  // never correctness; the completion pass re-groups candidates by
  // the literal gram string).
  private val FpB1 = 31L;  private val FpM1 = 2147483647L // 2^31 − 1
  private val FpB2 = 131L; private val FpM2 = 2147483629L // prime < 2^31

  /** All `minLen`-gram fingerprints of `text`: `out(pos)` is the
    * packed double hash of the gram starting at codepoint `pos`, one
    * entry per position with at least `minLen` codepoints left — a
    * single linear rolling pass per document (the per-position
    * `substring` alternative is O(len²) on UTF8String; the
    * [[positions]] lesson). A PRIMITIVE long array (index =
    * position), so the explode in [[gramFps]] ships unboxed longs,
    * not boxed tuples.
    */
  private[ops] def gramHashes(text: String, minLen: Int): Array[Long] = {
    if (text == null) return Array.empty
    val cps = text.codePoints.toArray
    val n = cps.length
    if (n < minLen) return Array.empty
    // B^(minLen−1) mod M — the drop-term multiplier
    var p1 = 1L; var p2 = 1L
    var i = 0
    while (i < minLen - 1) { p1 = p1 * FpB1 % FpM1; p2 = p2 * FpB2 % FpM2; i += 1 }
    var h1 = 0L; var h2 = 0L
    i = 0
    while (i < minLen) { h1 = (h1 * FpB1 + cps(i)) % FpM1; h2 = (h2 * FpB2 + cps(i)) % FpM2; i += 1 }
    val out = new Array[Long](n - minLen + 1)
    out(0) = h1 * 2147483648L + h2
    var s = 1
    while (s <= n - minLen) {
      h1 = ((h1 - cps(s - 1) * p1 % FpM1 + FpM1) * FpB1 + cps(s + minLen - 1)) % FpM1
      h2 = ((h2 - cps(s - 1) * p2 % FpM2 + FpM2) * FpB2 + cps(s + minLen - 1)) % FpM2
      out(s) = h1 * 2147483648L + h2
      s += 1
    }
    out
  }

  /** Literal `minLen`-grams at the given codepoint positions — one
    * linear pass per document over the candidate set (bounded by the
    * verified repeat mass, not the corpus).
    */
  private[ops] def gramsAt(text: String, ps: Seq[Long], minLen: Int): Array[(Long, String)] = {
    val cps = text.codePoints.toArray
    ps.map(p => (p, new String(cps, p.toInt, minLen))).toArray
  }

  /** The corpus-wide rolling-fingerprint table: one
    * (doc_id, pos, h) row per `minLen`-gram position — ONE linear
    * [[gramHashes]] pass per document (8-byte probe keys, the
    * [[SubstringDedup]] discipline). `src` is (doc_id, t); the
    * pre-explode repartition is the [[positions]] lesson (a small
    * parquet source arrives as one partition).
    */
  private[ops] def gramFps(src: DataFrame, minLen: Int): DataFrame = {
    val fpUdf = udf((t: String) => gramHashes(t, minLen))
    src.repartition(col("doc_id"))
      .select(col("doc_id"), posexplode(fpUdf(col("t"))).as(Seq("pos", "h")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("h"))
  }

  /** Winnowing selection (Schleimer et al., SIGMOD'03) over a
    * k-gram hash array: the RIGHTMOST minimum of every window of `w`
    * consecutive hashes, deduplicated — a monotonic-deque linear
    * pass. Selection is a pure function of the window's hash
    * CONTENTS, so two copies of the same ≥ (w+k−1)-char span select
    * the same grams at the same relative offsets (the guarantee the
    * sampled decontamination probe builds on); expected density is
    * ~2/(w+1) of positions instead of every position.
    */
  private[ops] def winnowedPositions(hs: Array[Long], w: Int): Array[Int] = {
    val m = hs.length
    if (m == 0 || m < w) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    val deque = new Array[Int](m) // indices, increasing, hashes strictly increasing
    var head = 0; var tail = 0 // [head, tail)
    var i = 0
    while (i < m) {
      // rightmost-min: evict equal OR greater from the back
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val sel = deque(head)
        if (out.isEmpty || out(out.length - 1) != sel) out += sel
      }
      i += 1
    }
    out.toArray
  }

  /** The winnowed fingerprint table: (doc_id, pos, h) rows for the
    * SELECTED `k`-gram positions only (windows of `w` grams — one
    * linear [[gramHashes]] + [[winnowedPositions]] pass per
    * document). The sampled counterpart of [[gramFps]]: ~2/(w+1) of
    * its rows, still guaranteed to hit every verbatim overlap of
    * length ≥ w+k−1.
    */
  private[ops] def winnowedFps(src: DataFrame, k: Int, w: Int): DataFrame = {
    val selUdf = udf { (t: String) =>
      val hs = gramHashes(t, k)
      winnowedPositions(hs, w).map(p => (p, hs(p)))
    }
    src.repartition(col("doc_id"))
      .select(col("doc_id"), explode(selUdf(col("t"))).as("ph"))
      .select(col("doc_id"), col("ph._1").cast("long").as("pos"),
        col("ph._2").as("h"))
  }

  /** Maximal verbatim run around an aligned k-gram seed: verifies the
    * seed literally (a fingerprint collision returns null), then
    * extends left/right while codepoints agree. Returns
    * (runStart, runEndExcl) in FIRST-argument codepoint positions —
    * the verify kernel of the winnowed probes
    * ([[graft.ops.Decontaminate.verbatimContaminationSampled]],
    * [[graft.ops.SubstringDedup.verbatimDupPairs]]).
    */
  private[ops] val extendRunUdf = udf {
    (ct: String, bt: String, cpos: Long, bpos: Long, k: Int) =>
      val c = ct.codePoints.toArray
      val b = bt.codePoints.toArray
      val cp = cpos.toInt; val bp = bpos.toInt
      var i = 0
      var ok = cp + k <= c.length && bp + k <= b.length
      while (ok && i < k) { ok = c(cp + i) == b(bp + i); i += 1 }
      if (!ok) null
      else {
        var lo = 0
        while (cp - lo - 1 >= 0 && bp - lo - 1 >= 0 &&
          c(cp - lo - 1) == b(bp - lo - 1)) lo += 1
        var hi = k
        while (cp + hi < c.length && bp + hi < b.length &&
          c(cp + hi) == b(bp + hi)) hi += 1
        (cpos - lo, cpos + hi)
      }
  }

  /** [[extendRunUdf]]'s kernel over a position-pair LIST — the
    * block-bounded form of the seed→text extension join: the two
    * codepoint arrays decode ONCE per (text-pair, block) group and
    * every seed in the block extends against them, so a document with
    * s seeds ships its text once per block instead of once per seed
    * (the [[literalGrams]] block discipline applied to the extension
    * stage). Per seed, the arithmetic is character-identical to
    * [[extendRunUdf]]; runs shorter than `minLen` (and collision
    * seeds, which fail the literal verify) are dropped here, and the
    * surviving (runStart, runEndExcl) intervals — first-argument
    * codepoint positions — are deduplicated per group (many seeds
    * inside one long run extend identically).
    */
  private[ops] def extendRuns(ct: String, bt: String,
                              pairs: Seq[(Long, Long)], k: Int,
                              minLen: Int): Seq[(Long, Long)] = {
    val c = ct.codePoints.toArray
    val b = bt.codePoints.toArray
    val out = scala.collection.mutable.LinkedHashSet.empty[(Long, Long)]
    pairs.foreach { case (cpos, bpos) =>
      val cp = cpos.toInt; val bp = bpos.toInt
      var i = 0
      var ok = cp + k <= c.length && bp + k <= b.length
      while (ok && i < k) { ok = c(cp + i) == b(bp + i); i += 1 }
      if (ok) {
        var lo = 0
        while (cp - lo - 1 >= 0 && bp - lo - 1 >= 0 &&
          c(cp - lo - 1) == b(bp - lo - 1)) lo += 1
        var hi = k
        while (cp + hi < c.length && bp + hi < b.length &&
          c(cp + hi) == b(bp + hi)) hi += 1
        if (lo + hi >= minLen) out += ((cpos - lo, cpos + hi))
      }
    }
    out.toSeq
  }

  /** [[extendRuns]] as a UDF: (text_a, text_b, array<struct<pos_a,
    * pos_b>>, k, minLen) → array<struct<runStart, runEndExcl>>. The
    * grouped-seed join stage of [[graft.ops.SubstringDedup
    * .verbatimDupPairs]] and [[graft.ops.Decontaminate
    * .verbatimContaminationSampled]].
    */
  private[ops] val extendRunsUdf = udf {
    (ct: String, bt: String, pairs: Seq[org.apache.spark.sql.Row],
     k: Int, minLen: Int) =>
      extendRuns(ct, bt, pairs.map(r => (r.getLong(0), r.getLong(1))),
        k, minLen)
  }

  /** EXACT repeat classes from a fingerprint table: the Rabin–Karp
    * candidate pass + literal verify, the same classes as
    * [[repeatGroups]] without its log2(minLen) sorted doubling
    * rounds. Candidates are positions whose 128-bit-ish double hash
    * recurs (≥ 2 occurrences across ≥ 2 documents — any true class
    * satisfies both, since equal grams hash equal); the literal
    * re-group in [[verifiedMembers]] filters the collisions back
    * out, so the output is exact string equality, identical to the
    * doubling miner's (spec-pinned). Cost: ONE 8-byte-key shuffle of
    * the fps table + a candidate-mass-bounded verify, vs five
    * range-partitioned corpus sorts — the doubling miner stays for
    * suffix RANKS ([[suffixRanks]]), which need order statistics a
    * fingerprint cannot give.
    */
  private[ops] def membersFromFps(fps: DataFrame, src: DataFrame,
                                  minLen: Int): DataFrame = {
    // candidate pass as ONE h-shuffle: full-frame windows keep the
    // positions attached (a groupBy would need a second fps shuffle
    // to join them back); an h hot enough to skew a window partition
    // would skew the join's h partition identically, so this is the
    // same worst case for strictly less data motion
    val wh = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val whd = org.apache.spark.sql.expressions.Window.partitionBy("h")
      .orderBy("doc_id")
    // packing-range guard IN the pipeline (the Sampling.hashBucket
    // shape): repeat classes pack doc ids as did*2^32+pos, which
    // preserves (did, pos) order only for did ∈ [0, 2^31). Every row
    // that can reach the gkey pack descends from a candidate row, so
    // guarding here fails loudly exactly where corruption could start
    // — with no driver-side min/max job per call (this runs once per
    // crawl batch inside extendRepeatGroups)
    val guardedId = when(col("doc_id") >= 0 && col("doc_id") < lit(1L << 31),
        col("doc_id"))
      .otherwise(raise_error(concat(
        lit("repeat classes pack doc ids as did*2^32+pos: ids must be in " +
          "[0, 2^31), got "), col("doc_id").cast("string"))))
    val candPos = fps
      .withColumn("n_occ", count(lit(1)).over(wh))
      .withColumn("n_docs", max(dense_rank().over(whd)).over(wh))
      .filter(col("n_occ") >= 2 && col("n_docs") >= 2)
      .select(guardedId.as("doc_id"), col("pos"))
    verifiedMembers(literalGrams(candPos, src, minLen), _ => Seq.empty,
      lit(true))
  }

  /** [[repeatGroups]] semantics on the fingerprint path — exact, and
    * free of the power-of-two restriction (the rolling hash covers
    * any gram length); kept `private[ops]` with the equality spec as
    * its contract.
    */
  private[ops] def repeatGroupsFp(docs: DataFrame, idCol: Column,
                                  textCol: Column, minLen: Int): DataFrame = {
    val src = docs.select(idCol.as("doc_id"), textCol.as("t"))
    membersFromFps(gramFps(src, minLen), src, minLen)
  }

  /** Literal `minLen`-grams at candidate positions: candPos
    * (doc_id, pos) → (doc_id, pos, gram). Candidates group by
    * (doc_id, pos div ScrubBlockChars) — the [[scrubFromMembers]]
    * block discipline: a repeat-heavy book-length document (≈ every
    * position a candidate) becomes len/4096 block rows of ≤ 4096
    * positions each, never one doc-length aggregation buffer. The
    * text joins once per BLOCK row (bounded by candidate mass /
    * blockChars), and [[gramsAt]] indexes absolute positions, so the
    * block split changes buffer shape only, never the emitted grams.
    */
  private[ops] def literalGrams(candPos: DataFrame, src: DataFrame,
                                minLen: Int): DataFrame = {
    val gramUdf = udf((t: String, ps: Seq[Long]) => gramsAt(t, ps, minLen))
    candPos
      .groupBy(col("doc_id"),
        (col("pos") / lit(ScrubBlockChars)).cast("long").as("blk"))
      .agg(collect_list(col("pos")).as("ps"))
      .join(src, Seq("doc_id"))
      .select(col("doc_id"), explode(gramUdf(col("t"), col("ps"))).as("pg"))
      .select(col("doc_id"), col("pg._1").as("pos"), col("pg._2").as("gram"))
  }

  /** Exact verified repeat classes over a literal-gram table with a
    * per-class spanning predicate: window by the GRAM STRING (a
    * fingerprint collision can only add candidates this exact
    * re-group filters back out), keep classes with ≥ 2 occurrences
    * across ≥ 2 documents that `spanPred` accepts, and emit their
    * members under the class's global canonical label.
    *
    * Full-frame gram windows keep the member rows attached — the
    * groupBy-then-join-back form shuffled the candidate table a
    * second time AND evaluated its subtree twice (both join inputs);
    * a hot gram skews one window partition exactly as it would skew
    * the join's gram partition, so same worst case, half the motion.
    * `extra` builds the span metrics over the class window (e.g.
    * `max(is_new)`, or a `dense_rank` fold for a distinct count).
    */
  private def verifiedMembers(grams: DataFrame,
                              extra: org.apache.spark.sql.expressions.WindowSpec => Seq[(String, Column)],
                              spanPred: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
    val wd = org.apache.spark.sql.expressions.Window.partitionBy("gram")
      .orderBy("doc_id")
    val base = grams
      .withColumn("n_occ", count(lit(1)).over(w))
      .withColumn("n_docs", max(dense_rank().over(wd)).over(w))
      .withColumn("gkey",
        min(col("doc_id") * lit(4294967296L) + col("pos")).over(w))
    extra(w).foldLeft(base) { case (df, (name, c)) =>
        df.withColumn(name, c)
      }
      .filter(col("n_occ") >= 2 && col("n_docs") >= 2 && spanPred)
      .select(col("doc_id"), col("pos"),
        expr("gkey div 4294967296").as("grp_did"),
        expr("gkey % 4294967296").as("grp_pos"))
  }

  /** [[repeatGroups]] at corpus scale: hash-shard documents
    * (`pmod(doc_id, nShards)`), mine each shard's repeat classes
    * in bounded-width waves (the per-shard heap contract — peak
    * memory is `maxConcurrentShards` shards' doubling rounds,
    * 1/nShards of the corpus each, regardless of corpus size), then
    * recover the classes sharding splits with an EXACT completion
    * pass:
    *
    *  1. one linear rolling-fingerprint pass over the corpus
    *     ([[gramFps]] — an 8-byte shuffle key, the
    *     [[SubstringDedup]] discipline);
    *  2. fingerprint groups spanning ≥ 2 shards are the only possible
    *     cross-shard classes (equal grams hash equal) — everything
    *     else is already exact within its shard;
    *  3. candidates verify by the LITERAL gram string
    *     ([[literalGrams]], bounded by the candidate mass), keeping
    *     verified classes that truly span shards.
    *
    * Union: spanning classes from the completion pass (global
    * canonical labels) + per-shard classes not superseded by one
    * (anti-join on member identity). The result is EXACTLY the global
    * [[repeatGroups]] output for every nShards ≥ 1 and every
    * concurrency width — shard count and wave width change the
    * memory/wall-clock trade, never the answer.
    *
    * `maxConcurrentShards` is the wall-clock escape hatch the strict
    * sequential loop lacked: at hundreds of shards a width-1 driver
    * loop leaves the cluster idle while one shard mines. Width P
    * submits P shards' jobs concurrently (Spark schedules concurrent
    * actions fine-grained across executors); the default 1 keeps the
    * original one-shard-at-a-time heap contract.
    */
  def shardedRepeatGroups(docs: DataFrame, idCol: Column, textCol: Column,
                          minLen: Int, nShards: Int,
                          maxConcurrentShards: Int = 1): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    require(maxConcurrentShards >= 1,
      s"maxConcurrentShards must be >= 1, got $maxConcurrentShards")
    val src = docs.select(idCol.as("doc_id"), textCol.as("t"))
    // phase A: per-shard mining in waves of maxConcurrentShards — the
    // eager checkpoint materializes a wave's shards before the next
    // wave starts, so at most `maxConcurrentShards` shards' rounds
    // coexist in executor memory
    def mine(s: Int): DataFrame =
      repeatGroups(src.filter(pmod(col("doc_id"), lit(nShards.toLong)) === s),
          col("doc_id"), col("t"), minLen)
        .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val perShard: Seq[DataFrame] =
      (0 until nShards).grouped(maxConcurrentShards).flatMap { wave =>
        if (wave.size == 1) wave.map(mine)
        else {
          import scala.concurrent.{Await, ExecutionContext, Future}
          import scala.concurrent.duration.Duration
          val pool = java.util.concurrent.Executors.newFixedThreadPool(wave.size)
          implicit val ec: ExecutionContext =
            ExecutionContext.fromExecutorService(pool)
          try Await.result(
            Future.sequence(wave.map(s => Future(mine(s))).toSeq), Duration.Inf)
          finally pool.shutdown()
        }
      }.toSeq
    val membersA = perShard.reduce(_ unionByName _)
    if (nShards == 1) return membersA
    // phase B: exact cross-shard completion. The fps explode is
    // consumed exactly once (the spanning window below), so it flows
    // straight into the exchange — no pin needed.
    val fps = gramFps(src, minLen)
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
    // spans-2+-shards in ONE h-exchange: a full-frame window min/max
    // (distinct-shard-count >= 2 ⟺ min != max) keeps the candidate
    // rows attached — the former groupBy(countDistinct) + left_semi
    // pair shuffled the corpus-wide fps table by h TWICE (and the
    // count-distinct expanded every row) for the same candidate set
    // (guide §2.4: two operations keyed the same way share one
    // exchange; the [[extendCandidates]] probe already uses this
    // full-frame form)
    val wh = org.apache.spark.sql.expressions.Window.partitionBy("h")
    val candPos = fps
      .withColumn("mn", min(col("shard")).over(wh))
      .withColumn("mx", max(col("shard")).over(wh))
      .filter(col("mn") =!= col("mx"))
      .select(col("doc_id"), col("pos"))
    val grams = literalGrams(candPos, src, minLen)
      .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
    // verified classes that REALLY span shards — disjoint from phase
    // A by construction, since a within-shard class never spans
    // pinned: consumed twice (emitted + the supersession anti-join);
    // the shard distinct-count folds through dense_rank (the
    // membersFromFps n_docs discipline — countDistinct has no window
    // form)
    val wds = org.apache.spark.sql.expressions.Window.partitionBy("gram")
      .orderBy("shard")
    val membersB = verifiedMembers(grams,
      w => Seq("n_shards" -> max(dense_rank().over(wds)).over(w)),
      col("n_shards") >= 2)
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    // a spanning class supersedes any within-shard fragment of itself
    // that shard-local mining emitted (with a shard-local label)
    membersB.unionByName(
      membersA.join(supersessionProbe(membersB), Seq("doc_id", "pos"),
        "left_anti"))
  }

  /** Supersession anti-join probe side, sized ADAPTIVELY (guide §3.1:
    * pick the strategy deliberately): the superseding member set is
    * usually candidate-bounded (a crawl batch's crossing classes, a
    * shard completion pass's spanning classes), so BROADCAST it and
    * leave the corpus-sized member table un-shuffled and un-sorted —
    * the forced merge hint paid a full sort of the standing inventory
    * per call. Above the row bound (the honest flood case, where the
    * superseding set is itself corpus-scale) fall back to the
    * merge-join shape. The count is one map pass over an
    * already-materialized checkpoint.
    */
  private val SupersedeBroadcastMaxRows = 1000000L
  private def supersessionProbe(members: DataFrame): DataFrame = {
    val probe = members.select(col("doc_id"), col("pos"))
    if (members.count() <= SupersedeBroadcastMaxRows) broadcast(probe)
    else probe.hint("merge")
  }

  /** [[scrubRepeats]] at corpus scale: the sharded miner's exact
    * inventory ([[shardedRepeatGroups]] — identical to the global
    * answer for every shard count) feeding the block-segmented scrub.
    */
  def shardedScrub(docs: DataFrame, idCol: Column, textCol: Column,
                   minLen: Int, nShards: Int,
                   maxConcurrentShards: Int = 1): DataFrame =
    scrubFromMembers(docs, idCol, textCol, minLen,
      shardedRepeatGroups(docs, idCol, textCol, minLen, nShards,
        maxConcurrentShards))

  // ---- standing exact-substring inventory (index maintenance) ------

  /** The STANDING exact-substring state — the last member of the
    * standing-index family (MinHash / HashIndex / SemIndex / BPE /
    * Unigram / PQ / LM / KnnGraph / Tfidf.DfStats) to get the
    * train-once / extend-at-O(batch) / persist treatment. Two tables:
    *
    *  - `members` — the verified repeat-class inventory
    *    (doc_id, pos, grp_did, grp_pos), exactly [[repeatGroups]]'s
    *    output over everything seen;
    *  - `fps` — the ADDITIVE rolling-fingerprint table
    *    (doc_id, pos, h), one row per gram position (the LM lesson:
    *    raw additive state folds, a derived/pruned table is
    *    unreplayable after extension). At deployment it is the
    *    h-bucketed parquet artifact, so a batch probe reads only its
    *    matching buckets.
    *
    * The corpus TEXT itself is a separate standing table (saved once,
    * by its owner — the [[KnnGraph.GraphArtifact]] embedding-table
    * convention); [[extendRepeatGroups]] takes it as an argument for
    * the literal-gram verify, touching only candidate documents.
    */
  final case class RepeatInventory(members: DataFrame, fps: DataFrame,
                                   minLen: Int)

  /** Mine the full standing inventory: the fingerprint table (one
    * linear pass) plus the members derived FROM it on the
    * [[membersFromFps]] path — the fps table the inventory must
    * carry anyway doubles as the miner's candidate index, so
    * training costs one pass + one 8-byte-key shuffle, not the
    * doubling rounds. Both tables are eagerly pinned — they ARE the
    * artifact. `nShards > 1` keeps the [[shardedRepeatGroups]]
    * doubling driver for callers that want its per-shard heap
    * contract on the members side.
    */
  def trainRepeatGroups(docs: DataFrame, idCol: Column, textCol: Column,
                        minLen: Int, nShards: Int = 1,
                        maxConcurrentShards: Int = 1): RepeatInventory = {
    val src = docs.select(idCol.as("doc_id"), textCol.as("t"))
    val fps = gramFps(src, minLen)
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val members =
      if (nShards > 1)
        shardedRepeatGroups(docs, idCol, textCol, minLen, nShards,
          maxConcurrentShards)
      else membersFromFps(fps, src, minLen)
    RepeatInventory(
      members.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER),
      fps, minLen)
  }

  /** [[trainRepeatGroups]] behind the session artifact cache — the
    * standing inventory is mined once per (corpus, minLen) per
    * session and every consumer reads the same two tables (members
    * and fps build independently, so two cache slots never trigger a
    * duplicate training run — the `sharedRepeatGroups` discipline).
    */
  def sharedRepeatInventory(docs: DataFrame, idCol: Column, textCol: Column,
                            minLen: Int,
                            cacheKey: Option[String] = None): RepeatInventory =
    cacheKey match {
      case None => trainRepeatGroups(docs, idCol, textCol, minLen)
      case Some(src) =>
        val keyed = docs.select(idCol, textCol)
        // fps builds (or resolves) FIRST so the members build derives
        // from the already-cached table — one linear pass total, the
        // trainRepeatGroups reuse applied across the two cache slots
        val fps = SessionArtifactCache.getOrBuild(keyed,
          tag = s"sa_inv_fps:$src", params = s"minLen=$minLen") {
          gramFps(docs.select(idCol.as("doc_id"), textCol.as("t")), minLen)
        }
        RepeatInventory(
          SessionArtifactCache.getOrBuild(keyed, tag = s"sa_inv_members:$src",
            params = s"minLen=$minLen") {
            membersFromFps(fps,
              docs.select(idCol.as("doc_id"), textCol.as("t")), minLen)
          },
          fps, minLen)
    }

  /** Fold a batch of NEW documents (ids disjoint from everything the
    * inventory has seen — the crawl-batch convention of
    * `Tfidf.extendDfStats` / `KnnGraph.extend`) into the standing
    * inventory WITHOUT re-mining the corpus. The [[shardedRepeatGroups]]
    * phase-B shape applied BIPARTITE, with the standing corpus as one
    * side and the batch as the other:
    *
    *  1. mine the batch alone ([[repeatGroups]] — O(batch) doubling
    *     rounds);
    *  2. probe the batch's gram fingerprints against the STANDING
    *     fingerprint table: hashes present on BOTH sides are the only
    *     places a class can cross the boundary (equal grams hash
    *     equal) — candidate mass, never a corpus re-mine;
    *  3. verify candidates by the LITERAL gram string (touching only
    *     candidate documents of `standingDocs`), keeping classes that
    *     truly cross;
    *  4. union: crossing classes (global canonical labels) supersede
    *     the standing/batch fragments they absorb (anti-join on
    *     member identity); everything untouched survives verbatim.
    *
    * The result is EXACTLY `trainRepeatGroups(standing ∪ batch)`
    * (spec-pinned at two split points): an untouched class has
    * identical membership in the union; a touched class's candidates
    * include ALL its union occurrences, so its thresholds and min
    * label are the union's. New work is O(batch + candidates); the
    * standing fps table shuffles only its h-matching rows (bucketed
    * at deployment).
    */
  /** The extend probe's candidate stage, UN-checkpointed — exactly
    * the frame [[extendRepeatGroups]] step (2) executes, factored out
    * so plan specs assert on the REAL probe plan (the bloom prune
    * below the standing side's exchange), not a synthetic replica the
    * eager checkpoint would hide. Triggers one count job on `fpsNew`
    * (the bloom sizing input).
    */
  private[graft] def extendCandidates(standingFps: DataFrame,
                                      fpsNew: DataFrame): DataFrame =
    extendCandidates(standingFps, fpsNew, fpsNew.count())

  private[graft] def extendCandidates(standingFps: DataFrame,
                                      fpsNew: DataFrame,
                                      nFpsNew: Long): DataFrame = {
    // bipartite probe as ONE h-shuffle of the tagged union; the
    // STANDING side is bloom-pruned on the batch's hashes BEFORE its
    // exchange (the [[BloomJoin]] discipline) — see the step (2)
    // notes in [[extendRepeatGroups]]
    val standingPruned = BloomJoin.prefilter(standingFps, col("h"),
      fpsNew, col("h"), expectedItems = math.max(nFpsNew, 1L))
    val wh = org.apache.spark.sql.expressions.Window.partitionBy("h")
    standingPruned.withColumn("is_new", lit(false))
      .unionByName(fpsNew.withColumn("is_new", lit(true)))
      .withColumn("has_new", max(col("is_new")).over(wh))
      .withColumn("has_old", max(!col("is_new")).over(wh))
      .filter(col("has_new") && col("has_old"))
      .select(col("doc_id"), col("pos"), col("is_new"))
  }

  def extendRepeatGroups(standing: RepeatInventory, standingDocs: DataFrame,
                         batch: DataFrame, idCol: Column,
                         textCol: Column,
                         checkDisjoint: Boolean = true): RepeatInventory = {
    val minLen = standing.minLen
    // the disjoint-id guard RIDES scans the fold already pays (guide
    // §1.2 — the r15 guard was a measured 4-job cost per crawl
    // batch), on BOTH standing tables the fold touches: the bloom
    // prefilter's standing-fps scan (every fingerprinted standing id,
    // checked whenever the batch fingerprints anything) and the
    // literal verify's standing-doc join (every standing id including
    // sub-minLen docs, checked whenever candidates exist). A batch
    // with NO fingerprints falls back to the explicit probe — its
    // detection is free, the bloom-sizing count below already knows.
    // Residual corner, accepted and bounded: a zero-CANDIDATE batch
    // colliding with a sub-minLen standing doc id folds unchecked —
    // but the collision lands that id in the standing fps, so the
    // very next fold's prefilter ride raises on it (loud one fold
    // late, never silent corruption that persists).
    val oldSrc0 = standingDocs.select(idCol.as("doc_id"), textCol.as("t"))
    val oldSrc =
      if (checkDisjoint)
        Guards.disjointIdsRide(oldSrc0, "doc_id", "doc_id",
          batch.select(idCol), "SuffixArray.extendRepeatGroups")
      else oldSrc0
    val newSrc = batch.select(idCol.as("doc_id"), textCol.as("t"))
    // LAZY pin: consumed by the batch miner, the probe, AND the folded
    // fps artifact — ONE linear fingerprint pass serves all three, and
    // the probe's bloom-sizing count below is the action that
    // materializes it, so the former separate eager-pin job is folded
    // into a pass the fold already pays (guide §1.2)
    val fpsNew = gramFps(newSrc, minLen)
      .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
    val nFpsNew = fpsNew.count() // bloom sizing + materializes the pin
    if (checkDisjoint && nFpsNew == 0L)
      Guards.requireDisjointIds(standingDocs.select(idCol),
        batch.select(idCol), "SuffixArray.extendRepeatGroups")
    val standingFpsGuarded =
      if (checkDisjoint)
        Guards.disjointIdsRide(standing.fps, "doc_id", "h",
          batch.select(idCol), "SuffixArray.extendRepeatGroups")
      else standing.fps
    // (1) the batch's own classes — O(batch) mining on the
    // fingerprint path (the doubling rounds would re-sort the batch
    // log2(minLen) times for classes the pinned fps already indexes);
    // consumed once by the final union, so no intermediate pin
    val membersNew = membersFromFps(fpsNew, newSrc, minLen)
    // (2) bipartite probe as ONE h-shuffle of the tagged union:
    // candidate positions are BOTH sides' occurrences of any hash
    // present on both sides (full-frame window — the 2-distinct +
    // 2-semi-join form shuffled the fps tables twice more for the
    // same h-partition worst case). The STANDING side is bloom-pruned
    // on the batch's hashes BEFORE its exchange (the [[BloomJoin]]
    // discipline — the standing fps is the corpus-sized side, and
    // without the prune every batch re-shuffles all of it): a false
    // positive only adds a standing-only h group the has_new gate
    // drops, so the answer is exact. Batches beyond ~1M gram
    // positions should raise the runtime bloomFilter maxNumItems/
    // maxNumBits confs (see [[BloomJoin.optimalNumBits]]).
    // pinned: consumed by the side map AND the literal verify — the
    // pin caps the corpus-sized h-window at ONE evaluation per batch
    val cand = extendCandidates(standingFpsGuarded, fpsNew, nFpsNew)
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    // (3) literal verify over candidate docs only; is_new is a
    // function of doc_id (ids are disjoint), re-attached by max()
    // through the block grouping
    val sideOf = cand
      .groupBy(col("doc_id")).agg(max(col("is_new")).as("is_new"))
    val grams = literalGrams(
        cand.select(col("doc_id"), col("pos")),
        oldSrc.unionByName(newSrc), minLen)
      .join(sideOf, Seq("doc_id"))
    // (4) crossing classes: thresholds + labels over the union
    // occurrences (the candidate set contains ALL of them)
    // pinned: consumed three times by the supersession union below
    val membersX = verifiedMembers(grams,
      w => Seq("has_new" -> max(col("is_new")).over(w),
        "has_old" -> max(!col("is_new")).over(w)),
      col("has_new") && col("has_old"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val xProbe = supersessionProbe(membersX)
    val members = membersX
      .unionByName(standing.members.join(xProbe,
        Seq("doc_id", "pos"), "left_anti"))
      .unionByName(membersNew.join(xProbe,
        Seq("doc_id", "pos"), "left_anti"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    // the eager members pin above fully consumed the cand and membersX
    // snapshots — drop them so a long crawl's block-manager usage
    // stays O(standing artifact), not O(batches seen) (the measured-
    // twin hygiene; the fpsNew pin STAYS, it is part of the returned
    // additive artifact)
    ConnectedComponents.unpersistCheckpoint(cand)
    ConnectedComponents.unpersistCheckpoint(membersX)
    // fps folds additively; the union stays LAZY over the pinned
    // pieces (materializing it would copy the corpus-sized table per
    // batch — the whole point of the additive artifact is not to)
    RepeatInventory(members, standing.fps.unionByName(fpsNew), minLen)
  }

  /** Persist a [[RepeatInventory]]: members + fps parquet and a
    * params manifest (the `KnnGraph.saveGraph` shape) — at scale the
    * fps write is bucketed by `h` so a batch probe reads only its
    * matching buckets.
    */
  def saveRepeatGroups(inv: RepeatInventory, path: String): Unit = {
    inv.members.write.mode("overwrite").parquet(s"$path/members")
    inv.fps.write.mode("overwrite").parquet(s"$path/fps")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "params.json"),
      s"""{"minLen":${inv.minLen}}""".getBytes("UTF-8"))
  }

  /** Load a persisted [[RepeatInventory]]; refuses a manifest missing
    * its geometry (an inventory probed under the wrong `minLen`
    * would fingerprint different grams than its members describe).
    */
  def loadRepeatGroups(spark: org.apache.spark.sql.SparkSession,
                       path: String): RepeatInventory = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "params.json")), "UTF-8")
    val m = """"minLen"\s*:\s*(-?\d+)""".r.findFirstMatchIn(txt)
    require(m.isDefined, "params.json missing minLen")
    RepeatInventory(spark.read.parquet(s"$path/members"),
      spark.read.parquet(s"$path/fps"), m.get.group(1).toInt)
  }
}
