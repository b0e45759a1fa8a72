package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact-substring (repeated token-span) deduplication — the corpus
  * hygiene pass of Lee et al., ACL'22 ("Deduplicating Training Data
  * Makes Language Models Better"): find token spans that occur more
  * than once across the corpus, and score each document by how much
  * of it is duplicated elsewhere. Complements the whole-document
  * families already in [[Dedup]] (exact), [[MinHash]]/[[SimHash]]
  * (near-dup) — those miss a unique document that EMBEDS a long span
  * copied from another document, which is exactly the memorization
  * vector substring dedup exists to catch.
  *
  * Lee et al. build a corpus-wide suffix array; that is a single-node
  * construction. The Spark-native equivalent is a rolling-window
  * inventory: every W-token window of every document becomes one row,
  * and a window whose content occurs >= 2 times anywhere in the corpus
  * is a duplicated span. A span of length L >= W duplicated between two
  * documents shows up as L-W+1 consecutive duplicated windows, so
  * window-level stats recover span-level structure without any global
  * ordering.
  *
  * Scale shape (100 TB):
  *   - the inventory is a NARROW fan-out (tokenize -> `sequence` ->
  *     `posexplode`), no shuffle, fan-out factor = tokens/doc;
  *   - duplicate detection groups by `xxhash64(window)` — an 8-byte
  *     shuffle key instead of the W-token string (~6x smaller for
  *     W=8), with map-side partial aggregation. The window TEXT is
  *     only shuffled for the few hashes that survive the >=2 filter
  *     (joined back, then min()-reduced) — never for the whole
  *     inventory;
  *   - a 64-bit hash collision merges two distinct spans (~n^2/2^65
  *     for n distinct windows — at 10^12 windows, ~0.03 expected
  *     collisions); Lee et al.'s own dedup tolerates the same class
  *     of error. The DuckDB oracle groups by the window text itself,
  *     so the correctness gate would surface a collision as a
  *     hash-mismatch rather than silently agreeing.
  *
  * Tokenization follows the corpus convention of the `documents`
  * table (single-space separated; [[TextStats.tokens]]).
  */
object SubstringDedup {

  /** One row per W-token rolling window: `(doc_id, pos, win_text, h)`.
    * Documents shorter than `windowTokens` contribute no windows.
    * Narrow (no shuffle); stays inside one whole-stage-codegen span.
    */
  def windowInventory(docs: DataFrame, idCol: Column, textCol: Column,
                      windowTokens: Int): DataFrame = {
    require(windowTokens > 0, "windowTokens must be positive")
    docs
      .select(idCol.as("doc_id"), TextStats.tokens(textCol).as("toks"))
      // guard BEFORE sequence(): Spark's sequence(0, n) with n < 0
      // yields a DESCENDING [0, .., n], not an empty array
      .filter(size(col("toks")) >= windowTokens)
      .select(col("doc_id"), col("toks"),
        posexplode(sequence(lit(0), size(col("toks")) - windowTokens))
          .as(Seq("pos", "start")))
      .select(col("doc_id"), col("pos"),
        array_join(slice(col("toks"), col("start") + 1, lit(windowTokens)), " ")
          .as("win_text"))
      .withColumn("h", xxhash64(col("win_text")))
  }

  /** Spans occurring in >= `minDocs` distinct documents:
    * `(win_text, n_docs, n_occ)`. Two shuffles: the hash-keyed
    * count (narrow 8-byte keys), then a text fetch-back restricted
    * to surviving hashes.
    */
  def repeatedSpans(docs: DataFrame, idCol: Column, textCol: Column,
                    windowTokens: Int, minDocs: Int = 2): DataFrame = {
    val inv = windowInventory(docs, idCol, textCol, windowTokens)
    val winners = inv.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
    inv.select(col("h"), col("win_text"))
      .join(winners, "h")
      .groupBy(col("h"), col("n_docs"), col("n_occ"))
      .agg(min(col("win_text")).as("win_text"))
      .select(col("win_text"), col("n_docs"), col("n_occ"))
  }

  /** Scrub: rebuild the corpus with every NON-CANONICAL duplicated
    * span occurrence removed — the actual dedup action of Lee et al.
    * ACL'22 (one occurrence of each duplicated substring survives,
    * corpus-wide). Canonical = the first occurrence in (doc_id, pos)
    * order; the token positions covered by every other occurrence are
    * dropped and the document re-joined from the survivors. Output:
    * `(doc_id, clean_text, n_dropped)` for EVERY input document
    * (untouched docs pass through with n_dropped = 0).
    *
    * Scale shape: the corpus itself never shuffles for dup DETECTION
    * (window hashes only); the drop-position sets come back to their
    * documents via a plain equi-join on doc_id — no forced broadcast
    * (the drop-set volume is proportional to the corpus's duplication
    * rate, which is unbounded: Lee et al. report >= 3% on web crawls,
    * far past any broadcast ceiling at 100 TB; AQE still picks a
    * broadcast build when the set is genuinely small). The rebuild
    * keeps positions via `array_except` (hash-set difference, O(n+m)
    * per touched document) + an indexed `transform` — not a per-token
    * `array_contains` scan, whose O(n*m) blows up on a pathological
    * dup-saturated document.
    */
  def scrubDuplicatedSpans(docs: DataFrame, idCol: Column, textCol: Column,
                           windowTokens: Int): DataFrame = {
    val inv = windowInventory(docs, idCol, textCol, windowTokens)
    val dupFirst = inv.groupBy(col("h"))
      .agg(count(lit(1)).as("occ"),
        min(struct(col("doc_id"), col("pos"))).as("first"))
      .filter(col("occ") >= 2)
    val dropPos = inv.join(dupFirst, "h")
      .filter(!(col("doc_id") === col("first.doc_id") &&
        col("pos") === col("first.pos")))
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + windowTokens - 1))
          .as("tpos"))
      .groupBy(col("doc_id"))
      .agg(array_sort(collect_set(col("tpos"))).as("drop_pos"))
    docs.select(idCol.as("doc_id"), TextStats.tokens(textCol).as("toks"))
      .join(dropPos, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        when(col("drop_pos").isNull, array_join(col("toks"), " "))
          // drop_pos non-null => doc had >= windowTokens tokens, so
          // sequence(0, size-1) is a well-formed ascending range;
          // array_except preserves first-array order, so the kept
          // positions stay sorted and the join re-assembles in place
          .otherwise(array_join(
            transform(
              array_except(sequence(lit(0), size(col("toks")) - 1),
                col("drop_pos")),
              i => element_at(col("toks"), i + 1)), " "))
          .as("clean_text"),
        // size(NULL) is -1 under legacy semantics — branch, don't coalesce
        when(col("drop_pos").isNull, lit(0L))
          .otherwise(size(col("drop_pos")).cast("long")).as("n_dropped"))
  }

  /** Per-document duplication score: `(doc_id, n_windows, dup_windows,
    * dup_ratio)` where a window is duplicated iff its content occurs
    * >= 2 times anywhere in the corpus (other documents or elsewhere
    * in the same one — self-repetition is duplication too, per Lee et
    * al. §3). Documents with fewer than `windowTokens` tokens report
    * `(0, 0, 0.0)` — too short to assess, not dropped.
    */
  def spanDupStats(docs: DataFrame, idCol: Column, textCol: Column,
                   windowTokens: Int): DataFrame = {
    val inv = windowInventory(docs, idCol, textCol, windowTokens)
    val dupH = inv.groupBy(col("h")).agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select(col("h"))
    val perDoc = inv
      .join(dupH.withColumn("dup", lit(1)), Seq("h"), "left_outer")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("dup"), lit(0))).as("dup_windows"))
    docs.select(idCol.as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("dup_windows"), lit(0L)).as("dup_windows"),
        when(coalesce(col("n_windows"), lit(0L)) === 0, lit(0.0))
          .otherwise(coalesce(col("dup_windows"), lit(0L)).cast("double") /
            col("n_windows").cast("double"))
          .as("dup_ratio"))
  }

  /** Document PAIRS sharing a verbatim character run of length ≥
    * `minLen` — the pair-level view the window stats above cannot
    * give (which documents copy from each other, the input the
    * canonical-copy/cluster policies key on). On WINNOWED
    * fingerprints: both occurrences of a shared ≥ minLen run select
    * the same k-gram seed at the same relative offset
    * ([[SuffixArray.winnowedPositions]], w = minLen − k + 1), so the
    * self-join on the selected hashes finds every qualifying pair at
    * ~2/(w+1) of the gram positions; each seed pair then verifies by
    * maximal literal run extension (collision-proof). Output:
    * (id_a, id_b) distinct with id_a < id_b.
    *
    * Scale shape: the join key is the 8-byte selected hash; candidate
    * volume tracks TRUE shared-run mass (+ collisions), never
    * corpus². The output itself is inherently quadratic in the
    * multiplicity of a hot span (10^6 copies of one boilerplate run
    * = C(10^6, 2) pairs — that IS the answer); [[winnowBucketAudit]]
    * is the standing monitor that says when that is happening, and
    * the remedies are [[verbatimDupPairsCapped]] (bounded candidate
    * mass, audited drops) or feeding the pairs to
    * [[ConnectedComponents]] (the `q_dup_clusters` policy) instead of
    * materializing them. The seed→text verify stage ships each text
    * once per (pair, 4096-char block) — [[groupedSeedPairs]] — never
    * once per seed.
    */
  def verbatimDupPairs(docs: DataFrame, idCol: Column, textCol: Column,
                       minLen: Int = 32, k: Int = 16): DataFrame = {
    require(k >= 2 && k < minLen, s"need 2 <= k < minLen, got k=$k minLen=$minLen")
    val w = minLen - k + 1
    val src = docs.select(idCol.as("doc_id"), textCol.as("t"))
    pairsFromSeeds(seedPairs(SuffixArray.winnowedFps(src, k, w)), src,
      minLen, k)
  }

  /** [[verbatimDupPairs]] behind the session artifact cache — the
    * verified pair table is the evidence input of every verbatim-copy
    * policy (cluster derivation, leakage-safe splitting, keep-best),
    * so one winnow-probe-extend pass per (session, corpus, geometry)
    * serves them all; the first toucher is charged the build (the
    * `sharedGraph` accounting).
    */
  def sharedVerbatimDupPairs(docs: DataFrame, idCol: Column, textCol: Column,
                             minLen: Int = 32, k: Int = 16,
                             cacheKey: Option[String] = None): DataFrame =
    cacheKey match {
      case None => verbatimDupPairs(docs, idCol, textCol, minLen, k)
      case Some(src) => SessionArtifactCache.getOrBuild(
        docs.select(idCol, textCol),
        tag = s"verbatim_pairs:$src", params = s"minLen=$minLen,k=$k") {
        verbatimDupPairs(docs, idCol, textCol, minLen, k)
      }
    }

  /** PERSIST the verified verbatim pair table — the policy-layer
    * artifact every verbatim-copy policy reads (cluster derivation,
    * keep-best, leakage-safe splitting). The session cache
    * ([[sharedVerbatimDupPairs]]) collapses re-derivation WITHIN a
    * session; this is the across-session half: parquet + a manifest
    * carrying the EVIDENCE GEOMETRY (minLen, k), so a loaded table
    * can never silently mix with pairs derived under different
    * winnowing (a pair verified at minLen 32 is not a pair at 64).
    * The [[saveWinnowIndex]] shape.
    */
  def saveVerbatimPairs(pairs: DataFrame, minLen: Int, k: Int,
                        path: String): Unit = {
    pairs.write.mode("overwrite").parquet(s"$path/pairs")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "params.json"),
      s"""{"minLen":$minLen,"k":$k}""".getBytes("UTF-8"))
  }

  /** Load a persisted pair table with its evidence geometry; refuses
    * a manifest missing either field.
    */
  def loadVerbatimPairs(spark: org.apache.spark.sql.SparkSession,
                        path: String): (DataFrame, Int, Int) = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "params.json")), "UTF-8")
    def intOf(key: String): Int = {
      val m = s""""$key"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(txt)
      require(m.isDefined, s"params.json missing $key")
      m.get.group(1).toInt
    }
    (spark.read.parquet(s"$path/pairs"), intOf("minLen"), intOf("k"))
  }

  /** The winnowed pair probe's seed self-join: (id_a, pos_a, id_b,
    * pos_b) rows where both documents selected the same k-gram hash
    * (id_a < id_b). The 8-byte-key join whose candidate volume tracks
    * true shared-run mass — and the one stage a hot boilerplate span
    * detonates ([[winnowBucketAudit]] watches it; [[
    * verbatimDupPairsCapped]] bounds it).
    */
  private[ops] def seedPairs(wfps: DataFrame): DataFrame =
    wfps.select(col("doc_id").as("id_a"), col("pos").as("pos_a"), col("h"))
      .join(wfps.select(col("doc_id").as("id_b"), col("pos").as("pos_b"),
        col("h")), Seq("h"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("pos_a"), col("id_b"), col("pos_b"))

  /** Seeds grouped per (pair, pos_a block) for the extension join —
    * the [[SuffixArray.literalGrams]] block discipline: a heavily
    * seeded document ships its text once per (pair, ≤4096-char
    * block), never once per seed, and a pathological
    * every-position-seeded pair becomes len/4096 bounded list rows
    * instead of one unbounded aggregation buffer.
    */
  private[ops] def groupedSeedPairs(seeds: DataFrame): DataFrame =
    seeds.groupBy(col("id_a"), col("id_b"),
        (col("pos_a") / lit(SuffixArray.ScrubBlockChars)).cast("long")
          .as("blk"))
      .agg(collect_list(struct(col("pos_a"), col("pos_b"))).as("pp"))

  /** Verify + emit: group seeds per (pair, block), join each text ONCE
    * per group row, extend every seed in the block against the decoded
    * pair ([[SuffixArray.extendRuns]]), and keep pairs with any
    * verified run ≥ minLen.
    */
  private def pairsFromSeeds(seeds: DataFrame, src: DataFrame,
                             minLen: Int, k: Int): DataFrame =
    groupedSeedPairs(seeds)
      .join(src.select(col("doc_id").as("id_a"), col("t").as("ta")), Seq("id_a"))
      .join(src.select(col("doc_id").as("id_b"), col("t").as("tb")), Seq("id_b"))
      .filter(size(SuffixArray.extendRunsUdf(col("ta"), col("tb"), col("pp"),
        lit(k), lit(minLen))) > 0)
      .select(col("id_a"), col("id_b"))
      .distinct()

  /** Bucket-skew audit for the winnowed pair join — the
    * [[MinHash.bucketAudit]] shape on the selected-hash buckets: the
    * (h, n_sel, n_docs) fingerprint buckets holding more than
    * `minBucket` selected positions. [[verbatimDupPairs]] does not cap
    * its buckets (completeness is the contract), so a boilerplate
    * span selected by 10⁶ documents — C(10⁶,2) seed rows before the
    * distinct — shows up here as the quadratic-join early warning
    * rather than as silent skew. Bounded output: ≤ fps/minBucket
    * rows.
    */
  def winnowBucketAudit(docs: DataFrame, idCol: Column, textCol: Column,
                        minLen: Int = 32, k: Int = 16,
                        minBucket: Long = 10000L): DataFrame = {
    require(k >= 2 && k < minLen, s"need 2 <= k < minLen, got k=$k minLen=$minLen")
    val src = docs.select(idCol.as("doc_id"), textCol.as("t"))
    bucketCounts(SuffixArray.winnowedFps(src, k, minLen - k + 1))
      .filter(col("n_sel") > minBucket)
  }

  private def bucketCounts(wfps: DataFrame): DataFrame =
    wfps.groupBy(col("h"))
      .agg(count(lit(1)).as("n_sel"),
        countDistinct(col("doc_id")).as("n_docs"))

  /** [[winnowBucketAudit]] with the hot buckets' LITERAL k-grams
    * fetched back — (gram, n_sel, n_docs), the human-readable (and
    * oracle-checkable) monitor row: WHAT boilerplate is hot, not just
    * that an 8-byte hash is. The fetch touches one representative
    * (doc, pos) per hot bucket (min-struct canonical), so its cost is
    * audit-bounded, never corpus-bounded.
    */
  def winnowBucketAuditGrams(docs: DataFrame, idCol: Column, textCol: Column,
                             minLen: Int = 32, k: Int = 16,
                             minBucket: Long = 10000L): DataFrame = {
    require(k >= 2 && k < minLen, s"need 2 <= k < minLen, got k=$k minLen=$minLen")
    val src = docs.select(idCol.as("doc_id"), textCol.as("t"))
    val wfps = SuffixArray.winnowedFps(src, k, minLen - k + 1)
      .localCheckpoint(eager = false)
    val hot = bucketCounts(wfps).filter(col("n_sel") > minBucket)
    val rep = wfps.join(broadcast(hot.select(col("h"))), Seq("h"))
      .groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("r"))
      .select(col("h"), col("r.doc_id").as("doc_id"), col("r.pos").as("pos"))
    SuffixArray.literalGrams(rep.select(col("doc_id"), col("pos")), src, k)
      .join(rep, Seq("doc_id", "pos"))
      .join(hot, Seq("h"))
      .select(col("gram"), col("n_sel"), col("n_docs"))
  }

  /** [[verbatimDupPairs]] with the quadratic hazard BOUNDED — the
    * opt-in capped path ([[graft.multimodal.PerceptualHash
    * .hammingPairs]]'s cap discipline): selected-hash buckets holding
    * more than `maxBucket` fingerprint rows are excluded from the
    * seed self-join, so candidate mass is ≤ fps·maxBucket, never
    * C(hot multiplicity, 2). The first-surviving-seed exception is
    * INHERENT here: the cap drops seed ROWS, not pairs, and the
    * terminal distinct means any pair whose shared run also selects a
    * below-cap seed — every run longer than one winnow window does —
    * still surfaces through that seed. What the cap can silence is
    * exactly a pair whose ONLY shared seeds are hot, and
    * [[winnowBucketAudit]] at the same threshold lists those buckets
    * — capped is audited, never silent. Feed hot buckets to
    * [[ConnectedComponents]]-based cluster policies instead of pair
    * enumeration (one hot span shared by m docs IS one cluster, not
    * C(m,2) pairs of interest).
    */
  def verbatimDupPairsCapped(docs: DataFrame, idCol: Column, textCol: Column,
                             minLen: Int = 32, k: Int = 16,
                             maxBucket: Long = 10000L): DataFrame = {
    require(k >= 2 && k < minLen, s"need 2 <= k < minLen, got k=$k minLen=$minLen")
    val w = minLen - k + 1
    val src = docs.select(idCol.as("doc_id"), textCol.as("t"))
    // the fps table feeds the bucket counts AND the (capped) self-join:
    // one lazy localCheckpoint materializes the winnowing pass once
    // (MEMORY_AND_DISK), the MinHash.nearDupPairs per-call scoping
    val wfps = SuffixArray.winnowedFps(src, k, w)
      .localCheckpoint(eager = false)
    val ok = bucketCounts(wfps).filter(col("n_sel") <= maxBucket)
      .select(col("h"))
    pairsFromSeeds(seedPairs(wfps.join(ok, Seq("h"), "left_semi")), src,
      minLen, k)
  }

  // ---- standing winnowed index (index maintenance) -----------------

  /** The STANDING winnowed-fingerprint state — the pair probe's
    * member of the standing-index family (the
    * [[SuffixArray.RepeatInventory]] accounting): the ADDITIVE
    * selected-fingerprint table (doc_id, pos, h), one row per
    * winnow-selected k-gram position. Winnowing is per-document, so
    * disjoint-id batches fold by plain append — extend IS train over
    * the union, with no completion pass at all (the property the
    * whole sampled family was designed around). The corpus TEXT is a
    * separate standing table (the convention of every index here);
    * probes touch only candidate documents of it.
    */
  final case class WinnowIndex(fps: DataFrame, minLen: Int, k: Int)

  /** Fingerprint the corpus once (eagerly pinned — the table IS the
    * artifact; at deployment, h-bucketed parquet).
    */
  def buildWinnowIndex(docs: DataFrame, idCol: Column, textCol: Column,
                       minLen: Int = 32, k: Int = 16): WinnowIndex = {
    require(k >= 2 && k < minLen, s"need 2 <= k < minLen, got k=$k minLen=$minLen")
    WinnowIndex(
      SuffixArray.winnowedFps(
        docs.select(idCol.as("doc_id"), textCol.as("t")), k, minLen - k + 1)
        .localCheckpoint(),
      minLen, k)
  }

  /** [[buildWinnowIndex]] behind the session artifact cache — one
    * fingerprint pass per (corpus, geometry) per session, every
    * probe reads the same pinned table (the `sharedRepeatInventory`
    * accounting: the first toucher is charged the build; the timed
    * loop is the O(batch) probe/extend).
    */
  def sharedWinnowIndex(docs: DataFrame, idCol: Column, textCol: Column,
                        minLen: Int = 32, k: Int = 16,
                        cacheKey: Option[String] = None): WinnowIndex =
    cacheKey match {
      case None => buildWinnowIndex(docs, idCol, textCol, minLen, k)
      case Some(src) => WinnowIndex(
        SessionArtifactCache.getOrBuild(docs.select(idCol, textCol),
          tag = s"winnow_fps:$src", params = s"minLen=$minLen,k=$k") {
          SuffixArray.winnowedFps(
            docs.select(idCol.as("doc_id"), textCol.as("t")),
            k, minLen - k + 1)
        }, minLen, k)
    }

  /** Fold a disjoint-id batch in: fingerprint ONLY the batch (one
    * linear pass), append. Exactly `buildWinnowIndex(standing ∪
    * batch)` by construction — winnowing never looks across
    * documents.
    */
  def extendWinnowIndex(idx: WinnowIndex, batch: DataFrame,
                        idCol: Column, textCol: Column,
                        checkDisjoint: Boolean = true): WinnowIndex = {
    if (checkDisjoint)
      Guards.requireDisjointIds(idx.fps.select(col("doc_id")),
        batch.select(idCol), "SubstringDedup.extendWinnowIndex")
    WinnowIndex(
      idx.fps.unionByName(SuffixArray.winnowedFps(
        batch.select(idCol.as("doc_id"), textCol.as("t")),
        idx.k, idx.minLen - idx.k + 1).localCheckpoint()),
      idx.minLen, idx.k)
  }

  /** Persist / load (the `saveGraph` manifest shape). */
  def saveWinnowIndex(idx: WinnowIndex, path: String): Unit = {
    idx.fps.write.mode("overwrite").parquet(s"$path/fps")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "params.json"),
      s"""{"minLen":${idx.minLen},"k":${idx.k}}""".getBytes("UTF-8"))
  }

  def loadWinnowIndex(spark: org.apache.spark.sql.SparkSession,
                      path: String): WinnowIndex = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "params.json")), "UTF-8")
    def intOf(key: String): Int = {
      val m = s""""$key"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(txt)
      require(m.isDefined, s"params.json missing $key")
      m.get.group(1).toInt
    }
    WinnowIndex(spark.read.parquet(s"$path/fps"), intOf("minLen"), intOf("k"))
  }

  /** INCREMENTAL pair probe — verbatim dup pairs TOUCHING a new
    * batch (batch↔standing and batch↔batch), without re-pairing the
    * standing corpus: exactly
    * `verbatimDupPairs(standing ∪ batch)` minus the standing-only
    * pairs (spec-pinned equal). The crawl-loop form of the E1 pair
    * view — per batch, only the batch is fingerprinted; the
    * corpus-sized standing fps is BLOOM-PRUNED on the batch's hashes
    * BEFORE its exchange (the [[BloomJoin]] discipline — a false
    * positive only adds a seed the literal extension rejects), so
    * candidate mass tracks the batch's true overlap, never the
    * corpus. `standingDocs` supplies candidate texts only (the
    * extendRepeatGroups convention); batch ids must be disjoint from
    * standing ids.
    */
  def dupPairsAgainst(idx: WinnowIndex, standingDocs: DataFrame,
                      batch: DataFrame, idCol: Column,
                      textCol: Column,
                      checkDisjoint: Boolean = true): DataFrame =
    incrPairs(idx, standingDocs, batch, idCol, textCol, maxBucket = None,
      checkDisjoint)

  /** [[dupPairsAgainst]] with the incremental form of
    * [[verbatimDupPairsCapped]]'s bound: selected-hash buckets whose
    * TOUCHED population (the bloom-pruned standing rows of that hash
    * plus the batch's) exceeds `maxBucket` are excluded from the
    * probe join — a hot boilerplate span arriving via the crawl is
    * exactly as quadratic here as in the batch path (the batch copy
    * meets EVERY standing copy), and exactly as cappable: seed rows
    * drop, pairs with any below-cap shared seed survive, and
    * [[probeBucketAudit]] at the same threshold lists what only hot
    * seeds could witness. The cap accounting is PROBE-BOUNDED: the
    * pruned standing side holds only the batch-touched hashes, so
    * the bucket count costs candidate mass, never a corpus pass.
    */
  def dupPairsAgainstCapped(idx: WinnowIndex, standingDocs: DataFrame,
                            batch: DataFrame, idCol: Column,
                            textCol: Column,
                            maxBucket: Long = 10000L,
                            checkDisjoint: Boolean = true): DataFrame =
    incrPairs(idx, standingDocs, batch, idCol, textCol, Some(maxBucket),
      checkDisjoint)

  /** Bucket-skew audit for the INCREMENTAL probe — what
    * [[dupPairsAgainstCapped]] would silence at `minBucket`: the
    * (h, n_sel, n_docs) TOUCHED buckets (pruned standing ∪ batch)
    * above the bound. Probe-bounded like the cap itself.
    */
  def probeBucketAudit(idx: WinnowIndex, batch: DataFrame, idCol: Column,
                       textCol: Column, minBucket: Long): DataFrame = {
    val bfps = SuffixArray.winnowedFps(
      batch.select(idCol.as("doc_id"), textCol.as("t")),
      idx.k, idx.minLen - idx.k + 1).localCheckpoint(eager = false)
    bucketCounts(BloomJoin.prefilter(idx.fps, col("h"), bfps, col("h"),
        expectedItems = math.max(bfps.count(), 1L))
      .unionByName(bfps))
      .filter(col("n_sel") > minBucket)
  }

  private def incrPairs(idx: WinnowIndex, standingDocs: DataFrame,
                        batch: DataFrame, idCol: Column, textCol: Column,
                        maxBucket: Option[Long],
                        checkDisjoint: Boolean = true): DataFrame = {
    // the disjoint-id guard RIDES the bloom prefilter's standing scan
    // instead of running its own job per probe (guide §1.2 — the r15
    // guard job was the measured cost of the winnow crawl twin):
    // every standing fps row's h evaluation first checks its doc_id
    // against the broadcast batch-id set, and the prefilter evaluates
    // h on every standing row, so the check cannot be bypassed. It
    // fires at the probe's action rather than at call time — the
    // probe's result is always consumed per batch, so the failure is
    // exactly as loud, one standing pass cheaper.
    val standingFps =
      if (checkDisjoint)
        Guards.disjointIdsRide(idx.fps, "doc_id", "h",
          batch.select(idCol), "SubstringDedup.dupPairsAgainst")
      else idx.fps
    val bSrc = batch.select(idCol.as("doc_id"), textCol.as("t"))
    val sSrc = standingDocs.select(idCol.as("doc_id"), textCol.as("t"))
    val bfps = SuffixArray.winnowedFps(bSrc, idx.k, idx.minLen - idx.k + 1)
      .localCheckpoint(eager = false)
    val standingPruned = BloomJoin.prefilter(standingFps, col("h"),
      bfps, col("h"), expectedItems = math.max(bfps.count(), 1L))
    // optional cap over the TOUCHED buckets (pruned standing ∪ batch)
    // — both join sides filter to the same below-cap hash set
    val (sSide, bSide) = maxBucket match {
      case None => (standingPruned, bfps)
      case Some(cap) =>
        val ok = bucketCounts(standingPruned.unionByName(bfps))
          .filter(col("n_sel") <= cap).select(col("h"))
          .localCheckpoint(eager = false)
        (standingPruned.join(ok, Seq("h"), "left_semi"),
         bfps.join(ok, Seq("h"), "left_semi"))
    }
    // candidates with >= 1 batch side: batch×(standing ∪ batch);
    // (min, max) id normalization keeps the id_a < id_b convention
    // and the terminal distinct collapses the batch-batch double count
    val seeds = bSide.select(col("doc_id").as("bid"), col("pos").as("bpos"),
        col("h"))
      .join(sSide.unionByName(bSide)
        .select(col("doc_id").as("oid"), col("pos").as("opos"), col("h")),
        Seq("h"))
      .filter(col("bid") =!= col("oid"))
      .select(
        least(col("bid"), col("oid")).as("id_a"),
        when(col("bid") < col("oid"), col("bpos")).otherwise(col("opos"))
          .as("pos_a"),
        greatest(col("bid"), col("oid")).as("id_b"),
        when(col("bid") < col("oid"), col("opos")).otherwise(col("bpos"))
          .as("pos_b"))
    pairsFromSeeds(seeds, sSrc.unionByName(bSrc), idx.minLen, idx.k)
  }

  /** The winnowing selection of a CONSTANT string, pure JVM (no
    * Spark): the selected k-gram literals a planted hot span
    * contributes to every copy. A planted fixture's audit oracle
    * inlines these — the selection of a constant is itself a
    * constant, so inlining is a replay of public winnowing
    * (Schleimer et al., SIGMOD'03), not a second data path; the
    * data-dependent part of the oracle (the bucket COUNTS) stays
    * independently computed.
    */
  def winnowedGramsOf(text: String, minLen: Int, k: Int): Seq[String] = {
    require(k >= 2 && k < minLen, s"need 2 <= k < minLen, got k=$k minLen=$minLen")
    val cps = text.codePoints.toArray
    val hs = SuffixArray.gramHashes(text, k)
    SuffixArray.winnowedPositions(hs, minLen - k + 1)
      .map(p => new String(cps, p, k)).toSeq
  }
}
