package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ArrayExprs

/** N-gram language-model quality scoring and importance weighting —
  * the two selection signals a web-scale training-data pipeline runs
  * after dedup and before mixing:
  *
  *  - [[perplexity]]: CCNet-style (Wenzek et al. 2020) bigram-LM
  *    scoring — train an add-one-smoothed bigram model on a trusted
  *    reference slice, score every document by mean negative
  *    log-probability per bigram ("bits per token"); low-perplexity
  *    documents read like the reference corpus.
  *  - [[dsirWeights]]: DSIR-style (Xie et al. 2023) importance
  *    weights over HASHED n-gram features — log-likelihood ratio of
  *    a target-slice unigram feature model vs the raw-corpus model,
  *    summed over each document's (hashed) unigram+bigram
  *    occurrences; the top-weighted documents are the ones importance
  *    resampling would keep.
  *
  * No reference analog (north-star extension, text-analysis family).
  *
  * Engine-portable by construction: every probability is a ratio of
  * integer counts, and every log is [[ArrayExprs.ilog2fp]] — the
  * fixed-point square-and-shift log2 that any engine replays
  * bit-for-bit — so both operators hash-match a DuckDB oracle
  * (logprob_fp = ilog2fp(num) − ilog2fp(den), 2^-16 resolution; the
  * honest alternative, libm `ln`, differs across engines in the last
  * ulp and can never hash-match).
  *
  * Scale shape (the 100 TB audit):
  *  - model tables are COUNT-CUTOFF-BOUNDED (vocab ≥ [[MinCount]],
  *    DSIR buckets exactly [[Buckets]] rows) and broadcast; the
  *    corpus is never joined against anything corpus-sized.
  *  - scoring is one explode over document bigrams → broadcast
  *    lookups → one partial-aggregated groupBy(doc_id): a single
  *    corpus-wide shuffle whose map-side output is one row per
  *    (partition, doc).
  *  - model training is one groupBy over reference n-grams (bounded
  *    output) plus 1-row total aggregates crossJoin-broadcast back
  *    (the [[Rank.valueRanks]] scalar pattern).
  *  - all ilog2fp calls run on model-bounded tables or fold into the
  *    scoring stage's whole-stage codegen (native expression, no UDF).
  */
object Lm {

  /** Fixed-point fraction bits of the logprob currency. */
  val F = 16

  /** Vocabulary count cutoff: reference tokens seen fewer times map
    * to `<unk>` (CCNet trains on a cutoff vocabulary for the same
    * reason — the LM table must be bounded regardless of corpus
    * size).
    */
  val MinCount = 5L

  /** `<unk>` OOV sentinel. A literal `<unk>` token in real text DOES
    * collide with it — its occurrences merge into the OOV statistics
    * (and can enter the vocabulary if the reference slice carries it
    * ≥ [[MinCount]] times). That is the standard CCNet/KenLM
    * behavior: both engines treat it identically, so scores stay
    * oracle-exact; nothing here may ever rely on the sentinel being
    * collision-free.
    */
  val Unk = "<unk>"

  /** DSIR hashed-feature bucket count (the feature table is EXACTLY
    * this many rows at any corpus size — that is the point of
    * hashing).
    */
  val Buckets = 8192L

  /** Seed for the feature hash ([[graft.functions.kernels.polyHash]]
    * seeded variant — unseeded rolling hashes map short tokens to
    * small values and starve the high buckets).
    */
  val HashSeed = 99991L

  /** Documents kept by [[dsirWeights]] (top weights, ties to the
    * smaller doc_id).
    */
  val TopK = 100

  /** Documents drawn by [[dsirSample]] (Gumbel-top-k, without
    * replacement, ∝ importance weight).
    */
  val SampleK = 150

  /** Default seed for [[dsirSample]]'s per-document Gumbel noise. */
  val SampleSeed = 424243L

  /** Whitespace tokens of the lowered, trimmed text; empty strings
    * dropped (empty text yields an empty array, not [""]).
    *
    * The split class is EXPLICIT — `[ \t\n\x0B\f\r]+`, Java's `\s`
    * spelled out — because the oracle replays it in RE2, whose `\s`
    * does NOT match vertical tab (\x0B) while Java's does: a `\s+`
    * on both sides would silently tokenize differently on such
    * input. (Deliberately NOT [[TextStats.tokensWs]], which keeps
    * the `\s+` spelling for the single-engine statistics paths.)
    */
  def tokens(textCol: Column): Column =
    filter(split(trim(lower(textCol)), "[ \\t\\n\\x0B\\f\\r]+"),
      t => length(t) > lit(0))

  /** Adjacent-pair structs (rw1, rw2) of a token array: one struct
    * per position 0..n-2; size-<2 arrays yield an empty list. Kept as
    * transform + element_at (O(1) per element) so the whole bigram
    * explode stays in one projection.
    */
  private def bigramPairs(ts: Column): Column =
    transform(
      slice(ts, lit(1), greatest(size(ts) - 1, lit(0))),
      (t, i) => struct(t.as("rw1"), element_at(ts, i + 2).as("rw2")))

  /** (doc_id, is_ref, ts) token frame shared by both operators. */
  private def tokenFrame(docs: DataFrame, refPred: Column): DataFrame =
    docs.filter(col("text").isNotNull)
      .select(col("doc_id"), refPred.as("is_ref"),
        tokens(col("text")).as("ts"))

  /** The ADDITIVE sufficient statistics of the bigram LM — raw
    * (pre-`<unk>`) reference unigram counts `words(w, c)` and bigram
    * counts `rawBg(rw1, rw2, c)`. Counts are additive, so extending
    * the model with a new reference batch is a pure count-merge
    * ([[extend]]) and the artifact persists as plain parquet
    * ([[saveModel]]/[[loadModel]]) — the same standing-artifact
    * discipline as [[Bpe.BpeModel]] / [[MinHash.saveIndex]]. The
    * cutoff vocabulary and the smoothed logprob tables DERIVE from
    * these (bounded work on model-sized inputs, see [[scoreWith]]) —
    * they are deliberately NOT stored, because a bigram whose count
    * crosses [[MinCount]] only after an extension must re-enter the
    * vocabulary, which a post-cutoff artifact could never replay.
    * Of the two frames only the DERIVED cutoff tables are ever
    * broadcast; rawBg itself grows with reference diversity (Heaps'
    * law sub-linear) and lives on disk / in shuffles only.
    */
  case class LmModel(words: DataFrame, rawBg: DataFrame)

  /** Count the additive model statistics over the `refPred` slice —
    * the one corpus-scale pass of LM training (two map-side-combined
    * aggregations over the same token scan).
    */
  def trainCounts(docs: DataFrame, refPred: Column): LmModel = {
    val ref = tokenFrame(docs, refPred).filter(col("is_ref"))
    LmModel(
      words = ref.select(explode(col("ts")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c")),
      rawBg = ref.select(explode(bigramPairs(col("ts"))).as("p"))
        .select(col("p.rw1").as("rw1"), col("p.rw2").as("rw2"))
        .groupBy("rw1", "rw2").agg(count(lit(1)).as("c")))
  }

  /** Fold a NEW reference batch into a standing model: count the
    * batch ([[trainCounts]]) and merge counts — O(batch + model)
    * work, the old corpus is never re-read. Spec-pinned equal to a
    * full retrain over the union (LmSpec).
    */
  def extend(model: LmModel, newDocs: DataFrame, refPred: Column): LmModel = {
    val n = trainCounts(newDocs, refPred)
    def mergeOn(keys: Seq[String])(a: DataFrame, b: DataFrame) =
      a.unionByName(b).groupBy(keys.map(col): _*)
        .agg(sum(col("c")).as("c"))
    LmModel(
      words = mergeOn(Seq("w"))(model.words, n.words),
      rawBg = mergeOn(Seq("rw1", "rw2"))(model.rawBg, n.rawBg))
  }

  /** PERSIST the model's additive statistics as a parquet artifact:
    * `path/words` and `path/raw_bigrams`.
    */
  def saveModel(model: LmModel, path: String): Unit = {
    model.words.write.mode("overwrite").parquet(s"$path/words")
    model.rawBg.write.mode("overwrite").parquet(s"$path/raw_bigrams")
  }

  /** Load a persisted [[LmModel]] (the files ARE the
    * materialization).
    */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
                path: String): LmModel =
    LmModel(
      spark.read.parquet(s"$path/words"),
      spark.read.parquet(s"$path/raw_bigrams"))

  /** Score `docs` against a trained model: derive the cutoff
    * vocabulary and the three PRECOMPUTED logprob arms from the
    * additive counts (model-bounded work), then explode each
    * document's bigrams through broadcast lookups and one
    * partial-aggregated groupBy(doc_id).
    *
    * Model: P(w2|w1) = (c(w1,w2)+1) / (c1(w1)+V), tokens below
    * [[MinCount]] mapped to [[Unk]] BEFORE counting (so `<unk>`
    * participates in bigrams); V = |vocab|+1. A scored bigram falls
    * through three arms — exact bigram hit, prefix-only backoff
    * (c=0 numerator), unseen-prefix floor 1/V.
    *
    * Output: (doc_id, n_bigrams, nll_fp, bits_fp) ordered by doc_id;
    * nll_fp = Σ −logprob_fp, bits_fp = nll_fp div n (mean bits per
    * bigram, still 2^16 fixed-point). Documents with < 2 tokens or
    * NULL text are dropped.
    */
  def scoreWith(model: LmModel, docs: DataFrame): DataFrame =
    scoreWithTables(scoreTables(model), docs)

  /** The DERIVED, bounded lookup tables of a trained model — cutoff
    * vocabulary, the V scalar, and the two precomputed logprob arms.
    * Derivation is model-bounded work; a long-lived consumer (the
    * streaming twin) derives once and localCheckpoints the frames so
    * every micro-batch reuses the materialization.
    */
  case class LmScoreTables(vocab: DataFrame, vc: DataFrame,
                           bg: DataFrame, pf: DataFrame)

  // map a raw-token column through the (broadcast) vocab -> unk
  private def unkMapped(vocab: DataFrame, side: String, out: String)(
      df: DataFrame): DataFrame = {
    val v = vocab.withColumnRenamed("w", s"_$out")
    df.join(broadcast(v), col(side) === col(s"_$out"), "left")
      .withColumn(out,
        when(col(s"_$out").isNotNull, col(side)).otherwise(lit(Unk)))
      .drop(side, s"_$out")
  }

  def scoreTables(model: LmModel): LmScoreTables = {
    // cutoff vocabulary (bounded) and V = |vocab| + 1 (the <unk>)
    val vocab = model.words.filter(col("c") >= lit(MinCount)).select("w")
    val vc = vocab.agg((count(lit(1)) + lit(1L)).as("v"))

    // unk-mapped reference bigram counts from the raw statistics —
    // re-aggregated AFTER mapping, identical to counting mapped
    // pairs directly (sum of counts is count of occurrences)
    val refBg =
      unkMapped(vocab, "rw2", "w2")(unkMapped(vocab, "rw1", "w1")(model.rawBg))
        .groupBy("w1", "w2").agg(sum(col("c")).as("c"))

    // prefix totals + precomputed logprob arms (model-bounded rows)
    val pf = refBg.groupBy("w1").agg(sum(col("c")).as("c1"))
      .crossJoin(broadcast(vc))
      .withColumn("backoff_fp",
        -ArrayExprs.ilog2fp(col("c1") + col("v")))
      .select("w1", "c1", "backoff_fp")
    val bg = refBg.join(pf.select("w1", "c1"), Seq("w1"))
      .crossJoin(broadcast(vc))
      .withColumn("logp_fp",
        ArrayExprs.ilog2fp(col("c") + lit(1L)) -
          ArrayExprs.ilog2fp(col("c1") + col("v")))
      .select("w1", "w2", "logp_fp")
    LmScoreTables(vocab, vc, bg, pf)
  }

  def scoreWithTables(t: LmScoreTables, docs: DataFrame): DataFrame = {
    // scoring: explode every document's bigrams, map through vocab,
    // three-arm lookup, one partial-aggregated groupBy(doc_id)
    val toks = tokenFrame(docs, lit(false))
    val docPairs = toks
      .select(col("doc_id"), explode(bigramPairs(col("ts"))).as("p"))
      .select(col("doc_id"), col("p.rw1").as("rw1"), col("p.rw2").as("rw2"))
    val scored =
      unkMapped(t.vocab, "rw2", "w2")(unkMapped(t.vocab, "rw1", "w1")(docPairs))
        .join(broadcast(t.bg), Seq("w1", "w2"), "left")
        .join(broadcast(t.pf.select("w1", "backoff_fp")), Seq("w1"), "left")
        .crossJoin(broadcast(t.vc))
        .withColumn("lp_fp",
          coalesce(col("logp_fp"), col("backoff_fp"),
            -ArrayExprs.ilog2fp(col("v"))))
    // NO ordering here: the parquet-landing streaming consumers
    // (lmScoreBatches/selfLmBatches) have a row-SET contract, and a
    // per-batch global sort would be a pure-waste range shuffle —
    // the batch entry point [[perplexity]] adds the oracle's ORDER BY
    scored.groupBy("doc_id").agg(
      count(lit(1)).as("n_bigrams"),
      (-sum(col("lp_fp"))).as("nll_fp"))
      .withColumn("bits_fp", expr("nll_fp div n_bigrams"))
  }

  /** One-shot form: train on the `refPred` slice of `docs` and score
    * every document — [[trainCounts]] ∘ [[scoreWith]], ordered by
    * doc_id (the deterministic-output contract of the declared
    * queries).
    */
  def perplexity(docs: DataFrame, refPred: Column): DataFrame =
    scoreWith(trainCounts(docs, refPred), docs).orderBy("doc_id")

  /** CCNet's last step: equi-depth k-tiles of the perplexity scores
    * (k=3 → head/middle/tail; bucket 1 = lowest perplexity = keep).
    * Composes [[perplexity]] with [[Rank.valueRanks]] — the exact
    * distributed global rank, NO single-partition window anywhere.
    * The rank table is one row per DISTINCT bits_fp value, which the
    * fixed-point representation bounds at ~4.1M rows (63·2^16
    * representable means) at ANY corpus size — join it however the
    * optimizer likes, it never scales with the corpus. Output
    * (doc_id, bits_fp, bucket) ordered by doc_id.
    */
  def perplexityBuckets(docs: DataFrame, refPred: Column,
                        k: Int = 3): DataFrame = {
    // the scored frame feeds BOTH the rank derivation and the final
    // join — a lazy localCheckpoint materializes the train+score pass
    // once instead of running the whole LM twice (unordered form: the
    // tail orderBy below is the only sort this composition needs)
    val scores = scoreWith(trainCounts(docs, refPred), docs)
      .localCheckpoint(false)
    val ranks = Rank.valueRanks(scores, col("bits_fp"), k)
      .select(col("v"), col("bucket"))
    scores.join(ranks, scores("bits_fp").cast("double") === ranks("v"))
      .select(col("doc_id"), col("bits_fp"), col("bucket"))
      .orderBy("doc_id")
  }

  // feature hashing lives in the fused native kernel
  // (ArrayExprs.dsirBuckets): one pass per document, compositional
  // rolling hash for the bigrams — bit-identical to hashing the
  // "w1 w2" concatenation, which is what the oracle replays

  /** DSIR importance weights: the [[TopK]] documents by
    * log-likelihood ratio of the `targetPred` slice's hashed-n-gram
    * feature model against the raw corpus's —
    * (doc_id, n_feats, weight_fp) ordered by (weight_fp desc,
    * doc_id).
    *
    * Features are unigram and bigram hashes into [[Buckets]] buckets;
    * bucket models are add-one over bucket counts:
    * weight(doc) = Σ_occurrences [ log2fp(t_b+1, T+B) −
    * log2fp(r_b+1, R+B) ] with t/r the target/raw bucket counts and
    * T/R their totals. The bucket table is exactly B rows at ANY
    * corpus size — the feature table, not the vocabulary, is the
    * bounded object (that is DSIR's point, and why this scales where
    * an exact-vocab ratio model would not).
    */
  def dsirWeights(docs: DataFrame, targetPred: Column): DataFrame =
    dsirWeightsWith(dsirCounts(docs, targetPred), docs)

  /** The ADDITIVE sufficient statistics of the DSIR feature models —
    * per-bucket raw and target occurrence counts. EXACTLY [[Buckets]]
    * rows (at most) at any corpus size, which makes it the ideal
    * standing artifact: extension is an 8192-row count-merge, the
    * broadcast never grows, and the parquet file is a few hundred KB
    * forever. Same artifact discipline as [[LmModel]].
    */
  case class DsirModel(bk: DataFrame)

  /** One row per feature OCCURRENCE (unigrams ++ bigrams, hashed in
    * one kernel pass).
    */
  private def featOccurrences(docs: DataFrame, targetPred: Column) =
    tokenFrame(docs, targetPred).select(
      col("doc_id"), col("is_ref").as("is_t"),
      explode(ArrayExprs.dsirBuckets(col("ts"), 31L, HashSeed, Buckets))
        .as("b"))

  /** Count the bucket statistics — one corpus pass, one shuffle with
    * at most [[Buckets]] rows out.
    */
  def dsirCounts(docs: DataFrame, targetPred: Column): DsirModel =
    DsirModel(featOccurrences(docs, targetPred).groupBy("b").agg(
      count(lit(1)).as("r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("t")))

  /** Fold a new batch into a standing [[DsirModel]]: count the batch,
    * merge the (at most 8192-row) bucket tables — O(batch) work.
    */
  def extendDsir(model: DsirModel, newDocs: DataFrame,
                 targetPred: Column): DsirModel =
    DsirModel(model.bk.unionByName(dsirCounts(newDocs, targetPred).bk)
      .groupBy("b").agg(sum(col("r")).as("r"), sum(col("t")).as("t")))

  /** PERSIST / load the bucket table (`path/buckets`). */
  def saveDsir(model: DsirModel, path: String): Unit =
    model.bk.write.mode("overwrite").parquet(s"$path/buckets")
  def loadDsir(spark: org.apache.spark.sql.SparkSession,
               path: String): DsirModel =
    DsirModel(spark.read.parquet(s"$path/buckets"))

  /** Score `docs` under a trained [[DsirModel]] and keep the
    * [[TopK]]: derive the add-one log-ratio weight per bucket
    * (8192-row work), broadcast, one explode + partial-aggregated
    * groupBy(doc_id), TakeOrdered top-K.
    */
  def dsirWeightsWith(model: DsirModel, docs: DataFrame): DataFrame =
    dsirScored(model, docs)
      .orderBy(col("weight_fp").desc, col("doc_id"))
      .limit(TopK)

  /** Every document's DSIR weight, unordered and unlimited — the
    * shared scoring pass behind [[dsirWeightsWith]] (top-K by weight)
    * and [[dsirSampleWith]] (Gumbel-top-k resampling).
    */
  private def dsirScored(model: DsirModel, docs: DataFrame): DataFrame = {
    val totals = model.bk.agg(
      sum(col("r")).as("rt"), sum(col("t")).as("tt"))
    val bw = model.bk.crossJoin(broadcast(totals))
      .withColumn("w_fp",
        (ArrayExprs.ilog2fp(col("t") + lit(1L)) -
          ArrayExprs.ilog2fp(col("tt") + lit(Buckets))) -
          (ArrayExprs.ilog2fp(col("r") + lit(1L)) -
            ArrayExprs.ilog2fp(col("rt") + lit(Buckets))))
      .select("b", "w_fp")

    // LEFT join + the zero-count arm: an occurrence hashing into a
    // bucket the TRAINING corpus never touched (the standing-model
    // case — novel vocabulary arriving after saveDsir) still carries
    // the add-one smoothed weight (il(1)=0, so it reduces to
    // il(rt+B) − il(tt+B)); an inner join would silently truncate
    // such documents' weights and undercount n_feats
    featOccurrences(docs, lit(false)).drop("is_t")
      .join(broadcast(bw), Seq("b"), "left")
      .crossJoin(broadcast(totals))
      .withColumn("w2_fp", coalesce(col("w_fp"),
        ArrayExprs.ilog2fp(col("rt") + lit(Buckets)) -
          ArrayExprs.ilog2fp(col("tt") + lit(Buckets))))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_feats"),
        sum(col("w2_fp")).as("weight_fp"))
  }

  /** DSIR's actual selection step — importance RESAMPLING, not just
    * ranking: draw [[SampleK]] documents without replacement with
    * probability proportional to their importance weight, via the
    * Gumbel-top-k trick (Efraimidis & Spirakis 2006; Vieira 2014):
    * take the top k of log w(doc) + G(doc) with G i.i.d. Gumbel noise.
    *
    * Everything is seeded fixed-point integer so the draw is
    * deterministic and the oracle replays it bit-for-bit:
    *  - per-doc uniform h ∈ [1, 2³¹−2] from two MINSTD Lehmer steps
    *    (x ← 48271·x mod 2³¹−1) off (doc_id + seed) — products stay
    *    < 2⁴⁷, so neither engine can overflow;
    *  - base-2 Gumbel g = −log2(−log2 u) with u = h/2³¹, priced in
    *    [[graft.functions.ArrayExprs.ilog2fp]] 16.16 fixed point:
    *    e_fp = 31·2¹⁶ − ilog2fp(h), g_fp = 16·2¹⁶ − ilog2fp(e_fp).
    *    Base-2 Gumbel is an AFFINE transform of standard Gumbel
    *    (−log2(−log2 u) = G/ln2 + log2(ln2)), and log2 w is the same
    *    1/ln2 scaling of ln w, so key = weight_fp + g_fp is a strictly
    *    increasing transform of ln w + G — the top-k distribution is
    *    exactly Gumbel-top-k ∝ w.
    *
    * One corpus scoring pass + a TakeOrdered top-k: the same plan
    * shape (and scale story) as [[dsirWeightsWith]].
    */
  def dsirSampleWith(model: DsirModel, docs: DataFrame,
                     k: Int = SampleK, seed: Long = SampleSeed): DataFrame = {
    val m = 2147483647L // 2^31 − 1 (MINSTD modulus)
    dsirScored(model, docs)
      // pmod, not %: a negative doc_id (or negative caller seed) must
      // still land in [1, m−1] — Scala % would hand ilog2fp a
      // non-positive value and throw on the executor
      .withColumn("x0", pmod(col("doc_id") + lit(seed), lit(m - 1L)) + lit(1L))
      .withColumn("h",
        (((col("x0") * lit(48271L)) % lit(m)) * lit(48271L)) % lit(m))
      .withColumn("e_fp",
        lit(31L * 65536L) - ArrayExprs.ilog2fp(col("h")))
      .withColumn("key_fp",
        col("weight_fp") + lit(16L * 65536L) -
          ArrayExprs.ilog2fp(col("e_fp")))
      .select("doc_id", "weight_fp", "key_fp")
      .orderBy(col("key_fp").desc, col("doc_id"))
      .limit(k)
  }

  /** Train-and-sample convenience, mirroring [[dsirWeights]]. */
  def dsirSample(docs: DataFrame, targetPred: Column,
                 k: Int = SampleK, seed: Long = SampleSeed): DataFrame =
    dsirSampleWith(dsirCounts(docs, targetPred), docs, k, seed)
}
