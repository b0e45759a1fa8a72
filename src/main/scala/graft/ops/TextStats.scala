package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (north-star operator E3,
  * SURVEY.md §2.9): tokenization, token counting, language-ID
  * heuristic, quality scoring, and rolling-hash fingerprinting.
  * Everything is expression-level (codegen'd); no UDFs.
  */
object TextStats {

  /** Whitespace tokenization (single-space corpus convention of the
    * `documents` table; use [[tokensWs]] for arbitrary whitespace).
    */
  def tokens(c: Column): Column = split(c, " ")

  def tokensWs(c: Column): Column = split(trim(c), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword count: runs of letters, runs of digits, or a
    * single other non-space char — a cheap, deterministic proxy for a
    * real tokenizer's token count (useful for budget estimation).
    */
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Language marker vocabularies for the n-gram/stopword heuristic.
    * Tiny on purpose: the heuristic is the operator; the word lists are
    * a swappable parameter.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to"),
    "fr" -> Seq("le", "la", "et", "les", "de"),
    "es" -> Seq("el", "la", "y", "los", "de"),
    "de" -> Seq("der", "die", "und", "das", "ein"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  /** Count of tokens that appear in `markers` (with duplicates — the
    * semantics of `size(filter(words, isInCollection))`, but via the
    * one-pass native kernel: the HOF `filter` lambda is
    * CodegenFallback and walks the token array once per marker set).
    */
  def markerCount(words: Column, markers: Seq[String]): Column =
    element_at(
      graft.functions.ArrayExprs.markerCounts(words, Array(markers.toArray)), 1)

  /** Language-ID: argmax of marker counts; deterministic tie-break =
    * first language in [[LangMarkers]] order reaching the max; all-zero
    * → "und" (undetermined). All five vocabularies are counted in ONE
    * token-array pass ([[graft.functions.MarkerCounts]]); the repeated
    * `counts` subtree is eliminated by whole-stage codegen CSE.
    */
  def langId(textCol: Column): Column = {
    val counts = graft.functions.ArrayExprs.markerCounts(
      tokens(lower(textCol)), LangMarkers.map(_._2.toArray).toArray)
    val best = array_max(counts)
    // foldRight nests later languages inside, so the first language in
    // LangMarkers order is tested first → deterministic tie-break.
    LangMarkers.map(_._1).zipWithIndex.foldRight(lit("und")) {
      case ((lang, i), rest) =>
        when(element_at(counts, i + 1) === best && best > 0, lit(lang))
          .otherwise(rest)
    }
  }

  /** Punctuation defined engine-portably as non-alnum-non-space. */
  def punctCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[^A-Za-z0-9\\s]"), lit(0))).cast("long")

  /** Quality score in [0,1]: length saturation, punctuation sanity,
    * stopword-ratio band — the standard cheap pre-filter for LLM
    * training corpora. Deterministic DOUBLE. NOT rounded: the raw
    * IEEE result is bit-identical across engines evaluating the same
    * expression order, whereas decimal rounding of near-boundary
    * doubles is engine-dependent (multiply-vs-BigDecimal rounding).
    */
  def qualityScore(textCol: Column): Column = {
    val nTok = tokenCount(textCol).cast("double")
    val nChar = length(textCol).cast("double")
    val lengthPart = least(nTok / lit(64.0), lit(1.0)) * lit(0.4)
    val punctRatio = punctCount(textCol).cast("double") / greatest(nChar, lit(1.0))
    val punctPart = (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.3)
    val stopRatio = markerCount(tokens(lower(textCol)), LangMarkers.head._2)
      .cast("double") / greatest(nTok, lit(1.0))
    val stopPart = least(stopRatio * lit(5.0), lit(1.0)) * lit(0.3)
    lengthPart + punctPart + stopPart
  }

  /** Rolling polynomial fingerprint over per-token codes
    * (`ascii(first char) * length` — engine-portable and cheap), folded
    * left with multiplier 1000003 mod (2^31−1). A document-level
    * content fingerprint: stable under storage/partitioning, cheap to
    * compare, usable as a shard key for dedup at scale.
    */
  def fingerprint(textCol: Column): Column = {
    val codes = transform(tokens(textCol),
      w => (ascii(w) * length(w)).cast("long"))
    aggregate(codes, lit(0L),
      (acc, x) => pmod(acc * lit(1000003L) + x, lit(2147483647L)))
  }

  /** Word n-gram shingles as strings; short docs (<n tokens) produce a
    * single whole-text shingle so every doc has ≥1. Native one-pass
    * expression ([[graft.functions.Shingles]]) — the declarative
    * `transform(sequence(...), slice(split(...)))` form is
    * CodegenFallback and re-splits the text per shingle.
    */
  def shingles(textCol: Column, n: Int = 3): Column =
    graft.functions.ArrayExprs.shingles(textCol, n)

  /** Repetition quality signals (the Gopher-rules repetition family,
    * Rae et al. arXiv:2112.11446 §A1.1, adapted to single-line docs):
    * per document, the fraction of tokens that are repeats
    * (1 − distinct/total — pure expressions) and the share of all
    * word 2-grams taken by the most frequent 2-gram (explode →
    * per-(doc,gram) count → per-doc max/sum; both shuffles are keyed
    * on the document id, so the op scales linearly and never
    * concentrates a corpus-wide key).
    *
    * High `top_gram_frac` or `dup_token_frac` flags the looping /
    * boilerplate documents every pre-training filter drops.
    */
  def repetitionSignals(docs: DataFrame, idCol: Column, textCol: Column,
                        n: Int = 2): DataFrame = {
    // ONE corpus pass: dup_token_frac is a per-row expression, so it
    // rides along as a grouping key (functionally dependent on the
    // id) instead of joining a second scan of the corpus back in.
    // The doc-level projection MUST be a separate select from the
    // explode: in one select, ExtractGenerator leaves non-generator
    // expressions in the Project ABOVE Generate, re-evaluating the
    // token stats once per GRAM row (~ntok× per doc — measured 3× on
    // the whole query); as a pre-computed attribute it crosses
    // Generate for free.
    docs.select(
      idCol.as("id"),
      (lit(1.0) - size(array_distinct(tokens(textCol))).cast("double") /
        greatest(size(tokens(textCol)), lit(1)).cast("double"))
        .as("dup_token_frac"),
      graft.functions.ArrayExprs.shingles(textCol, n).as("__grams"))
      .select(col("id"), col("dup_token_frac"),
        explode(col("__grams")).as("g"))
      .groupBy(col("id"), col("dup_token_frac"), col("g"))
      .agg(count(lit(1)).as("cnt"))
      .groupBy(col("id"), col("dup_token_frac")).agg(
        max(col("cnt")).as("top_cnt"), sum(col("cnt")).as("n_grams"))
      .select(col("id"), col("dup_token_frac"), col("n_grams"),
        (col("top_cnt").cast("double") / col("n_grams").cast("double"))
          .as("top_gram_frac"))
  }

  /** Exact n-gram Jaccard similarity between two token-set columns
    * (distinct semantics on both sides).
    */
  def jaccard(aSet: Column, bSet: Column): Column =
    size(array_intersect(aSet, bSet)).cast("double") /
      size(array_distinct(concat(aSet, bSet))).cast("double")

  /** N-gram-Jaccard near-dup candidate pairs, blocked to bound the
    * pair space (see MinHash for the unblocked scale path). Blocks on
    * (lang, token-count, first token): near-identical docs agree on all
    * three, and bucket sizes stay tiny at any corpus size.
    *
    * Word sets are pre-deduplicated AND pre-sorted once per doc, so the
    * per-pair verify is one merge pass
    * ([[graft.functions.JaccardSorted]]) with zero allocation — a hot
    * block degrades gracefully instead of paying
    * `array_intersect`+`array_distinct(concat)` churn per pair.
    */
  def jaccardPairs(docs: DataFrame, textCol: Column, idCol: Column,
                   langCol: Column, threshold: Double): DataFrame = {
    val prepared = docs.select(
      idCol.as("id"), langCol.as("lang"),
      tokenCount(textCol).as("ntok"),
      element_at(tokens(textCol), 1).as("tok1"),
      array_sort(array_distinct(tokens(textCol))).as("wset"))
    val a = prepared.toDF("id_a", "lang", "ntok", "tok1", "wset_a")
    val b = prepared.toDF("id_b", "lang", "ntok", "tok1", "wset_b")
    a.join(b, Seq("lang", "ntok", "tok1"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jac",
        graft.functions.ArrayExprs.jaccardSorted(col("wset_a"), col("wset_b")))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }
}
