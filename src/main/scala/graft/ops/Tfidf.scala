package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-relative term salience (tf-idf family) — the keyword /
  * topic-hint extraction step of a training-data pipeline (domain
  * mixing, dedup key hints, quality clustering). No reference analog.
  *
  * The weight is the ln-free rational variant `tf * N / df`: order-
  * equivalent to classic tf-idf for ranking within a document
  * (ln is monotone), but built purely from integer counts and one
  * IEEE division, so the score is bit-identical across engines — the
  * DuckDB oracle can hash-match it, which `ln` (libm-dependent last
  * ulp) cannot guarantee.
  *
  * Scale shape: one explode + two hash aggregations keyed on
  * (doc, term) then (term) — map-side combinable, no skew pivot
  * (stopword df rows are one row per term, not per occurrence). The
  * per-document top-k is a window over (doc), never a global sort.
  * The corpus size N is a single bounded 1-row aggregate.
  */
object Tfidf {

  /** Top-k salient terms per document:
    * (id, term, tf, df, score) with deterministic tie-break
    * (score desc, term asc), rank <= k.
    */
  def topTerms(docs: DataFrame, idCol: Column, textCol: Column,
               k: Int = 3): DataFrame = {
    val n = docs.count() // bounded: one scalar aggregate (parquet metadata-cheap)
    val tf = docs
      .select(idCol.as("id"), explode(TextStats.tokens(textCol)).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val byScore = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df, Seq("term"))
      .withColumn("score", (col("tf") * lit(n)).cast("double") / col("df").cast("double"))
      .withColumn("rk", row_number().over(byScore))
      .filter(col("rk") <= k)
      .select(col("id"), col("term"), col("tf"), col("df"), col("score"))
  }

  /** Vocabulary coverage table — the vocab-construction artifact of a
    * training pipeline: the `topK` most frequent tokens with their
    * occurrence counts and the CUMULATIVE fraction of all token
    * occurrences they cover (the curve "how much of the corpus does a
    * V-token vocabulary explain", the sizing input for tokenizer /
    * OOV decisions).
    *
    * Scale shape: the corpus-size explode feeds a map-side-combinable
    * hash aggregation keyed on token, so the shuffle carries one row
    * per DISTINCT token, not per occurrence (no hot key: stopword
    * mass combines locally). The rank/cumulative window is a single
    * global sort over the VOCABULARY (≪ corpus, bounded further by
    * pushing only count-bearing rows), and the total is one scalar
    * aggregate. Determinism: ties rank by (count desc, token asc);
    * the cumulative fraction is an exact long sum divided once per
    * row — bit-identical in the DuckDB oracle.
    */
  def vocabCoverage(docs: DataFrame, textCol: Column, topK: Int): DataFrame = {
    require(topK > 0, "topK must be positive")
    // ONE corpus scan: materialize the vocab-sized count table, then
    // both the total (sum over it) and the top-K read the checkpoint
    // blocks instead of re-running the corpus explode
    val counts = docs
      .select(explode(TextStats.tokens(textCol)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val totalRow = counts.agg(sum(col("cnt"))).head()
    require(!totalRow.isNullAt(0), "corpus is empty") // null sum = no rows
    val total = totalRow.getLong(0)
    // top-K BEFORE any window: orderBy+limit plans as
    // TakeOrderedAndProject (per-partition top-K, driver merge), so
    // the only single-partition window below runs over K rows, never
    // the vocabulary — (cnt desc, token) is a total order, so the cut
    // is deterministic
    val byFreq = Window.orderBy(col("cnt").desc, col("token").asc)
    counts.orderBy(col("cnt").desc, col("token").asc).limit(topK)
      .withColumn("rk", row_number().over(byFreq))
      .withColumn("cum", sum(col("cnt")).over(
        byFreq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("cum_frac",
        col("cum").cast("double") / lit(total).cast("double"))
      .select(col("rk").cast("long").as("rk"), col("token"), col("cnt"),
        col("cum_frac"))
  }

  /** Sparse document-similarity pairs via an INVERTED INDEX over each
    * document's top-k salient terms — the third member of the
    * similarity family: dense-vector ANN ([[Similarity]]) needs
    * embeddings, shingle MinHash ([[MinHash]]) needs near-verbatim
    * text; the inverted index catches TOPICAL pairs from plain text.
    * Output: `(id_a, id_b, n_shared, overlap)` for pairs sharing at
    * least `minShared` salient terms, where `overlap` is the exact
    * integer Σ min(tf_a, tf_b) over the shared terms.
    *
    * Scale shape: the join key is the TERM (the inverted index), so
    * the pair space is Σ_term df_top(term)², where df_top counts only
    * documents whose TOP-K includes the term — stopwords have huge df
    * but tiny tf·idf, so they don't reach anyone's top-k and the
    * index is naturally skew-resistant; `maxPostings` hard-caps the
    * residual hot terms (dropping a term that a large fraction of the
    * corpus shares is standard practice — it carries no pairwise
    * signal). Scoring is exact integer arithmetic, so the DuckDB
    * oracle is bit-identical; a tf·idf-weighted cosine is a one-line
    * swap on the same postings join but would hand the gate a
    * float-summation ordering hazard.
    */
  /** Session-scoped materialized pair-table artifacts: at 100 TB the
    * inverted index and its pair table are written ONCE and read by
    * every consumer (the pair query, the per-doc top-k projection,
    * downstream cluster derivation) — not recomputed per query.
    * [[SessionArtifactCache]] (factored out of this op in round 10,
    * same keying/eviction semantics) is the local-mode stand-in for
    * that materialized table. Callers opt in with `cacheKey` naming
    * the SOURCE (e.g. the data dir); callers whose input differs per
    * call (scale smoke's inflated corpora) pass None and keep
    * per-call builds.
    */

  def sharedSalientPairs(docs: DataFrame, idCol: Column, textCol: Column,
                         k: Int = 5, minShared: Int = 2,
                         maxPostings: Int = 1000,
                         cacheKey: Option[String] = None): DataFrame =
    cacheKey match {
      case Some(src) =>
        SessionArtifactCache.getOrBuild(
          docs.select(idCol.as("id"), textCol.as("text")),
          tag = s"tfidf_pairs:$src", params = s"$k:$minShared:$maxPostings")(
          buildSharedSalientPairs(docs, idCol, textCol, k, minShared,
            maxPostings))
      case None =>
        buildSharedSalientPairs(docs, idCol, textCol, k, minShared, maxPostings)
    }

  private def buildSharedSalientPairs(docs: DataFrame, idCol: Column,
                                      textCol: Column, k: Int, minShared: Int,
                                      maxPostings: Int): DataFrame = {
    // postings are consumed three times (df_top count + both join
    // sides): checkpoint the k-per-doc table (bounded at k rows/doc)
    // so the tf/window pipeline runs once
    val postings = topTerms(docs, idCol, textCol, k).localCheckpoint()
    // hot-term cap as an aggregate + semi-join, NOT a count-window:
    // the groupBy collapses map-side to one row per term, and AQE
    // broadcasts the surviving term list; a window would re-shuffle
    // and re-sort the full postings table just to annotate df_top
    val okTerms = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df_top"))
      .filter(col("df_top") <= maxPostings)
      .select(col("term"))
    val capped = postings.join(okTerms, Seq("term"), "left_semi")
    val a = capped.select(col("term"), col("id").as("id_a"), col("tf").as("tf_a"))
    val b = capped.select(col("term"), col("id").as("id_b"), col("tf").as("tf_b"))
    a.join(b, Seq("term"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"),
        sum(least(col("tf_a"), col("tf_b"))).as("overlap"))
      .filter(col("n_shared") >= minShared)
  }

  /** Cap audit for the postings cap: the (term, df_top) hot terms
    * [[sharedSalientPairs]] drops at `maxPostings` — a term in many
    * documents' top-k carries no pairwise signal, but the DROP should
    * be visible, not silent (a degenerate corpus where a boilerplate
    * term reaches everyone's top-k would otherwise just produce
    * quietly fewer pairs). Bounded output: ≤ (k·docs)/maxPostings rows.
    */
  def hotTermAudit(docs: DataFrame, idCol: Column, textCol: Column,
                   k: Int = 5, maxPostings: Int = 1000): DataFrame =
    topTerms(docs, idCol, textCol, k)
      .groupBy(col("term")).agg(count(lit(1)).as("df_top"))
      .filter(col("df_top") > maxPostings)

  /** Per-document top-`topK` most-similar neighbors — the user-facing
    * default over [[sharedSalientPairs]]: the full pair table's output
    * volume grows with pair density (877k rows at sf0.1), while this
    * projection is bounded at topK rows per document regardless of how
    * dense the similarity graph gets.
    *
    * Scale shape: symmetrize the (id_a < id_b) pairs with a cheap
    * union (no extra join), then rank per document. The rank filter is
    * `row_number() <= topK`, which Spark plans as WindowGroupLimit —
    * a per-partition top-k push-down ahead of the window sort, so no
    * partition ever fully sorts its neighbor list. Tie-break
    * (overlap desc, n_shared desc, neighbor asc) is a total order, so
    * the cut is deterministic and oracle-matchable.
    */
  def topNeighbors(docs: DataFrame, idCol: Column, textCol: Column,
                   k: Int = 5, minShared: Int = 2, maxPostings: Int = 1000,
                   topK: Int = 3, cacheKey: Option[String] = None): DataFrame = {
    val pairs =
      sharedSalientPairs(docs, idCol, textCol, k, minShared, maxPostings, cacheKey)
    val sym = pairs.select(col("id_a").as("id"), col("id_b").as("nbr"),
        col("n_shared"), col("overlap"))
      .unionAll(pairs.select(col("id_b").as("id"), col("id_a").as("nbr"),
        col("n_shared"), col("overlap")))
    val byScore = Window.partitionBy(col("id"))
      .orderBy(col("overlap").desc, col("n_shared").desc, col("nbr").asc)
    sym.withColumn("rk", row_number().over(byScore))
      .filter(col("rk") <= topK)
      .select(col("id"), col("nbr"), col("n_shared"), col("overlap"),
        col("rk").cast("long").as("rk"))
  }

  // ---- standing document-frequency artifact (index maintenance) ----

  /** The STANDING tf-idf state: the additive document-frequency table
    * `(term, df)` plus the document count — raw counts only (the LM
    * lesson: a derived/pruned table is unreplayable after extension;
    * raw counts fold). With it, a crawl batch scores against
    * corpus-wide salience WITHOUT rescanning the corpus — the last
    * member of the standing-index family (MinHash / HashIndex /
    * SemIndex / BPE / Unigram / PQ / LM / KnnGraph) to get the
    * train-once / extend-at-O(batch) / persist treatment.
    */
  final case class DfStats(df: DataFrame, nDocs: Long)

  /** One corpus pass: per-document distinct terms → `(term, df)`
    * (vocab-sized, map-side combinable) plus the doc count; the df
    * table is eagerly checkpointed — it is the artifact.
    */
  def trainDfStats(docs: DataFrame, idCol: Column, textCol: Column): DfStats = {
    val df = docs
      .select(idCol.as("id"), explode(TextStats.tokens(textCol)).as("term"))
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .localCheckpoint()
    DfStats(df, docs.count())
  }

  /** Fold a batch of NEW documents (ids disjoint from everything the
    * model has seen — the crawl-batch convention of `extendWordFreq` /
    * `Lm.extendCounts`) into the standing stats at O(batch + vocab)
    * cost: df adds by term, nDocs adds. Provably equal to retraining
    * on the union (document frequency is a per-document indicator
    * sum), spec-pinned.
    *
    * Unlike the id-bearing indexes (MinHash/Winnow/graph/hash — which
    * runtime-enforce disjointness via [[Guards.requireDisjointIds]]),
    * a COUNT-ONLY artifact retains no document ids, so the
    * precondition is unverifiable from the model alone; callers that
    * still hold the standing corpus can pre-check with the same
    * guard before folding.
    */
  def extendDfStats(model: DfStats, batch: DataFrame, idCol: Column,
                    textCol: Column): DfStats = {
    val b = batch
      .select(idCol.as("id"), explode(TextStats.tokens(textCol)).as("term"))
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    val merged = model.df.unionByName(b)
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
      .localCheckpoint()
    DfStats(merged, model.nDocs + batch.count())
  }

  /** Persist [[DfStats]]: df parquet + params manifest (the
    * `MinHash.saveIndex` shape).
    */
  def saveDfStats(m: DfStats, path: String): Unit = {
    m.df.write.mode("overwrite").parquet(s"$path/df")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "params.json"),
      s"""{"nDocs":${m.nDocs}}""".getBytes("UTF-8"))
  }

  def loadDfStats(spark: org.apache.spark.sql.SparkSession,
                  path: String): DfStats = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "params.json")), "UTF-8")
    val m = """"nDocs"\s*:\s*(-?\d+)""".r.findFirstMatchIn(txt)
    require(m.isDefined, "params.json missing nDocs")
    DfStats(spark.read.parquet(s"$path/df"), m.get.group(1).toLong)
  }

  /** Score a batch against the STANDING stats: tf from the batch, df
    * and N from the model — one vocab-keyed join, no corpus rescan. A
    * term the model has never seen prices at df = 1 (maximally
    * salient — the new-term convention; exact integers throughout, so
    * the DuckDB oracle hash-matches). Output as [[topTerms]]:
    * (id, term, tf, df, score), top-k per document by
    * (score desc, term asc).
    */
  def topTermsAgainst(model: DfStats, batch: DataFrame, idCol: Column,
                      textCol: Column, k: Int = 3): DataFrame = {
    val tf = batch
      .select(idCol.as("id"), explode(TextStats.tokens(textCol)).as("term"))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val byScore = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(model.df, Seq("term"), "left")
      .withColumn("df", greatest(coalesce(col("df"), lit(0L)), lit(1L)))
      .withColumn("score",
        (col("tf") * lit(model.nDocs)).cast("double") / col("df").cast("double"))
      .withColumn("rk", row_number().over(byScore))
      .filter(col("rk") <= k)
      .select(col("id"), col("term"), col("tf"), col("df"), col("score"))
  }
}
