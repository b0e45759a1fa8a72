package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus drift monitoring — compare the token distributions of two
  * corpora (yesterday's crawl vs today's, corpus vs benchmark, source
  * A vs source B) and surface the tokens that moved most. The
  * per-token contribution to total-variation distance is
  * |p_a − p_b| / 2 = |cnt_a·tot_b − cnt_b·tot_a| / (2·tot_a·tot_b);
  * summing it over the vocabulary gives TV(A,B) ∈ [0,1].
  *
  * Numeric determinism: the cnt·tot products ride DECIMAL(38,0) in
  * BOTH entry points — exact at any corpus size (a double product
  * silently loses ulps past 2^53, which two ~10^9-token corpora
  * already reach; a long product wraps past 2^63) — then one cast
  * and one division round once, so the oracle hash-matches instead
  * of drifting in the last ulp (the reason this uses no log: KL's
  * libm dependence cannot hash-match across engines).
  *
  * Scale shape: each corpus is scanned ONCE, collapsing to one row
  * per DISTINCT token (map-side-combinable count, checkpointed); the
  * totals are sums over those vocab-sized tables, the full-outer
  * join shuffles vocabularies (≪ corpus), and the top movers plan as
  * TakeOrderedAndProject — no global sort, no corpus-sized shuffle.
  */
object Drift {

  /** One row per distinct token, materialized via `localCheckpoint`
    * so the corpus is scanned ONCE per drift report: the total (a sum
    * over the vocab-sized table) and the join both read the
    * checkpoint blocks instead of re-running the corpus explode. The
    * blocks are vocabulary-sized (≪ corpus) and are reclaimed by the
    * ContextCleaner once the returned frame is unreachable.
    */
  private def freq(corpus: DataFrame, textCol: Column): DataFrame =
    corpus.select(explode(TextStats.tokens(textCol)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint()

  private def total(freqTable: DataFrame): Long = {
    val r = freqTable.agg(sum(col("cnt"))).head()
    if (r.isNullAt(0)) 0L else r.getLong(0) // null sum = empty corpus
  }

  /** Top-`k` drift contributors: `(token, cnt_a, cnt_b, drift)` with
    * drift = the token's share of TV distance, ordered (drift desc,
    * token asc). Tokens absent from one corpus count 0 there.
    * The |cnt_a·tot_b − cnt_b·tot_a| numerator is exact DECIMAL(38,0)
    * arithmetic (same as [[totalVariation]]) cast to double once —
    * below 2^53 bit-identical to the double path the oracle runs,
    * beyond it still exact where doubles would reorder the top-k.
    */
  def topDrift(a: DataFrame, b: DataFrame, textCol: Column,
               k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val (fa, fb) = (freq(a, textCol), freq(b, textCol))
    val (totA, totB) = (total(fa), total(fb))
    require(totA > 0 && totB > 0, "both corpora must contain tokens")
    val dec = DecimalType(38, 0)
    fa.withColumnRenamed("cnt", "cnt_a")
      .join(fb.withColumnRenamed("cnt", "cnt_b"),
        Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .withColumn("drift",
        abs(col("cnt_a").cast(dec) * lit(totB) -
          col("cnt_b").cast(dec) * lit(totA)).cast("double") /
          lit(2.0 * totA.toDouble * totB.toDouble))
      .orderBy(col("drift").desc, col("token").asc)
      .limit(k)
  }

  /** EMBEDDING-space drift between two corpus snapshots (E14 extended
    * to the embedding modality): both sides are assigned to the cells
    * of one shared IVF coarse quantizer (the [[Similarity]] seed or
    * trained centroids — one partition of space both snapshots and
    * any verifying engine agree on), and the per-cell occupancy is
    * compared with the same exact-integer TV-share arithmetic as the
    * token path. A crawl whose embedding distribution shifts (new
    * topic, collapsed source, encoder regression) moves cell mass
    * even when its token surface looks stable.
    *
    * Output: `(cell, cnt_a, cnt_b, drift)` per occupied cell,
    * drift = |cnt_a·tot_b − cnt_b·tot_a| / (2·tot_a·tot_b).
    *
    * Scale shape: each snapshot collapses to ≤ nCentroids rows in one
    * codegen'd argmax scan + map-side-combinable count; everything
    * after is centroid-sized.
    */
  def cellDrift(a: DataFrame, b: DataFrame, embCol: Column,
                centroids: Array[Array[Double]]): DataFrame = {
    def occupancy(df: DataFrame): DataFrame =
      df.select(graft.functions.ArrayExprs.argmaxCosine(embCol, centroids)
          .cast("long").as("cell"))
        .groupBy(col("cell")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint()
    val (fa, fb) = (occupancy(a), occupancy(b))
    val (totA, totB) = (total(fa), total(fb))
    require(totA > 0 && totB > 0, "both snapshots must contain vectors")
    val dec = DecimalType(38, 0)
    fa.withColumnRenamed("cnt", "cnt_a")
      .join(fb.withColumnRenamed("cnt", "cnt_b"), Seq("cell"), "full_outer")
      .select(col("cell"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .withColumn("drift",
        abs(col("cnt_a").cast(dec) * lit(totB) -
          col("cnt_b").cast(dec) * lit(totA)).cast("double") /
          lit(2.0 * totA.toDouble * totB.toDouble))
  }

  /** Total-variation distance between the two token distributions:
    * one row `(tv)`, tv ∈ [0,1] (0 = identical, 1 = disjoint).
    * The per-token numerators are exact INTEGERS summed exactly
    * (order-independent, unlike a float sum), divided ONCE at the
    * end — so the result is deterministic and oracle-matchable.
    * The products ride DECIMAL(38,0): long `cnt·tot` would wrap
    * silently past 2^63, which two ~5e9-token corpora already reach —
    * far below this module's design scale.
    */
  def totalVariation(a: DataFrame, b: DataFrame, textCol: Column): DataFrame = {
    val (fa, fb) = (freq(a, textCol), freq(b, textCol))
    val (totA, totB) = (total(fa), total(fb))
    require(totA > 0 && totB > 0, "both corpora must contain tokens")
    val dec = DecimalType(38, 0)
    fa.withColumnRenamed("cnt", "cnt_a")
      .join(fb.withColumnRenamed("cnt", "cnt_b"),
        Seq("token"), "full_outer")
      .select(
        abs(coalesce(col("cnt_a"), lit(0L)).cast(dec) * lit(totB) -
          coalesce(col("cnt_b"), lit(0L)).cast(dec) * lit(totA)).as("num"))
      .agg((sum(col("num")).cast("double") /
        (lit(2.0) * lit(totA.toDouble) * lit(totB.toDouble))).as("tv"))
  }
}
