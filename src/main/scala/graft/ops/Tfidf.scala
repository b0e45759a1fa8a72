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
}
