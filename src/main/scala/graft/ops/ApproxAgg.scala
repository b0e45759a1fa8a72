package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregates — the 100 TB substitutes for
  * operators whose exact forms need a full shuffle of the key space or
  * a per-group sort:
  *
  *  - exact `COUNT(DISTINCT k)` shuffles every distinct key;
  *    `approx_count_distinct` (HyperLogLog++) carries a fixed-size
  *    sketch per partition and merges — map-side combinable, constant
  *    memory, mergeable across days of data.
  *  - exact `percentile` buffers each group's values;
  *    `percentile_approx` (KLL-style quantile sketch) is bounded by
  *    `accuracy`, not group size.
  *
  * Sketch outputs are engine-specific (a DuckDB HLL disagrees in the
  * last ulps), so these queries are rows-only in the oracle harness;
  * ApproxAggSpec pins them against the exact operators within the
  * sketch's error bound instead.
  */
object ApproxAgg {

  /** Per-group distinct-count estimate, `rsd` relative error. */
  def distinctCounts(df: DataFrame, groupCols: Seq[Column], countCol: Column,
                     rsd: Double = 0.02): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(approx_count_distinct(countCol, rsd).as("approx_distinct"))

  /** Per-group quantile estimates at `ps`, sketch `accuracy` (higher =
    * tighter; memory is O(accuracy)).
    */
  def percentiles(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
                  ps: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols: _*)
      .agg(percentile_approx(valueCol,
        array(ps.map(lit): _*), lit(accuracy)).as("approx_ps"))

  /** Approximate heavy hitters (frequent items): the top-k most
    * frequent values of `itemCol` per group via Spark 4.1's
    * `approx_top_k` (an Apache DataSketches frequent-items sketch —
    * fixed memory `maxItemsTracked`, map-side combinable, mergeable;
    * the exact form is a full count shuffle of the key space plus a
    * global sort). Estimates are exact whenever the distinct-item
    * count stays under `maxItemsTracked` — the spec pins that regime
    * against the exact counts; the sketch output shape is
    * engine-specific, so the query is rows-only for the oracle.
    *
    * Output: one row per (group, item): `(…group, item, est, rk)`,
    * rk 1..k by (est desc, item asc) — flattened from the sketch's
    * struct array because an array cell is opaque to row-oriented
    * consumers (same rationale as [[percentilesScalar]]).
    */
  def topKItems(df: DataFrame, groupCol: Column, itemCol: Column,
                k: Int = 10, maxItemsTracked: Int = 10000): DataFrame =
    df.select(groupCol.as("grp"), itemCol.as("item"))
      .groupBy(col("grp"))
      .agg(expr(s"approx_top_k(item, $k, $maxItemsTracked)").as("tk"))
      .select(col("grp"), explode(col("tk")).as("e"))
      .select(col("grp"), col("e.item").as("item"),
        col("e.count").cast("long").as("est"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("grp"))
          .orderBy(col("est").desc, col("item").asc)))

  /** [[percentiles]] with each quantile projected to its own scalar
    * column named `names(i)`. Still ONE sketch pass (a single
    * array-returning agg, then `element_at`); the flat shape is what
    * downstream row-oriented consumers (and the correctness harness's
    * cell hasher) can actually digest — an array cell is opaque to
    * them.
    */
  def percentilesScalar(df: DataFrame, groupCols: Seq[Column], valueCol: Column,
                        ps: Seq[Double], names: Seq[String],
                        accuracy: Int = 10000): DataFrame = {
    require(ps.size == names.size, "one output name per quantile")
    val arr = percentiles(df, groupCols, valueCol, ps, accuracy)
    val keep = arr.columns.filterNot(_ == "approx_ps").map(col).toSeq
    val flat = names.zipWithIndex.map { case (n, i) =>
      element_at(col("approx_ps"), i + 1).cast("double").as(n)
    }
    arr.select(keep ++ flat: _*)
  }
}
