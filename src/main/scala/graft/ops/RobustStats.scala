package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Robust per-group statistics — the outlier-handling passes of a
  * metrics/quality pipeline: z-score outlier flagging and discrete
  * percentile clipping (winsorization). No reference analog; these
  * are north-star additions in the E3/E5 (quality/selection) family.
  *
  * Numeric determinism (the DuckDB-oracle contract): every SUM rides
  * DECIMAL — exact and ORDER-INDEPENDENT, where a double sum varies
  * with partial-aggregation order — and the double arithmetic that
  * follows is the same expression tree on both engines, so each
  * IEEE op (div, mul, sub, sqrt — all exactly rounded) produces the
  * same bits. Percentiles are DISCRETE (a value actually present in
  * the group, picked by integer position), never interpolated —
  * interpolation formulas differ across engines, positions don't.
  *
  * Scale shape: one hash-aggregation per group for moments (map-side
  * combinable); the winsorize rank is a window over (group) — the
  * shuffle is keyed by group, never global, and groups are the unit
  * of skew (AQE splits a fat group's sort). The bounds table is one
  * row per group (broadcast-joined back by AQE).
  */
object RobustStats {

  private val Dec = DecimalType(18, 2)

  /** Rows whose value sits more than `threshold` population standard
    * deviations from their group's mean:
    * `(id, grp, value, z)`, z = (value − mean) / σ.
    * Groups with σ = 0 (constant value) flag nothing — the variance
    * is clamped at 0 before the sqrt because s2/n − mean² in doubles
    * can land a few ulps NEGATIVE for a constant group whose value
    * isn't exactly representable (e.g. 17 rows of 140.70 →
    * −3.6e-12); without the clamp Spark's sqrt yields NaN (and NaN
    * compares greater-than, flagging the whole group) while DuckDB
    * throws outright.
    */
  def zOutliers(df: DataFrame, groupCol: Column, valueCol: Column,
                idCol: Column, threshold: Double = 2.0): DataFrame = {
    val moments = df
      .select(groupCol.as("grp"), valueCol.cast(Dec).as("v"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        sum(col("v")).as("s1"),
        sum(col("v") * col("v")).as("s2"))
      // the whole double pipeline below MUST mirror the oracle SQL
      // term for term: mean = s1/n, var = max(s2/n - mean*mean, 0)
      .select(col("grp"),
        (col("s1").cast(DoubleType) / col("n")).as("mean"),
        sqrt(greatest(col("s2").cast(DoubleType) / col("n") -
          (col("s1").cast(DoubleType) / col("n")) *
            (col("s1").cast(DoubleType) / col("n")), lit(0.0))).as("sigma"))
    df.select(idCol.as("id"), groupCol.as("grp"), valueCol.as("value"))
      .join(moments, Seq("grp"))
      .filter(col("sigma") > 0.0)
      .withColumn("z", (col("value") - col("mean")) / col("sigma"))
      .filter(abs(col("z")) > threshold)
      .select(col("id"), col("grp"), col("value"), col("z"))
  }

  /** ceil(bp * n / 10000) floored at 1 — the discrete percentile
    * POSITION in a group of n rows. The double division is exact-
    * enough by construction: the numerator stays < 2^53 and the true
    * quotient sits >= 1/10000 from any other integer, far beyond one
    * ulp, so truncation equals exact integer floor (the oracle's `//`).
    */
  private def pos(bp: Int, n: Column): Column =
    greatest(lit(1L), ((lit(bp.toLong) * n + lit(9999L)) / lit(10000L)).cast("long"))

  /** Per-group winsorization at discrete basis-point bounds
    * (default: clip to [p5, p95]): `(grp, p_lo, p_hi, n, n_clipped,
    * sum_clipped)` where the percentile is the value at integer rank
    * ceil(bp·n/10000) under the (value, id) total order — a value
    * PRESENT in the group, deterministic under ties — and
    * sum_clipped is the exact DECIMAL sum of the clipped values,
    * surfaced as double.
    */
  def winsorize(df: DataFrame, groupCol: Column, valueCol: Column,
                idCol: Column, loBp: Int = 500, hiBp: Int = 9500): DataFrame = {
    require(0 <= loBp && loBp <= hiBp && hiBp <= 10000, "bad bp bounds")
    val w = Window.partitionBy(col("grp")).orderBy(col("value").asc, col("id").asc)
    val ranked = df
      .select(groupCol.as("grp"), valueCol.as("value"), idCol.as("id"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("grp"))))
    val bounds = ranked
      .groupBy(col("grp"))
      .agg(max(when(col("rn") === pos(loBp, col("n")), col("value"))).as("p_lo"),
        max(when(col("rn") === pos(hiBp, col("n")), col("value"))).as("p_hi"))
    ranked.join(bounds, Seq("grp"))
      .withColumn("clipped",
        least(greatest(col("value"), col("p_lo")), col("p_hi")))
      .groupBy(col("grp"), col("p_lo"), col("p_hi"))
      .agg(count(lit(1)).as("n"),
        sum((col("clipped") =!= col("value")).cast("long")).as("n_clipped"),
        sum(col("clipped").cast(Dec)).cast(DoubleType).as("sum_clipped"))
      .select(col("grp"), col("p_lo"), col("p_hi"), col("n"),
        col("n_clipped"), col("sum_clipped"))
  }
}
