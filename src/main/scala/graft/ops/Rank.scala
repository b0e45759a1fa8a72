package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact GLOBAL rank without a global window. `rank() OVER (ORDER BY
  * v)` is a single task in any engine that executes it literally —
  * the running row count is the non-distributing part. Like [[Sweep]]
  * and [[Skyline]], this runs [[PrefixScan]] instead, with the row
  * count as the monoid:
  *
  *   1. collapse to one row per distinct value with its multiplicity
  *      — a map-side-combinable aggregation;
  *   2. range-partition by value, sort within partitions, pin;
  *   3. prefix-sum the multiplicities: the EXCLUSIVE prefix at a
  *      value = rows strictly below it = SQL `rank() - 1`.
  *
  * From the same scan, equi-depth buckets fall out for free:
  * bucket(r) = ((r−1)·k) div n + 1 assigns each of the n ranks to one
  * of k depth-balanced buckets — exact integer arithmetic, no
  * interpolation, identical on every engine.
  */
object Rank {

  /** One row per distinct value: `(v, cnt, rnk, bucket)` — `rnk` is
    * SQL `rank()` under ascending `v`, `bucket` the 1-based equi-depth
    * bin of that rank among `n` total rows split `k` ways.
    */
  def valueRanks(df: DataFrame, valueCol: Column, k: Int = 8,
                 numRanges: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // NULLs are excluded (SQL rank() would order them, but the tuple
    // encoder below is non-nullable; callers wanting NULL semantics
    // filter/replace first — mirrored by the oracle's WHERE)
    val counts = df.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
      .repartitionByRange(numRanges, col("v"))
      .sortWithinPartitions(col("v"))
      .as[(Double, Long)]
      .localCheckpoint()
    val ranked = PrefixScan.scan(counts, 0L)((a, r) => a + r._2)(_ + _)
      .map { case ((v, cnt), below, _) => (v, cnt, below + 1L) }
      .toDF("v", "cnt", "rnk")
    // n is the scan's grand total; recomputed declaratively so the
    // plan stays a DataFrame (one broadcast row, map-side-combined)
    val n = df.select(valueCol.cast("double").as("v"))
      .agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket",
        expr(s"((rnk - 1) * $k) div n + 1"))
      .select(col("v"), col("cnt"), col("rnk"), col("bucket"))
  }
}
