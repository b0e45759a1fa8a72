package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (skyline): the rows not dominated in
  * (x, y) — no other row has x' ≥ x AND y' ≥ y with one strict.
  * Classic single-node answer: sort by x descending, keep rows whose
  * y exceeds the running max (Börzsönyi et al. ICDE'01's SFS
  * refinement). The running max is the non-distributing part — a
  * global window is one task regardless of cluster size — so, like
  * [[Sweep]], this runs the textbook two-pass distributed prefix
  * scan, with MAX as the monoid instead of SUM:
  *
  *   1. collapse to one row per distinct x with max(y) — a map-side-
  *      combinable hash aggregation (only per-x maxima can be on the
  *      frontier);
  *   2. range-partition by x DESC, sort within partitions;
  *   3. pass A: per-partition y-maxima — numRanges rows — collected
  *      and prefix-maxed on the driver;
  *   4. pass B: each partition streams once with its broadcast base,
  *      emitting rows that beat the running max.
  *
  * Driver traffic is bounded at numRanges rows at any data size, and
  * the frontier never funnels through a single task.
  */
object Skyline {

  /** Frontier of (x max, y max), one row per surviving x: `(x, y)`
    * where y > max{ y(x') : x' > x }.
    */
  def frontier(df: DataFrame, xCol: Column, yCol: Column,
               numRanges: Int = 32): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // per-x maxima, pinned partitions (repartitionByRange samples its
    // bounds — same localCheckpoint rationale as Sweep.concurrency)
    val perX = df.select(xCol.cast("long").as("x"), yCol.cast("double").as("y"))
      .groupBy(col("x")).agg(max(col("y")).as("y"))
      .repartitionByRange(numRanges, col("x").desc)
      .sortWithinPartitions(col("x").desc)
      .as[(Long, Double)]
      .localCheckpoint()
    // running max = PrefixScan with (max, -inf); a row is on the
    // frontier iff it beats the EXCLUSIVE prefix (every larger x)
    PrefixScan.scan(perX, Double.NegativeInfinity)(
      (a, r) => math.max(a, r._2))(math.max)
      .flatMap { case ((x, y), before, _) =>
        if (y > before) Iterator.single((x, y)) else Iterator.empty
      }
      .toDF("x", "y")
  }
}
