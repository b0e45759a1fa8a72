package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sweep-line interval analytics — "how many intervals are active at
  * time T" over the whole timeline (concurrent sessions, open SCD2
  * versions, in-flight batches). The classic single-node answer is a
  * sort + running counter; the running counter is the part that does
  * NOT distribute (a global running sum is a single-partition window —
  * one task, no matter how many executors). This implements the
  * textbook two-pass DISTRIBUTED PREFIX SUM instead:
  *
  *   1. collapse interval endpoints to per-instant net deltas (+1
  *      opens, -1 closes) — a map-side-combinable hash aggregation;
  *   2. range-partition the instants and sort within each partition;
  *   3. pass A: per-partition delta TOTALS — tiny (one row per
  *      partition), collected and prefix-summed on the driver;
  *   4. pass B: each partition streams its rows once, adding its
  *      broadcast base offset to a local running sum.
  *
  * Driver traffic is bounded at numPartitions rows regardless of data
  * size, every heavy step is a shuffle-or-narrow Spark op, and the
  * timeline never funnels through one task. `mapPartitions` is used
  * exactly where the survey allows it: genuine per-partition
  * imperative state (the running counter).
  */
object Sweep {

  /** Concurrency timeline of closed integer intervals `[lo, hi]`:
    * one row per distinct endpoint instant, `(t, net, concurrent)` —
    * `net` = opens minus closes taking effect at `t`, `concurrent` =
    * intervals active in `[t, next_t)`. A close takes effect at
    * `hi + 1` (the interval is inclusive of its end instant).
    */
  def concurrency(intervals: DataFrame, loCol: Column, hiCol: Column,
                  numRanges: Int = 32): DataFrame = {
    val spark = intervals.sparkSession
    import spark.implicits._
    // materialize ONCE before the two passes: repartitionByRange
    // SAMPLES its bounds, so recomputing the lineage between pass A
    // and pass B could place rows in different partitions than the
    // offsets were computed for (localCheckpoint pins the partitions;
    // it is also what makes the second pass read blocks, not re-run
    // the union+aggregate)
    val deltas = intervals.select(loCol.cast("long").as("t"), lit(1L).as("d"))
      .unionByName(intervals.select((hiCol.cast("long") + 1L).as("t"),
        lit(-1L).as("d")))
      .groupBy(col("t")).agg(sum(col("d")).as("net"))
      .repartitionByRange(numRanges, col("t"))
      .sortWithinPartitions(col("t"))
      .select(col("t"), col("net")).as[(Long, Long)]
      .localCheckpoint()
    // running sum = PrefixScan with (+, 0) (pass A: numRanges rows to
    // the driver; pass B: one streaming pass per partition)
    PrefixScan.scan(deltas, 0L)((a, r) => a + r._2)(_ + _)
      .map { case ((t, net), _, acc) => (t, net, acc) }
      .toDF("t", "net", "concurrent")
  }
}
