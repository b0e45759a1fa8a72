package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout — multi-dimensional data clustering
  * for scan pruning, the technique behind Delta/Iceberg `ZORDER BY`
  * (Morton 1966; the lakehouse application is public in both
  * projects' docs). A single-column sort gives parquet row-groups
  * tight min/max bounds on ONE column: a predicate on any other
  * column prunes nothing. Interleaving the bits of several columns
  * into one sort key gives every file a bounding BOX that is tight in
  * ALL interleaved dimensions, so a filter on any of them skips most
  * files. At 100 TB the difference is "scan one dimension's slice"
  * vs "scan everything" for the second-dimension predicate.
  *
  * Everything here is built-in bit arithmetic (`shiftright`/
  * `shiftleft`/`&`/`|`) — the unrolled term tree stays inside
  * whole-stage codegen, no UDF, and constant-folds when inputs are
  * literals. The layout step is one range shuffle (`repartitionByRange`
  * on the z-value) + an in-partition sort — exactly the cost of an
  * ordinary sort-by-key write.
  */
object ZOrder {

  /** Interleaved z-value of the low `bits` bits of each column: bit
    * `i` of column `j` lands at output position `i * n + j` (n =
    * column count) — for two columns the classic (x even, y odd)
    * Morton weave. Inputs are interpreted through their low `bits`
    * bits only; callers map their domain into [0, 2^bits) first
    * (modulo, bucketing, epoch-day offset, ...). `n * bits` must fit
    * a signed long (<= 63).
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.length
    require(n >= 2, "z-ordering needs at least two columns")
    require(bits >= 1 && n * bits <= 63, s"n*bits=${n * bits} must be in [2,63]")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Two-column convenience: x on even bit positions, y on odd. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column =
    zValue(Seq(x, y), bits)

  /** Re-cluster `df` along the z-curve of `cols`: one range shuffle
    * into `numRanges` z-contiguous partitions, sorted within each —
    * the write-side layout whose per-file min/max stats are tight in
    * every interleaved dimension. The z-value is dropped from the
    * output (it is a layout key, not data).
    */
  def layoutByZ(df: DataFrame, cols: Seq[Column], numRanges: Int,
                bits: Int = 16): DataFrame =
    df.withColumn("__z", zValue(cols, bits))
      .repartitionByRange(numRanges, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
