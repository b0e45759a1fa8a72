package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bucketed (banded) range join — `left.point BETWEEN right.lo AND
  * right.hi` without the nested-loop cross product Spark plans for a
  * bare interval predicate.
  *
  * Each right interval is exploded to every fixed-width bucket it
  * overlaps; the left point maps to exactly one bucket; the join is
  * then a plain equi-join on the bucket id plus the residual BETWEEN
  * filter. ONE shuffle on a uniform integer key — this is the shape
  * that survives 100 TB: cost is `|left| + |right| * avg_buckets_per
  * _interval`, linear in both inputs, instead of `|left| * |right|`
  * for BroadcastNestedLoopJoin (which additionally requires one side
  * to fit in memory).
  *
  * `bucketWidth` tunes the expansion factor: ~ the median interval
  * width is a good default (each interval lands in 1–2 buckets). Skewed
  * point distributions are handled by the same AQE skew-split as any
  * equi-join ([[Salting]] for pathological keys).
  */
object RangeJoin {

  /** @param left        point side; all its columns survive
    * @param leftPoint   numeric point column on `left`
    * @param right       interval side: `loCol`/`hiCol` + payload
    * @param loCol       inclusive lower-bound column name on `right`
    * @param hiCol       inclusive upper-bound column name on `right`
    * @param bucketWidth positive bucket width in the point's units
    */
  def bucketed(left: DataFrame, leftPoint: Column, right: DataFrame,
               loCol: String, hiCol: String, bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    // ONE arithmetic mode for all three columns: mixing the exact
    // integral path on one side with the double path on the other
    // would let the point and its containing interval round to
    // DIFFERENT bucket ids near a boundary — the equi-join would then
    // silently drop matching rows. Exact only when every key column
    // is integral.
    val exact = integralType(left, leftPoint) &&
      integralType(right, col(loCol)) && integralType(right, col(hiCol))
    val l = left.withColumn("__bkt", bucketId(leftPoint, bucketWidth, exact))
    val r = right.withColumn("__bkt",
      explode(sequence(bucketId(col(loCol), bucketWidth, exact),
                       bucketId(col(hiCol), bucketWidth, exact))))
    l.join(r, Seq("__bkt"))
      .filter(leftPoint >= col(loCol) && leftPoint <= col(hiCol))
      .drop("__bkt")
  }

  /** Exact floor-division bucket id. Column `/` is DOUBLE division, so
    * `floor(key / w)` on 64-bit keys beyond 2^53 can round the point
    * and the interval ends to DIFFERENT bucket ids — the equi-join then
    * silently drops matching rows. For integral keys, compute floorDiv
    * exactly: `x - pmod(x, w)` is the exact floor multiple (pmod >= 0
    * handles negatives), and the division runs in DECIMAL arithmetic
    * (exact for an integral quotient of <= 19 digits; no 2^53 cliff).
    * Fractional keys keep the double path — their values carry
    * double precision to begin with.
    */
  private def bucketId(c: Column, w: Long, integral: Boolean): Column =
    if (integral)
      ((c - pmod(c, lit(w))).cast(DecimalType(38, 0)) /
        lit(w).cast(DecimalType(38, 0))).cast("long")
    else floor(c / lit(w.toDouble))

  private def integralType(df: DataFrame, c: Column): Boolean =
    df.select(c).schema.head.dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      // scale-0 decimals (e.g. DECIMAL(20,0) bigint-ish keys) are
      // integral too: pmod/decimal division stays exact for them
      case d: DecimalType if d.scale == 0 => true
      case _ => false
    }
}
