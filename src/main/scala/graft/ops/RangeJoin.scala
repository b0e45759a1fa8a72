package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
    val l = left.withColumn("__bkt", floor(leftPoint / bucketWidth))
    val r = right.withColumn("__bkt",
      explode(sequence(floor(col(loCol) / bucketWidth),
                       floor(col(hiCol) / bucketWidth))))
    l.join(r, Seq("__bkt"))
      .filter(leftPoint >= col(loCol) && leftPoint <= col(hiCol))
      .drop("__bkt")
  }
}
