package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bucketed range join: equi-join on bucket id + residual BETWEEN must
  * equal the naive interval join, for intervals smaller, equal to, and
  * spanning multiple bucket widths — and must not plan a nested loop.
  */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val points = Seq(0L, 5L, 49L, 50L, 99L, 100L, 149L, 260L)
  private val ranges = Seq(
    // (range_id, lo, hi): narrow, bucket-aligned, multi-bucket, point
    (1L, 3L, 7L), (2L, 50L, 99L), (3L, 40L, 160L), (4L, 260L, 260L))

  private def expected: Set[(Long, Long)] =
    (for {
      p <- points
      (id, lo, hi) <- ranges
      if p >= lo && p <= hi
    } yield (p, id)).toSet

  test("matches the naive interval join across bucket widths") {
    val l = points.toDF("p")
    val r = ranges.toDF("range_id", "lo", "hi")
    for (w <- Seq(1L, 7L, 50L, 1000L)) {
      val got = RangeJoin.bucketed(l, col("p"), r, "lo", "hi", w)
        .select("p", "range_id").as[(Long, Long)].collect().toSet
      assert(got == expected, s"bucketWidth=$w")
    }
  }

  test("no duplicate output rows when an interval spans many buckets") {
    val l = Seq(55L).toDF("p")
    val r = Seq((9L, 0L, 500L)).toDF("range_id", "lo", "hi")
    val got = RangeJoin.bucketed(l, col("p"), r, "lo", "hi", 10L)
      .select("p", "range_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((55L, 9L)))
  }

  test("plans an equi-join, not a nested-loop product") {
    val l = points.toDF("p")
    val r = ranges.toDF("range_id", "lo", "hi")
    val plan = RangeJoin.bucketed(l, col("p"), r, "lo", "hi", 50L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
