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

  test("64-bit keys beyond 2^53 bucket exactly (no double-rounding)") {
    // Column `/` is double division: above 2^53 the quotient's ulp
    // exceeds 1, so double bucketing collapses runs of adjacent true
    // buckets into one id (ulp(2^60/7) = 64 — ~64 width-7 buckets
    // merge, a silent skew machine at scale). The integral path must
    // bucket exactly: distinct far-apart points keep distinct buckets
    // and the naive-join result is reproduced bit-for-bit.
    val base = (1L << 60) + 12345L
    val pts = Seq(base - 8L, base - 1L, base, base + 6L, base + 7L, base + 700L)
    val rngs = Seq((1L, base - 2L, base + 6L), (2L, base + 7L, base + 13L),
                   (3L, base + 650L, base + 710L))
    val exp = (for {
      p <- pts; (id, lo, hi) <- rngs; if p >= lo && p <= hi
    } yield (p, id)).toSet
    for (w <- Seq(1L, 7L, 1000L)) {
      val got = RangeJoin.bucketed(pts.toDF("p"), col("p"),
          rngs.toDF("range_id", "lo", "hi"), "lo", "hi", w)
        .select("p", "range_id").as[(Long, Long)].collect().toSet
      assert(got == exp, s"bucketWidth=$w")
    }
    // bucket-id exactness probe: adjacent points straddling a width-7
    // boundary must land in DIFFERENT buckets even at 2^60
    val b0 = base - (base % 7) // width-7 bucket floor
    val ids = RangeJoin.bucketed(Seq(b0 - 1L, b0).toDF("p"), col("p"),
        Seq((1L, b0 - 7L, b0 + 7L)).toDF("range_id", "lo", "hi"), "lo", "hi", 7L)
      .count()
    assert(ids == 2L)
  }

  test("negative integral keys floor toward -infinity, not zero") {
    val pts = Seq(-10L, -3L, -1L, 0L, 3L)
    val rngs = Seq((1L, -12L, -2L), (2L, -2L, 4L))
    val exp = (for {
      p <- pts; (id, lo, hi) <- rngs; if p >= lo && p <= hi
    } yield (p, id)).toSet
    val got = RangeJoin.bucketed(pts.toDF("p"), col("p"),
        rngs.toDF("range_id", "lo", "hi"), "lo", "hi", 3L)
      .select("p", "range_id").as[(Long, Long)].collect().toSet
    assert(got == exp)
  }

  test("fractional point columns still work (double path)") {
    val pts = Seq(0.5, 5.25, 49.9)
    val rngs = Seq((1L, 0.0, 5.0), (2L, 5.0, 50.0))
    val exp = (for {
      p <- pts; (id, lo, hi) <- rngs; if p >= lo && p <= hi
    } yield (p, id)).toSet
    val got = RangeJoin.bucketed(pts.toDF("p"), col("p"),
        rngs.toDF("range_id", "lo", "hi"), "lo", "hi", 10L)
      .select("p", "range_id").as[(Double, Long)].collect().toSet
    assert(got == exp)
  }

  test("mixed-type sides use ONE bucket arithmetic (no boundary drop)") {
    // long points near 2^60 against DOUBLE bounds: the exact integral
    // path on the left with the double path on the right can round a
    // boundary point and its interval to different bucket ids — both
    // sides must fall back to the double path together
    val base = 1L << 60
    val pts = (0L to 6L).map(k => base + k * 64L)
    val rngs = Seq((1L, base.toDouble, (base + 512L).toDouble))
    val got = RangeJoin.bucketed(pts.toDF("p"), col("p"),
        rngs.toDF("range_id", "lo", "hi"), "lo", "hi", 7L)
      .select("p").as[Long].collect().toSet
    // every point whose double image sits inside [lo, hi] must appear
    val exp = pts.filter(p => p >= base && p <= base + 512L).toSet
    assert(got == exp)
  }

  test("scale-0 decimal keys ride the exact integral path") {
    val pts = Seq((1L << 60) + 3L, (1L << 60) + 100L)
    val l = pts.toDF("p").select(col("p").cast("decimal(20,0)").as("p"))
    val r = Seq(((1L << 60), (1L << 60) + 50L, 1L)).toDF("lo", "hi", "range_id")
      .select(col("lo").cast("decimal(20,0)").as("lo"),
        col("hi").cast("decimal(20,0)").as("hi"), col("range_id"))
    val got = RangeJoin.bucketed(l, col("p"), r, "lo", "hi", 7L)
      .select("range_id").as[Long].collect().toSeq
    assert(got == Seq(1L)) // only base+3 falls inside; base+100 is out
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
