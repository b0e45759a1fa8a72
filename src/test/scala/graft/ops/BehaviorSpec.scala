package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Cohort retention + ordered funnel on crafted event streams. */
class BehaviorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cohortMatrix: offsets count distinct users against their first day") {
    // u1 first day 0, active 0/1/3; u2 first day 1, active 1/3; u3 day 0 only
    val ev = Seq((1L, 0L), (1L, 0L), (1L, 1L), (1L, 3L),
      (2L, 1L), (2L, 3L), (3L, 0L)).toDF("u", "day")
    val got = Retention.cohortMatrix(ev, col("u"), col("day"))
      .orderBy(col("cohort_day"), col("day_offset"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 2L), // u1+u3 start day 0
      (0L, 1L, 1L), (0L, 3L, 1L), // only u1 returns
      (1L, 0L, 1L), (1L, 2L, 1L))) // u2 starts day 1, back at day 3
  }

  private def funnel(ev: Seq[(Long, String, Long, Long)]) =
    Funnel.firstCompletion(ev.toDF("u", "et", "t", "o"),
      col("u"), col("et"), col("t"), col("o"),
      Seq("view", "click", "purchase"))
      .orderBy(col("u"))
      .select(col("u"), col("stage1_t"), col("stage2_t"), col("stage3_t"),
        col("stage_reached"))
      .collect()

  test("in-order completion reaches stage 3 with first qualified times") {
    val rows = funnel(Seq(
      (1L, "view", 10L, 1L), (1L, "click", 20L, 2L), (1L, "view", 25L, 3L),
      (1L, "purchase", 30L, 4L), (1L, "purchase", 40L, 5L)))
    val r = rows.head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((10L, 20L, 30L, 3L)))
  }

  test("out-of-order events do not count: purchase before any view") {
    val rows = funnel(Seq(
      (1L, "purchase", 5L, 1L), (1L, "view", 10L, 2L), (1L, "click", 20L, 3L)))
    val r = rows.head
    assert(r.getLong(1) == 10L && r.getLong(2) == 20L)
    assert(r.isNullAt(3) && r.getLong(4) == 2L)
  }

  test("click before view then after: only the later click qualifies") {
    val rows = funnel(Seq(
      (1L, "click", 5L, 1L), (1L, "view", 10L, 2L), (1L, "click", 30L, 3L)))
    val r = rows.head
    assert(r.getLong(2) == 30L && r.getLong(4) == 2L)
  }

  test("same-instant tie: earlier tieBreak stage satisfies the later one") {
    val rows = funnel(Seq(
      (1L, "view", 10L, 1L), (1L, "click", 10L, 2L)))
    val r = rows.head
    assert(r.getLong(1) == 10L && r.getLong(2) == 10L && r.getLong(4) == 2L)
    // reversed tiebreak: click sorts before the view -> not qualified
    val rev = funnel(Seq(
      (1L, "view", 10L, 2L), (1L, "click", 10L, 1L)))
    assert(rev.head.isNullAt(2) && rev.head.getLong(4) == 1L)
  }

  test("user with no funnel events reaches stage 0") {
    val rows = funnel(Seq((1L, "error", 10L, 1L)))
    val r = rows.head
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3)
      && r.getLong(4) == 0L)
  }

  test("funnel plans a single user-keyed exchange") {
    val df = Funnel.firstCompletion(
      Seq((1L, "view", 10L, 1L)).toDF("u", "et", "t", "o"),
      col("u"), col("et"), col("t"), col("o"), Seq("view", "click"))
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length == 1, plan)
  }
}
