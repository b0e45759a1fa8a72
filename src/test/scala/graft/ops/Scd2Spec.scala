package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SCD2: run collapse, version order, interval chaining, null attrs. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (key, attr, ts, ord): key 1 runs A,A,B,A; key 2 constant
  private lazy val obs = Seq(
    (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L),
    (1L, "A", 40L, 4L),
    (2L, "X", 10L, 5L), (2L, "X", 50L, 6L)).toDF("k", "a", "t", "o")

  private def hist = Scd2.history(obs, col("k"), col("a"), col("t"), col("o"))
    .orderBy(col("key"), col("version")).collect()

  test("consecutive equal observations collapse into one version") {
    val k1 = hist.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq == Seq("A", "B", "A"),
      "A-run collapses; the later A is a NEW version, not a merge")
    assert(k1.map(_.getLong(2)).toSeq == Seq(1L, 2L, 3L))
  }

  test("intervals chain: valid_to equals the next valid_from; last is open") {
    val k1 = hist.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getLong(3)).toSeq == Seq(10L, 30L, 40L))
    assert(k1.dropRight(1).map(_.getLong(4)).toSeq == Seq(30L, 40L))
    assert(k1.last.isNullAt(4) && k1.last.getBoolean(5))
    assert(k1.dropRight(1).forall(!_.getBoolean(5)))
  }

  test("constant key yields a single open version") {
    val k2 = hist.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2.head.getLong(3) == 10L
      && k2.head.getBoolean(5))
  }

  test("null attribute runs are null-safe (null == null collapses)") {
    val withNulls = Seq(
      (1L, Option.empty[String], 10L, 1L), (1L, Option.empty[String], 20L, 2L),
      (1L, Option("A"), 30L, 3L)).toDF("k", "a", "t", "o")
    val h = Scd2.history(withNulls, col("k"), col("a"), col("t"), col("o"))
      .orderBy(col("version")).collect()
    assert(h.length == 2)
    assert(h.head.isNullAt(1) && h.head.getLong(2) == 1L)
    assert(h.last.getString(1) == "A")
  }

  test("current() returns exactly the open intervals") {
    val cur = Scd2.current(obs, col("k"), col("a"), col("t"), col("o"))
      .orderBy(col("key")).collect()
    assert(cur.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "A"), (2L, "X")))
  }

  test("point-in-time: as-of against history picks each probe's run version") {
    val hist = Scd2.history(obs, col("k"), col("a"), col("t"), col("o"))
      .select(col("key").as("k"), col("version"), col("attr").as("cur"),
        col("valid_from"))
    val probes = Seq((1L, 15L, 100L), (1L, 30L, 101L), (1L, 99L, 102L),
      (2L, 60L, 103L)).toDF("k", "pt", "probe_id")
    val got = AsOfJoin.asofBackward(probes, hist, Seq("k"),
      col("pt"), col("valid_from"), Seq("version", "cur"))
      .orderBy(col("probe_id"))
      .select(col("probe_id"), col("version"), col("cur"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      (100L, 1L, "A"),  // t=15 inside the first A run
      (101L, 2L, "B"),  // boundary: version starting AT t applies
      (102L, 3L, "A"),  // after the last change -> current version
      (103L, 1L, "X")))
  }

  test("plan has a single exchange: all windows reuse the key shuffle") {
    val plan = Scd2.history(obs, col("k"), col("a"), col("t"), col("o"))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one key shuffle, plan:\n$plan")
  }
}
