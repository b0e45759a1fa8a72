package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Keyed backward as-of join: latest right row with ts <= left ts,
  * inclusive at equality, null when no prior right row exists.
  */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(left: Seq[(String, Long)], right: Seq[(String, Long, String)]) = {
    val l = left.toDF("k", "ts")
    val r = right.toDF("k", "rts", "v")
    AsOfJoin.asofBackward(l, r, Seq("k"), col("ts"), col("rts"), Seq("v"))
      .select("k", "ts", "v").as[(String, Long, String)].collect().toSet
  }

  test("picks the latest right row at or before each left ts") {
    val out = run(
      left = Seq(("a", 5L), ("a", 15L), ("a", 25L)),
      right = Seq(("a", 10L, "x"), ("a", 20L, "y")))
    assert(out == Set(("a", 5L, null), ("a", 15L, "x"), ("a", 25L, "y")))
  }

  test("inclusive at ts equality") {
    val out = run(left = Seq(("a", 10L)), right = Seq(("a", 10L, "eq")))
    assert(out == Set(("a", 10L, "eq")))
  }

  test("keys never cross") {
    val out = run(
      left = Seq(("a", 10L), ("b", 10L)),
      right = Seq(("a", 5L, "onlyA")))
    assert(out == Set(("a", 10L, "onlyA"), ("b", 10L, null)))
  }

  test("all left columns survive; left row count preserved") {
    val l = Seq((1L, "a", 10L), (2L, "a", 20L)).toDF("id", "k", "ts")
    val r = Seq(("a", 5L, 99L)).toDF("k", "rts", "mark")
    val out = AsOfJoin.asofBackward(l, r, Seq("k"), col("ts"), col("rts"), Seq("mark"))
    assert(out.columns.toSet == Set("id", "k", "ts", "mark"))
    assert(out.count() == 2)
  }
}
