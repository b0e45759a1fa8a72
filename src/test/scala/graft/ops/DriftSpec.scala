package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Drift metrics: TV bounds and exact values, top-mover ordering,
  * absent-token handling, top-k plan shape.
  */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("id", "text")

  test("identical corpora have tv = 0") {
    val c = corpus(1L -> "a b c", 2L -> "a a d")
    val tv = Drift.totalVariation(c, c, col("text"))
      .as[Double].head()
    assert(tv == 0.0)
  }

  test("disjoint vocabularies have tv = 1") {
    val a = corpus(1L -> "x y z")
    val b = corpus(2L -> "p q r r")
    assert(Drift.totalVariation(a, b, col("text")).as[Double].head() == 1.0)
  }

  test("tv matches the hand-computed value; symmetric") {
    // A: a a b (pa: a=2/3, b=1/3)  B: a b b b (pb: a=1/4, b=3/4)
    // TV = 0.5*(|2/3-1/4| + |1/3-3/4|) = 0.5*(5/12 + 5/12) = 5/12
    val a = corpus(1L -> "a a b")
    val b = corpus(2L -> "a b b b")
    val ab = Drift.totalVariation(a, b, col("text")).as[Double].head()
    val ba = Drift.totalVariation(b, a, col("text")).as[Double].head()
    assert(math.abs(ab - 5.0 / 12.0) < 1e-15 && ab == ba)
  }

  test("topDrift ranks the biggest movers first, zero-fills absent tokens") {
    val a = corpus(1L -> "same same gone gone gone")
    val b = corpus(2L -> "same same born born born")
    val rows = Drift.topDrift(a, b, col("text"), 10).collect()
    // movers: gone (3,0) and born (0,3) tie on drift; token asc
    assert(rows.map(_.getString(0)).take(2).toSeq == Seq("born", "gone"))
    val born = rows.find(_.getString(0) == "born").get
    assert(born.getLong(1) == 0L && born.getLong(2) == 3L)
    // 'same' moved zero: drift exactly 0
    assert(rows.find(_.getString(0) == "same").get.getDouble(3) == 0.0)
  }

  test("topDrift plans TakeOrderedAndProject, never a global sort") {
    val a = corpus(1L -> "a b c d e f")
    val plan = Drift.topDrift(a, a, col("text"), 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("empty corpus is rejected") {
    val a = corpus(1L -> "a")
    intercept[IllegalArgumentException] {
      Drift.totalVariation(a, a.filter(lit(false)), col("text"))
    }
  }
}
