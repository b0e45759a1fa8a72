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

  test("cellDrift: identical snapshots drift 0; a collapsed snapshot concentrates drift") {
    val emb = graft.Tables.embeddings(spark, SparkTestSession.Sf).cache()
    val cents = Similarity.ivfCentroids(emb, 8)
    // same snapshot twice: every cell's counts match, drift exactly 0
    val same = Drift.cellDrift(emb, emb, col("embedding"), cents)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(same.nonEmpty)
    same.foreach { case (a, b, d) => assert(a == b && d == 0.0) }
    // snapshot B collapsed onto centroid 3's vector: all B mass lands
    // in one cell, so that cell (and only the occupied cells) drift
    val c3 = emb.filter(col("vec_id") === 3).select("embedding")
      .as[Array[Float]].head()
    val collapsed = emb.withColumn("embedding", typedLit(c3.toSeq))
    val moved = Drift.cellDrift(emb, collapsed, col("embedding"), cents)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val bCells = moved.filter(_._2 > 0)
    assert(bCells.length == 1, s"collapsed snapshot spread over ${bCells.toSeq}")
    assert(moved.filter(_._3 > 0).length >= 2) // the gaining and losing cells
    emb.unpersist()
  }

  test("empty corpus is rejected") {
    val a = corpus(1L -> "a")
    intercept[IllegalArgumentException] {
      Drift.totalVariation(a, a.filter(lit(false)), col("text"))
    }
  }
}
