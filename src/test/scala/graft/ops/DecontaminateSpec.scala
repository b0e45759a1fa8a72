package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Contamination semantics: exact overlap ratios on hand-built docs,
  * bounds, short-doc convention, the filter, and the broadcast plan
  * shape the 100 TB claim rests on.
  */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact gram overlap: full, partial, zero") {
    val bench = df(100L -> "a b c d")           // grams: {a b c, b c d}
    val corpus = df(
      1L -> "a b c d",                          // both grams hit -> 1.0
      2L -> "a b c x y",                        // {a b c, b c x, c x y}: 1/3
      3L -> "p q r s")                          // no hits -> 0.0
    val got = Decontaminate.contamination(corpus, bench,
      col("doc_id"), col("text"), n = 3)
      .orderBy("id")
      .select("id", "n_grams", "n_hits", "contamination")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1.0),
      (2L, 3L, 1L, 1.0 / 3.0),
      (3L, 2L, 0L, 0.0)))
  }

  test("repeated grams count once (distinct semantics)") {
    val bench = df(100L -> "x x x x x")
    val corpus = df(1L -> "x x x x x x x x") // all 3-grams identical
    val got = Decontaminate.contamination(corpus, bench,
      col("doc_id"), col("text"), n = 3).head()
    assert(got.getAs[Long]("n_grams") == 1L)
    assert(got.getAs[Long]("n_hits") == 1L)
    assert(got.getAs[Double]("contamination") == 1.0)
  }

  test("short docs (< n tokens) compare whole-text grams") {
    val bench = df(100L -> "a b")
    val corpus = df(1L -> "a b", 2L -> "a c")
    val got = Decontaminate.contamination(corpus, bench,
      col("doc_id"), col("text"), n = 3)
      .orderBy("id").select("contamination").as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("decontaminated keeps only rows under the threshold") {
    val bench = df(100L -> "a b c d")
    val corpus = df(1L -> "a b c d", 2L -> "a b c x y", 3L -> "p q r s")
    val kept = Decontaminate.decontaminated(corpus, bench,
      col("doc_id"), col("text"), n = 3, maxContamination = 0.5)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(2L, 3L))
  }

  test("plan: benchmark gram probe is a broadcast join (corpus never shuffles for it)") {
    val bench = df(100L -> "a b c d")
    val corpus = df(1L -> "a b c d", 2L -> "p q r s")
    val plan = Decontaminate.contamination(corpus, bench,
      col("doc_id"), col("text"), n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }
}
