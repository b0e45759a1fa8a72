package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Curation composition semantics: gates only ever shrink, dedup is
  * first-wins, the sample bound holds, audits travel with survivors.
  */
class CurateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, SparkTestSession.Sf)
  private lazy val corpus = docs.filter(col("doc_id") % 20 =!= 0)
  private lazy val bench = docs.filter(col("doc_id") % 20 === 0)

  test("gates are monotone: tighter thresholds keep a subset") {
    val loose = Curate.curate(corpus, bench, col("doc_id"), col("text"),
      minQuality = 0.0, maxTopGram = 1.0, maxContamination = 1.1, sampleBp = 10000)
      .select("id").as[Long].collect().toSet
    val tight = Curate.curate(corpus, bench, col("doc_id"), col("text"),
      minQuality = 0.5, maxTopGram = 0.4, maxContamination = 0.5, sampleBp = 5000)
      .select("id").as[Long].collect().toSet
    assert(tight.subsetOf(loose))
    assert(tight.size < loose.size)
  }

  test("fully-open gates keep exactly the exact-dedup survivors") {
    val open = Curate.curate(corpus, bench, col("doc_id"), col("text"),
      minQuality = 0.0, maxTopGram = 1.0, maxContamination = 1.1, sampleBp = 10000)
    val distinctTexts = corpus.select("text").distinct().count()
    assert(open.count() == distinctTexts)
  }

  test("duplicate texts keep the smallest id") {
    val d = Seq(
      (5L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (9L, "a completely different document about the spark engine and its joins"))
      .toDF("doc_id", "text")
    val b = Seq((100L, "totally unrelated benchmark text nothing shared here at all ok"))
      .toDF("doc_id", "text")
    val kept = Curate.curate(d, b, col("doc_id"), col("text"),
      minQuality = 0.0, maxTopGram = 1.0, maxContamination = 1.1, sampleBp = 10000)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(2L, 9L))
  }

  test("audit columns survive within gate bounds") {
    val out = Curate.curate(corpus, bench, col("doc_id"), col("text")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("quality") >= 0.45)
      assert(r.getAs[Double]("top_gram_frac") <= 0.6)
      assert(r.getAs[Double]("contamination") < 0.6)
    }
  }

  test("plan: no cartesian anywhere in the composed pipeline") {
    val plan = Curate.curate(corpus, bench, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
