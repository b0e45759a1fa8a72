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

  test("toSequences: packs respect the budget and carry every curated token") {
    val maxChunks = 1000000L
    val packs = Curate.toSequences(corpus, bench, col("doc_id"), col("text"),
      chunkTokens = 64, overlap = 0, packBudget = 256L, shards = 8,
      maxChunksPerDoc = maxChunks).cache()
    // budget: no pack exceeds 256 tokens (oversized singletons can't
    // occur: a chunk is <= 64 tokens)
    val overBudget = packs.groupBy(col("packId"))
      .agg(sum(col("nTokens")).as("tot"))
      .filter(col("tot") > 256L).count()
    assert(overBudget == 0)
    // completeness: packed token mass == token mass of curated docs
    val curatedIds = Curate.curate(corpus, bench, col("doc_id"), col("text"))
      .select(col("id"))
    val expected = corpus.join(curatedIds,
        corpus("doc_id") === curatedIds("id"), "left_semi")
      .select(sum(TextStats.tokenCount(col("text")))).head().getLong(0)
    val packed = packs.select(sum(col("nTokens"))).head().getLong(0)
    assert(packed == expected)
    // chunk ids decode back to curated doc ids only
    val decoded = packs.select((col("docId") / maxChunks).cast("long"))
      .distinct().as[Long].collect().toSet
    val curated = curatedIds.as[Long].collect().toSet
    assert(decoded == curated)
    packs.unpersist()
  }
}
