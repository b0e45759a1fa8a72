package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bloom pre-join pruning: exactness (join clears false positives),
  * superset property, pruning power, empty-build edge.
  */
class BloomJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fact = (0L until 10000L).map(i => (i, i % 997)).toDF("f_id", "f_key")
  private def dim = (0L until 997L by 50L).map(k => (k, s"d$k")).toDF("d_key", "d_name")

  test("bloomJoin result is bit-identical to the plain join") {
    val plain = fact.join(dim, col("f_key") === col("d_key"))
      .select("f_id", "f_key", "d_name")
      .collect().map(_.toSeq).sortBy(_.toString)
    val bloomed = BloomJoin.bloomJoin(fact, col("f_key"), dim, col("d_key"),
      expectedItems = 100)
      .select("f_id", "f_key", "d_name")
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(bloomed.toSeq == plain.toSeq)
  }

  test("prefilter keeps a superset of matching rows and prunes hard") {
    val matching = fact.join(dim, col("f_key") === col("d_key"))
      .select("f_id").as[Long].collect().toSet
    val kept = BloomJoin.prefilter(fact, col("f_key"), dim, col("d_key"),
      expectedItems = 100, fpp = 0.01)
      .select("f_id").as[Long].collect().toSet
    assert(matching.subsetOf(kept), "bloom must never drop a matching row")
    // 20/997 keys survive exactly; fpp 1% leaves ample headroom at 5%
    assert(kept.size <= fact.count() * (20.0 / 997 + 0.05),
      s"pruning too weak: kept ${kept.size}")
  }

  test("empty build side prunes everything") {
    val out = BloomJoin.prefilter(fact, col("f_key"),
      dim.filter(lit(false)), col("d_key"), expectedItems = 10)
    assert(out.count() == 0)
  }

  test("null fact keys are pruned (inner-join semantics)") {
    val withNulls = Seq(Some(0L), None, Some(50L), None)
      .toDF("f_key")
    val kept = BloomJoin.prefilter(withNulls, col("f_key"), dim, col("d_key"),
      expectedItems = 100)
      .collect()
    assert(kept.forall(!_.isNullAt(0)))
  }

  test("optimalNumBits: standard sizing, clamped to Spark's own ceiling") {
    // 1M items at 3% -> ~7.3M bits
    val bits = BloomJoin.optimalNumBits(1000000L, 0.03)
    assert(bits > 7000000L && bits < 7600000L)
    assert(BloomJoin.optimalNumBits(1L, 0.5) >= 64L)
    // the ceiling matches BloomFilterAggregate's silent internal min
    // (spark.sql.optimizer.runtime.bloomFilter.maxNumBits, default
    // 67108864) - clamping higher would misreport the bloom built
    assert(BloomJoin.optimalNumBits(Long.MaxValue / 4, 0.0001) == 67108864L)
  }

  test("the pre-filter sits below the fact-side exchange in the plan") {
    // spark.range is not a LocalRelation, so ConvertToLocalRelation
    // can't eagerly evaluate the filter out of the plan
    val bigFact = spark.range(10000)
      .select(col("id").as("f_id"), (col("id") % 997).as("f_key"))
    val plan = BloomJoin.bloomJoin(bigFact, col("f_key"), dim, col("d_key"),
      expectedItems = 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // the probe filters the fact scan directly: it must appear below
    // the join, i.e. the Filter node references the Range source
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      "bloom probe should be on the fact input below the join\n" + plan)
  }
}
