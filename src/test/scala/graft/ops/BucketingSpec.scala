package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Bucketed co-located join: the shuffle is paid at write time; the
  * join itself must plan with zero Exchange on either side.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf

  private lazy val ready: Unit = {
    Bucketing.writeBucketed(
      Tables.orders(spark, dir).select(col("o_orderkey"), col("o_orderstatus")),
      "bspec_orders", "o_orderkey", 4, "/tmp/graft_bspec/orders")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "bspec_lineitem", "o_orderkey", 4, "/tmp/graft_bspec/lineitem")
  }

  test("bucketed join plans with zero exchanges") {
    ready
    val joined = Bucketing.bucketedJoin(spark, "bspec_orders", "bspec_lineitem",
      "o_orderkey")
    joined.collect()
    val plan = joined.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("Exchange"), s"shuffle in bucketed join:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected merge join:\n$plan")
  }

  test("bucketed join result equals the plain join") {
    ready
    val bucketed = Bucketing.bucketedJoin(spark, "bspec_orders",
      "bspec_lineitem", "o_orderkey")
      .groupBy("o_orderstatus").count()
    val plain = Tables.orders(spark, dir).select("o_orderkey", "o_orderstatus")
      .join(Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "o_orderkey")
      .groupBy("o_orderstatus").count()
    assert(bucketed.collect().toSet == plain.collect().toSet)
  }
}
