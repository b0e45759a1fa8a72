package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Approximate aggregates stay within their declared error of the
  * exact operators.
  */
class ApproxAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf

  test("approx distinct within 5% of exact count-distinct per group") {
    val li = Tables.lineitem(spark, dir)
    val approx = ApproxAgg.distinctCounts(li, Seq(col("l_returnflag")),
      col("l_orderkey"), rsd = 0.02)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_orderkey")).as("exact"))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Long]("approx_distinct").toDouble
      val e = r.getAs[Long]("exact").toDouble
      assert(math.abs(a - e) / e < 0.05, s"${r.get(0)}: approx $a vs exact $e")
    }
  }

  test("approx median within 10% of exact per group") {
    val li = Tables.lineitem(spark, dir)
    val approx = ApproxAgg.percentiles(li, Seq(col("l_returnflag")),
      col("l_quantity"), Seq(0.5))
    val exact = li.groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("exact_p50"))
    val joined = approx.join(exact, "l_returnflag").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val a = r.getAs[Seq[Double]]("approx_ps").head
      val e = r.getAs[Double]("exact_p50")
      assert(math.abs(a - e) / math.max(e, 1.0) < 0.10,
        s"${r.get(0)}: approx $a vs exact $e")
    }
  }

  test("percentilesScalar flattens to the named scalar columns, one sketch pass") {
    val li = Tables.lineitem(spark, dir)
    val flat = ApproxAgg.percentilesScalar(li, Seq(col("l_returnflag")),
      col("l_quantity"), Seq(0.25, 0.5, 0.75), Seq("p25", "p50", "p75"))
    assert(flat.columns.toSeq == Seq("l_returnflag", "p25", "p50", "p75"))
    assert(flat.schema.forall(f => f.name == "l_returnflag" ||
      f.dataType == org.apache.spark.sql.types.DoubleType))
    // values agree with the array form element-for-element
    val arr = ApproxAgg.percentiles(li, Seq(col("l_returnflag")),
      col("l_quantity"), Seq(0.25, 0.5, 0.75))
    val byFlag = arr.collect()
      .map(r => r.getString(0) -> r.getAs[collection.Seq[Double]]("approx_ps").toList)
      .toMap
    flat.collect().foreach { r =>
      val ps = byFlag(r.getString(0))
      assert(List(r.getDouble(1), r.getDouble(2), r.getDouble(3)) == ps)
    }
    // still exactly one aggregate over the scan: no second sketch pass
    val aggs = flat.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size == 1, s"expected one Aggregate, got ${aggs.size}")
  }

  test("topKItems equals exact top-k while distinct items fit the sketch") {
    // vocab ~31 << maxItemsTracked, so the frequent-items sketch is
    // EXACT here; any estimation drift in this regime is a regression
    val toks = Tables.documents(spark, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
    val got = ApproxAgg.topKItems(toks, col("lang"), col("tok"), k = 3)
      .select("grp", "item", "est").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val exact = toks.groupBy(col("lang"), col("tok")).count()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
          .orderBy(col("count").desc, col("tok").asc)))
      .filter(col("rk") <= 3)
      .select(col("lang"), col("tok"), col("count")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == exact, s"sketch drifted: got=$got exact=$exact")
  }

  test("approx distinct plans a partial (mergeable sketch) aggregate") {
    val li = Tables.lineitem(spark, dir)
    val df = ApproxAgg.distinctCounts(li, Seq(col("l_returnflag")), col("l_orderkey"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_approx_count_distinct"),
      s"sketch not map-side combined:\n$plan")
  }
}
