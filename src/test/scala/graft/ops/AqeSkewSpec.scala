package graft.ops

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** AQE's runtime skew-join split — the adaptive complement to the
  * explicit [[Salting]] operator: when the skew is NOT known ahead,
  * AQE detects the oversized shuffle partition at runtime and splits
  * it across multiple tasks. This spec pins that the engine's session
  * configuration actually enables the behavior (thresholds scaled to
  * test data size).
  */
class AqeSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("AQE splits a skewed join partition at runtime") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.enabled"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "20KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // one celebrity key dominating the fact side; parquet-backed so
      // the plan has real shuffle stages for AQE to re-plan
      val dir = java.nio.file.Files.createTempDirectory("aqe_skew").toString
      ((1 to 50000).map(i => (i.toLong, 7L)) ++
        (1 to 500).map(i => (100000L + i, (i % 40).toLong)))
        .toDF("row_id", "k").write.mode("overwrite").parquet(s"$dir/fact")
      (0L to 50L).map(k => (k, s"name_$k")).toDF("k", "name")
        .write.mode("overwrite").parquet(s"$dir/dim")
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim")

      val joined = fact.join(dim, "k")
      // collect() (not count) so THIS dataframe's adaptive plan runs
      assert(joined.collect().length == 50500)
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case p => p.toString
      }
      assert(plan.contains("skew=true"), s"no skew split in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
