package graft.ops

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Partition-column predicates must prune at file-listing time. */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf
  private val path = "/tmp/graft_partitioned_events"

  private lazy val ready: Unit = PartitionedLayout.writePartitioned(
    Tables.events(spark, dir).withColumn("event_date", to_date(col("ts"))),
    path, Seq("event_date"))

  test("a partition-column filter prunes directories in the plan") {
    ready
    val all = PartitionedLayout.read(spark, path)
    val oneDay = all.filter(col("event_date") === "2024-01-15")
    oneDay.collect()
    val plan = oneDay.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scan = plan.collectFirst { case s: FileSourceScanExec => s }.get
    assert(scan.partitionFilters.nonEmpty, "no partition filters in scan")
    val prunedParts = scan.relation.location
      .listFiles(scan.partitionFilters, scan.dataFilters).length
    val totalParts = scan.relation.location.listFiles(Nil, Nil).length
    assert(prunedParts < totalParts,
      s"no pruning: $prunedParts of $totalParts partitions read")
    assert(prunedParts <= 1, s"expected <=1 partition, read $prunedParts")
  }

  test("pruned read returns the same rows as a row-level filter") {
    ready
    val pruned = PartitionedLayout.read(spark, path)
      .filter(col("event_date") === "2024-01-15").count()
    val rowFiltered = Tables.events(spark, dir)
      .filter(to_date(col("ts")) === "2024-01-15").count()
    assert(pruned == rowFiltered)
    assert(pruned > 0, "test date not present in events")
  }
}
