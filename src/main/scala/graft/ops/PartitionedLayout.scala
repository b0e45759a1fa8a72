package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned layout (`partitionBy` on write) — the data
  * layout that makes temporal/categorical predicates prune at FILE
  * LISTING time, before a single byte is read. At 100 TB a
  * date-partitioned events lake turns the reference's look-back filter
  * (T4) from "scan everything, filter rows" into "list 12 of 8760
  * directories" — the same reason the reference's own remedy for scan
  * cost is a time-keyed GSI (dynamo_fetcher.py:23-36).
  *
  * PartitionPruningSpec asserts the pruning is visible in the plan
  * (`PartitionFilters`, shrunken file count), not assumed.
  */
object PartitionedLayout {

  /** Write `df` partitioned by the given columns (directory per value
    * combination). Partition columns should be low-cardinality and
    * filter-bearing (event date, table name, language) — one directory
    * per value; a high-cardinality partition column creates a
    * small-files catastrophe instead of pruning.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.partitionBy(partitionCols: _*).mode("overwrite").parquet(path)

  /** Read back; filters on partition columns prune directories. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
