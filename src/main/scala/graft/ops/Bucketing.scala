package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (co-located) joins — the zero-shuffle answer to repeated
  * fact-to-fact joins at 100 TB. Writing both sides `bucketBy(n, key)`
  * + `sortBy(key)` fixes their physical distribution on disk; a later
  * equi-join on the bucket key needs NO Exchange on either side (and
  * with sorted buckets, no Sort), so the dominant cost of the join —
  * shuffling terabytes — is paid once at write time and amortized over
  * every subsequent join, the same trade a partitioned/bucketed lake
  * table (Hive/Iceberg bucket transform) makes.
  *
  * Bucket metadata lives in the session catalog (`saveAsTable`); the
  * files are plain parquet at `path` (external table), so non-Spark
  * readers see an ordinary directory.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted parquet table. The
    * table name is catalog-scoped; re-registering is idempotent
    * (overwrite). `buckets` should match across tables meant to be
    * co-joined (Spark joins bucketed sides shuffle-free when counts
    * match; a mismatch falls back to shuffling the smaller-bucketed
    * side).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    df.write
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Equi-join two co-bucketed tables on their bucket key. The merge
    * hint pins sort-merge (a broadcast would hide the point at test
    * scale; at production scale neither side broadcasts anyway) —
    * with matching bucket counts the planned join has no Exchange.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), key)
}
