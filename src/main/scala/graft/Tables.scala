package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Parquet table loaders for the driver-generated star schema
  * (/root/repo/TESTDATA.md). At production scale these would be
  * catalog tables / DSv2 sources; the API shape (name -> DataFrame)
  * is the same either way.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Every load normalizes TIMESTAMP_NTZ columns to TimestampType
    * (the session TZ is pinned UTC, so the cast is a lossless
    * reinterpretation): the driver's parquet writes timestamps
    * without the UTC-adjusted flag (orders.o_orderdate,
    * lineitem.l_shipdate, events.ts all read as NTZ), and one
    * un-normalized column is a latent CAST_WITHOUT_SUGGESTION /
    * type-mismatch trap for every future query touching it.
    * TableContractSpec pins the post-load logical schema of all ten
    * tables.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    raw.schema.fields.filter(_.dataType == TimestampNTZType)
      .foldLeft(raw)((df, f) =>
        df.withColumn(f.name, col(f.name).cast(TimestampType)))
  }

  /** Register every table as a temp view so the whole engine is
    * reachable from `spark.sql(...)` (with the native kernels via
    * [[GraftExtensions.register]]). `events` goes through its
    * nanos-aware loader, not a raw parquet read.
    */
  def registerViews(spark: SparkSession, sfDir: String): Unit =
    All.foreach { t =>
      val df = if (t == "events") events(spark, sfDir) else load(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }

  /** Idempotent, thread-safe [[registerViews]]. Verify runs queries on
    * a pool, and a bare `if (!tableExists(x)) registerViews(...)` is
    * check-then-act: a thread can observe an early view registered
    * while another is mid-registration and run SQL against a view set
    * that is still missing its tail. The lock makes the whole view set
    * appear atomically; the existence probe targets the LAST view
    * registered so a half-done set never short-circuits.
    */
  def ensureViews(spark: SparkSession, sfDir: String): Unit =
    viewLock.synchronized {
      if (!spark.catalog.tableExists(All.last)) registerViews(spark, sfDir)
    }
  private val viewLock = new Object

  /** SRC2: list the session catalog's tables (reference
    * `--list-tables`, main.py:624-634 — there a DynamoDB ListTables
    * call; here the Spark catalog is the table store).
    */
  def listCatalogTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).toSeq.sorted

  /** The events table's `ts` column has shipped under three physical
    * parquet encodings across driver testdata generations, and the
    * engine must read all of them into one logical TimestampType:
    *
    *  - TIMESTAMP(NANOS): Spark has no native nanos type, so read
    *    nanos as long (`spark.sql.legacy.parquet.nanosAsLong`) and
    *    convert with exact integer division (a double division would
    *    lose precision above 2^53 ns);
    *  - timestamp[us] WITHOUT isAdjustedToUTC: Spark reads this as
    *    TIMESTAMP_NTZ. The session TZ is pinned UTC (build.sbt), so
    *    casting NTZ -> TimestampType reinterprets the same wall-clock
    *    instant losslessly;
    *  - timestamp[us] UTC-adjusted: already TimestampType, pass through.
    *
    * TimestampContractSpec pins all three arms.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    normalizeTs(raw)
  }

  /** Normalize a `ts` column of any supported physical encoding
    * (int64 nanos, TIMESTAMP_NTZ, TimestampType) to TimestampType.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
}
