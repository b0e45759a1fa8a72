package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Schema contract for the events table's `ts` column: the driver has
  * shipped it as int64 nanos, timestamp[us] NTZ (unadjusted-to-UTC),
  * and timestamp[us] UTC-adjusted across testdata generations. All
  * three physical encodings must normalize to one logical
  * TimestampType carrying the same instant, so a regeneration can
  * never silently change query semantics again.
  */
class TimestampContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val epochMicros = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  private def writeAndLoad(writeDf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val dir = Files.createTempDirectory("ts_contract_").toString
    writeDf.write.mode("overwrite").parquet(s"$dir/events.parquet")
    Tables.events(spark, dir)
  }

  private def assertContract(df: org.apache.spark.sql.DataFrame): Unit = {
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.select(
      unix_timestamp(col("ts")).as("sec"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("iso"))
      .head()
    assert(got.getLong(0) == epochMicros / 1000000L)
    assert(got.getString(1) == "2023-11-14 22:13:20.123456")
  }

  test("timestamp[us] UTC-adjusted loads as TimestampType with the same instant") {
    // Spark's default parquet writer emits timestamp[us] isAdjustedToUTC
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(epochMicros)))
    assertContract(writeAndLoad(df))
  }

  test("timestamp[us] NTZ (unadjusted) loads as TimestampType with the same instant") {
    // TIMESTAMP_NTZ columns write parquet timestamp[us] without the
    // UTC-adjusted flag — the encoding of the regenerated driver data
    val df = Seq(1L).toDF("event_id")
      .withColumn("ts", timestamp_micros(lit(epochMicros)).cast(TimestampNTZType))
    assert(df.schema("ts").dataType == TimestampNTZType)
    assertContract(writeAndLoad(df))
  }

  test("int64 nanos loads as TimestampType with the same instant (exact division)") {
    // the nanosAsLong read path: model it as the raw long column the
    // legacy flag produces
    val df = Seq((1L, epochMicros * 1000L)).toDF("event_id", "ts")
    assertContract(writeAndLoad(df))
  }

  test("registerViews exposes events.ts as TimestampType") {
    Tables.ensureViews(spark, SparkTestSession.Sf)
    assert(spark.table("events").schema("ts").dataType == TimestampType)
  }
}
