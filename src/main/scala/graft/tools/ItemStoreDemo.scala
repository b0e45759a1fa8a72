package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.GraftExtensions
import graft.ops.Ingest

/** Library-surface demo: JSONL pages → DSv2 item-store scan → full
  * ingest pipeline → request records; plus the SQL-registered kernels.
  * (Also serves as the runnable end-to-end drive for these surfaces.)
  */
object ItemStoreDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = Files.createTempDirectory("itemstore_demo").toString
    Files.writeString(Paths.get(s"$dir/page_000.jsonl"),
      """{"id":"a1","timestamp":1716241234,"summary":"plain epoch-seconds row","url":"https://ex.com/1"}
        |{"id":"a2","Timestamp":"1716241234567","text":"epoch-millis-as-string row","link":"HTTPS://EX.COM/1"}
        |{"id":"a3","published_at":"2025-05-19T21:20:00Z","content":"ISO-8601 Z row"}
        |""".stripMargin)
    Files.writeString(Paths.get(s"$dir/page_001.jsonl"),
      """{"id":"a4","created":"2025-05-19 17:20:00 EST","title":"EST fixed-offset row"}
        |{"id":"a7","ts":"not-a-date","body":"unparseable ts row"}
        |{"timestamp":1716241234,"summary":"keyless row"}
        |not-even-json
        |{"id":"a9","timestamp":1716241234,"irrelevant":"no text candidate"}
        |""".stripMargin)

    val items = spark.read.format("graft.sources.ItemStore")
      .option("path", dir).load()
    println(s"scan partitions = ${items.rdd.getNumPartitions}")
    items.show(10, truncate = false)

    val requests = Ingest.run(items,
      cutoffEpochSec = 1700000000L,
      orderCol = coalesce(col("id"), lit("zzz")))
    println("--- request records ---")
    requests.select(col("custom_id"), col("body.user"),
      element_at(col("body.messages"), 2).getField("content")).show(10, truncate = false)
    println(s"requests = ${requests.count()}")

    GraftExtensions.register(spark)
    items.createOrReplaceTempView("items")
    println("--- SQL kernel surface ---")
    spark.sql(
      """SELECT id, simhash64(shingles(coalesce(summary, text, content, title, body), 2)) AS sh
        |FROM items WHERE coalesce(summary, text, content, title, body) IS NOT NULL
        |ORDER BY id""".stripMargin).show(truncate = false)
    spark.stop()
  }
}
