package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** T3: priority order, case-insensitive resolution, type coercions,
  * empty-string semantics (batch/dynamo_fetcher.py:87-168).
  */
class TextExtractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("priority: summary beats text beats title") {
    val df = Seq(("s", "t", "h")).toDF("summary", "text", "title")
    assert(TextExtract.withText(df).select("text_extracted")
      .as[String].collect()(0) == "s")
  }
  test("empty-after-trim falls through to next candidate") {
    val df = Seq(("  ", "body text")).toDF("summary", "body")
    assert(TextExtract.withText(df).select("text_extracted")
      .as[String].collect()(0) == "body text")
  }
  test("case-insensitive column resolution (Timestamp ≡ timestamp style)") {
    val df = Seq(("caps", 1)).toDF("Summary", "x")
    assert(TextExtract.withText(df).select("text_extracted")
      .as[String].collect()(0) == "caps")
  }
  test("numeric candidates stringified") {
    val df = Seq((350, "12000")).toDF("percent_increase", "search_volume")
    assert(TextExtract.withText(df).select("text_extracted")
      .as[String].collect()(0) == "350")
  }
  test("struct candidate serialized to compact JSON") {
    val df = Seq((("k", 2), 1)).toDF("trend_breakdown", "x")
    val got = TextExtract.withText(df).select("text_extracted")
      .as[String].collect()(0)
    assert(got.startsWith("{") && got.contains("\"k\""))
  }
  test("no usable candidate -> NULL -> dropped by usable()") {
    val df = Seq(("only-irrelevant", 5)).toDF("irrelevant", "x")
    assert(TextExtract.withText(df).filter(col("text_extracted").isNotNull).count() == 0)
    assert(TextExtract.usable(df).count() == 0)
  }
  test("strings are trimmed") {
    val df = Seq(("  padded  ", 1)).toDF("content", "x")
    assert(TextExtract.withText(df).select("text_extracted")
      .as[String].collect()(0) == "padded")
  }
}
