package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** T8/T9/W1/SNK1 (batch/jsonl_formatter.py:154-188, models.py:38-87). */
class PayloadSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val items = Seq(
    (3L, "third", "id3"), (1L, "first", "id1"), (2L, "second", null))
    .toDF("ord", "txt", "src_id")

  test("custom_id is 1-based dense in order-column order") {
    val req = Payload.requests(items, col("txt"), Some(col("src_id")), col("ord"))
    val pairs = req.select(col("custom_id"),
      element_at(col("body.messages"), 2).getField("content"))
      .as[(String, String)].collect().toSeq.sortBy(_._1)
    assert(pairs == Seq("row_1" -> "first", "row_2" -> "second", "row_3" -> "third"))
  }
  test("custom_id stays within the 64-char bound") {
    val req = Payload.requests(items, col("txt"), None, col("ord"))
    assert(req.select(max(length(col("custom_id")))).collect()(0).getInt(0) <= 64)
  }
  test("JSONL omits the user field when the source id is NULL") {
    val lines = Payload.toJsonLines(
      Payload.requests(items, col("txt"), Some(col("src_id")), col("ord")))
      .as[String].collect()
    val withUser = lines.filter(_.contains("\"user\":"))
    assert(withUser.length == 2) // src_id null on row 2
    assert(lines.forall(_.startsWith("""{"custom_id":"row_""")))
    assert(lines.forall(_.contains("\"method\":\"POST\"")))
  }
  test("model resolution: alias, passthrough, unknown->default") {
    assert(Payload.resolveModel("nano") == Payload.ModelMap("nano"))
    assert(Payload.resolveModel("gpt-4o") == "gpt-4o")
    assert(Payload.resolveModel("bogus-model") == Payload.ModelMap("nano"))
  }
  test("partitioned numbering is unique") {
    val df = (1L to 500L).toDF("ord").withColumn("txt", concat(lit("t"), col("ord")))
    val req = Payload.requestsPartitioned(df.repartition(4), col("txt"), None, col("ord"))
    assert(req.select("custom_id").distinct().count() == 500)
  }
  test("writeJsonl returns the written count") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString + "/out"
    val n = Payload.writeJsonl(
      Payload.requests(items, col("txt"), None, col("ord")), dir)
    assert(n == 3)
    assert(spark.read.text(dir).count() == 3)
  }
}
