package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** P1–P6 over the reference wire fixtures (FIXTURES.md §B3;
  * batch/batch_parse/parse.py).
  */
class ParseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def envelope(customId: String, status: Int, content: String): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n") + "\""
    s"""{"id":"x","custom_id":"$customId","response":{"status_code":$status,""" +
      s""""body":{"choices":[{"message":{"role":"assistant","content":${q(content)}}}]}}}"""
  }

  private val fixtures = Seq(
    envelope("row_1", 200, """{"ticker":"ACME","signal":"buy"}"""),
    envelope("row_2", 200, "```json\n{\"ticker\":\"ACME\"}\n```"),
    envelope("row_3", 200,
      "{\"vol\": 1,230,456, \"chg\": +0.5, // comment\n \"tags\": [\"a\",\"b\",], }"),
    envelope("row_4", 200, """[{"k":1},{"k":2}]"""),
    envelope("row_5", 500, "ignored"),
    envelope("row_6", 200, "not json at all"),
    envelope("row_7", 200, "42"),
    envelope("row_8", 200, """["x", 7]"""),
    "",
    "not-even-json-line")

  private lazy val parsed =
    Parse.pipeline(fixtures.toDF("value")).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        r.getString(2)))
      .toSeq

  test("blank and malformed outer lines are skipped") {
    assert(!parsed.exists(_._1 == null))
    assert(parsed.count(_._1 == "row_5") == 0) // non-200 skipped too
  }
  test("clean JSON object -> one record") {
    val rs = parsed.filter(_._1 == "row_1")
    assert(rs.size == 1 && rs.head._3.contains("\"ticker\""))
  }
  test("fenced JSON is unfenced (```json hint line dropped)") {
    val rs = parsed.filter(_._1 == "row_2")
    assert(rs.size == 1 && rs.head._3 == "{\"ticker\":\"ACME\"}")
  }
  test("loose JSON is repaired (comments, +num, trailing commas, thousands)") {
    val rs = parsed.filter(_._1 == "row_3")
    assert(rs.size == 1)
    val df = Seq(rs.head._3).toDF("j")
    val row = df.select(
      get_json_object(col("j"), "$.vol").as("vol"),
      get_json_object(col("j"), "$.chg").as("chg")).collect()(0)
    assert(row.getString(0) == "1230456")
    assert(row.getString(1) == "0.5")
  }
  test("array answer -> one row per element with _source_list_index") {
    val rs = parsed.filter(_._1 == "row_4").sortBy(_._2)
    assert(rs.map(_._2) == Seq(0L, 1L))
    assert(rs.map(_._3) == Seq("""{"k":1}""", """{"k":2}"""))
  }
  test("unrecoverable content survives as raw_content (never lost)") {
    val rs = parsed.filter(_._1 == "row_6")
    assert(rs.size == 1 && rs.head._3 == """{"raw_content":"not json at all"}""")
  }
  test("scalar content wraps as typed raw_value (parse.py:203-208)") {
    val rs = parsed.filter(_._1 == "row_7")
    assert(rs.size == 1 && rs.head._3 == """{"raw_value":42}""")
  }
  test("primitive array elements wrap as raw_value, strings re-quoted") {
    val rs = parsed.filter(_._1 == "row_8").sortBy(_._2)
    assert(rs.map(_._3) == Seq("""{"raw_value":"x"}""", """{"raw_value":7}"""))
  }
  test("loosenJson never mutates quoted string values (colon-anchored)") {
    // trailing comma forces the loosen path; the quoted "1,234" and
    // the in-string "+5" and "//" must survive byte-for-byte
    val dirty = """{"price": "1,234", "note": "+5 // ok", "n": 2,}"""
    val got = Seq(dirty).toDF("v").select(Parse.loosenJson(col("v")))
      .as[String].collect()(0)
    assert(got == """{"price": "1,234", "note": "+5 // ok", "n": 2}""")
  }

  test("loosenJson leaves already-valid JSON intact") {
    val valid = """{"a":1,"b":[1,2],"c":"x, y"}"""
    val got = Seq(valid).toDF("v").select(Parse.loosenJson(col("v")))
      .as[String].collect()(0)
    assert(got == valid)
  }
  test("repairedJson falls back to NULL when truly unparseable") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.LongType)))
    val got = Seq("garbage {{{").toDF("v")
      .select(Parse.repairedJson(col("v"), schema).as("r")).collect()(0)
    assert(got.isNullAt(0))
  }
}
