package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.ops.Parse

/** Streaming twin of the parse pipeline (SURVEY §3.3): the same P1–P6
  * transforms over a text file stream, with re-delivered output files
  * deduplicated by `dropDuplicatesWithinWatermark`. The gate is ROW
  * PARITY: the stream over a directory containing a duplicated file
  * must emit exactly the batch pipeline's rows over the unique lines.
  */
class StreamingParseSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def envelope(customId: String, status: Int, content: String): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n") + "\""
    s"""{"id":"x","custom_id":"$customId","response":{"status_code":$status,""" +
      s""""body":{"choices":[{"message":{"role":"assistant","content":${q(content)}}}]}}}"""
  }

  // the FIXTURES.md §B3 shapes: clean, fenced, loose, array (multi-row),
  // non-200 (dropped), unrecoverable (raw_content), scalar (raw_value)
  private val lines = Seq(
    envelope("row_1", 200, """{"ticker":"ACME","signal":"buy"}"""),
    envelope("row_2", 200, "```json\n{\"ticker\":\"ACME\"}\n```"),
    envelope("row_3", 200,
      "{\"vol\": 1,230,456, \"chg\": +0.5, // comment\n \"tags\": [\"a\",\"b\",], }"),
    envelope("row_4", 200, """[{"k":1},{"k":2}]"""),
    envelope("row_5", 500, "ignored"),
    envelope("row_6", 200, "not json at all"),
    envelope("row_7", 200, "42"))

  test("file-stream parse with re-delivered file matches batch over unique lines") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("parse_stream").toString
    // file 1: the full corpus; file 2: a re-delivered duplicate slice
    // (the reference's retry/re-list case) — the stream must not emit
    // its records twice
    Files.write(java.nio.file.Paths.get(s"$srcDir/out_1.jsonl"),
      lines.mkString("\n").getBytes)
    Files.write(java.nio.file.Paths.get(s"$srcDir/out_2.jsonl"),
      lines.take(4).mkString("\n").getBytes)

    val stream = spark.readStream
      .option("maxFilesPerTrigger", "1") // force two micro-batches
      .text(srcDir)
    val got = StreamingIngest.runToMemory(spark,
      StreamingIngest.parsedStream(stream), "parsed_stream")
      .collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
      .toSet

    val expected = Parse.pipeline(lines.toDF("value")).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
      .toSet

    assert(got == expected, "stream/batch row sets diverged")
    // the duplicated file added no extra rows
    assert(got.size == expected.size)
    // multi-row array answer survived with both indices
    assert(got.count(_._1 == "row_4") == 2)
  }
}
