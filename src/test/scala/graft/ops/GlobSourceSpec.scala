package graft.ops

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Orchestrator, SparkTestSession}

/** SRC4: a directory argument expands recursively to all result files
  * under it (parse.py:230-241); malformed lines skip-and-warn (SRC3).
  */
class GlobSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def envelope(cid: String, content: String): String =
    s"""{"id":"req_$cid","custom_id":"$cid","response":{"status_code":200,""" +
      s""""body":{"choices":[{"message":{"role":"assistant","content":"$content"}}]}}}"""

  test("recursive glob unions nested result files; malformed lines drop") {
    val root = Files.createTempDirectory("glob_src").toString
    Files.createDirectories(Paths.get(s"$root/day1"))
    Files.createDirectories(Paths.get(s"$root/day2/part"))
    Files.writeString(Paths.get(s"$root/day1/out_a.jsonl"),
      envelope("row_1", """{\"k\": 1}""") + "\n" +
        "not json at all\n" +
        envelope("row_2", """{\"k\": 2}""") + "\n")
    Files.writeString(Paths.get(s"$root/day2/part/out_b.jsonl"),
      "\n" + envelope("row_3", """{\"k\": 3}""") + "\n")

    // a bare directory argument recurses (the reference's SRC4 shape;
    // note non-.jsonl files under it are ignored)
    Files.writeString(Paths.get(s"$root/day1/ignore.txt"), "not a result file\n")
    val parsed = Orchestrator.parseOutputs(spark, root)
    val rows = parsed.select(col("_source_custom_id")).collect().map(_.getString(0))
    // 3 valid envelopes across both nested dirs; blank + malformed dropped
    assert(rows.sorted.toSeq == Seq("row_1", "row_2", "row_3"))
  }

  test("a single-file path parses the same as a glob hit") {
    val root = Files.createTempDirectory("glob_one").toString
    Files.writeString(Paths.get(s"$root/only.jsonl"),
      envelope("row_9", """{\"k\": 9}""") + "\n")
    val one = Orchestrator.parseOutputs(spark, s"$root/only.jsonl")
    assert(one.count() == 1)
  }
}
