package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.StubBatchClient
import graft.ops.Watermark

/** SURVEY §3.1 end-to-end: ingest → watermark-advance-before-submit →
  * JSONL → upload → batch → poll → terminal record; incremental rerun
  * sees nothing.
  */
class OrchestratorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def items = Tables.events(spark, SparkTestSession.Sf).select(
    col("event_id").as("id"),
    col("ts").as("timestamp"),
    col("props").as("summary"))

  test("full round: submit, poll to terminal, bookkeeping record") {
    val dir = Files.createTempDirectory("orch").toString
    val rec = Orchestrator.orchestrate(items, "events", 1704067200L,
      col("id"), "nano", dir, new StubBatchClient, sleep = _ => ()).get
    assert(rec.recordCount == 1000)
    assert(rec.status == "completed" && rec.outputFileId.isDefined)
    assert(rec.model == "gpt-4.1-nano-2025-04-14")
    // watermark was persisted
    val wm = Watermark.load(s"$dir/batch_watermark.json")
    assert(wm.get("events").exists(_ > 1704067200L))
    // JSONL landed with one line per record
    assert(spark.read.text(s"$dir/requests_events").count() == 1000)
  }

  test("incremental rerun with advanced watermark returns None") {
    val dir = Files.createTempDirectory("orch2").toString
    val c = new StubBatchClient
    assert(Orchestrator.orchestrate(items, "events", 1704067200L,
      col("id"), "nano", dir, c, sleep = _ => ()).isDefined)
    assert(Orchestrator.orchestrate(items, "events", 1704067200L,
      col("id"), "nano", dir, c, sleep = _ => ()).isEmpty)
  }

  test("async mode returns submitted; autoResume completes it") {
    val dir = Files.createTempDirectory("orch3").toString
    val c = new StubBatchClient
    val rec = Orchestrator.orchestrate(items, "events", 1704067200L,
      col("id"), "nano", dir, c, wait = false).get
    assert(rec.status == "submitted" && rec.outputFileId.isEmpty)
    val resumed = Orchestrator.autoResume(Seq(rec), c)
    assert(resumed.head.status == "completed")
    assert(resumed.head.outputFileId.isDefined)
  }

  test("parse side reads a glob of JSONL files") {
    val dir = Files.createTempDirectory("parse").toString
    val line = """{"id":"r","custom_id":"row_1","response":{"status_code":200,""" +
      """"body":{"choices":[{"message":{"role":"assistant","content":"{\"a\":1}"}}]}}}"""
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.jsonl"), line + "\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/b.jsonl"), line + "\n")
    val out = Orchestrator.parseOutputs(spark, s"$dir/*.jsonl")
    assert(out.count() == 2)
    assert(out.select("_source_custom_id").distinct().collect()(0).getString(0) == "row_1")
  }
}
