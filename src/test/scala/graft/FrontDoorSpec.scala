package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{BatchClient, BatchStatus, StubBatchClient}
import graft.ops.{Payload, Watermark}
import graft.state.StatusStore

/** Reference front-door parity (VERDICT r1 item 7): config-driven
  * table resolution, T5 no-ts-filter bypass, durable status store +
  * restart-surviving auto-resume, one-call resume(batchId), model
  * catalog parity.
  */
class FrontDoorSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def items = Tables.events(spark, SparkTestSession.Sf).select(
    col("event_id").as("id"),
    col("ts").as("timestamp"),
    col("props").as("summary"))

  // ---- GraftConfig ------------------------------------------------------

  test("table resolution: explicit flags beat config beat fallback") {
    val dir = Files.createTempDirectory("cfg").toString
    val cfgPath = s"$dir/batch_config.json"
    Files.writeString(Paths.get(cfgPath),
      """{"enabled_tables": ["news", "trends"], "no_ts_filter": ["static_dim"]}""")
    assert(GraftConfig.resolveTables(Seq("a,b", " c "), cfgPath, "fb") ==
      Seq("a", "b", "c"))
    assert(GraftConfig.resolveTables(Nil, cfgPath, "fb") == Seq("news", "trends"))
    assert(GraftConfig.resolveTables(Nil, s"$dir/absent.json", "fb") == Seq("fb"))
    assert(GraftConfig.bypassTsFilter(cfgPath, "static_dim"))
    assert(!GraftConfig.bypassTsFilter(cfgPath, "news"))
  }

  test("malformed config falls back cleanly") {
    val dir = Files.createTempDirectory("cfgbad").toString
    val cfgPath = s"$dir/batch_config.json"
    Files.writeString(Paths.get(cfgPath), "{not json")
    assert(GraftConfig.resolveTables(Nil, cfgPath, "fb") == Seq("fb"))
  }

  // ---- T5 bypass --------------------------------------------------------

  test("bypass table skips cutoff and watermark; watermark not advanced") {
    val dir = Files.createTempDirectory("bypass").toString
    val c = new StubBatchClient
    val futureCutoff = 4102444800L // 2100-01-01: filters out EVERYTHING
    // with the filter: nothing survives the cutoff → None
    assert(Orchestrator.orchestrate(items, "events", futureCutoff,
      col("id"), "nano", dir, c, sleep = _ => ()).isEmpty)
    // bypassed: every usable row flows through, watermark untouched
    val rec = Orchestrator.orchestrate(items, "events", futureCutoff,
      col("id"), "nano", dir, c, sleep = _ => (), noTsFilter = true).get
    assert(rec.recordCount == 1000)
    assert(Watermark.load(s"$dir/batch_watermark.json").isEmpty)
  }

  test("bypass works for a table with no timestamp column at all") {
    val dir = Files.createTempDirectory("bypass2").toString
    val noTs = Tables.documents(spark, SparkTestSession.Sf).select(
      col("doc_id").as("id"), col("text").as("summary"))
    val rec = Orchestrator.orchestrate(noTs, "static_dim", 0L,
      col("id"), "nano", dir, new StubBatchClient, sleep = _ => (),
      noTsFilter = true).get
    assert(rec.recordCount > 0)
  }

  // ---- durable status store + restart auto-resume -----------------------

  /** Client whose status flips after construction — models a batch that
    * completes while the submitting process is dead.
    */
  private class RestartClient extends StubBatchClient {
    var terminal = false
    override def status(batchId: String): BatchStatus =
      if (terminal) BatchStatus(batchId, "completed", Some(s"out_$batchId"))
      else BatchStatus(batchId, "in_progress", None)
    override def download(fileId: String): Array[Byte] =
      s"""{"custom_id":"row_1"}""".getBytes("UTF-8")
  }

  test("status store survives restart; autoResumePending finalizes") {
    val dir = Files.createTempDirectory("resume").toString
    val c = new RestartClient
    val rec = Orchestrator.orchestrate(items, "events", 1704067200L,
      col("id"), "nano", dir, c, wait = false).get
    // durable entry exists and is pending
    val store0 = StatusStore.load(Orchestrator.statusPath(dir))
    assert(store0.contains(rec.batchId) && store0(rec.batchId).isPending)
    assert(store0(rec.batchId).tableName == "events")
    assert(store0(rec.batchId).recordCount == 1000)

    // "restart": a fresh client probing the durable store, batch still
    // running → untouched
    assert(Orchestrator.autoResumePending(dir, c).isEmpty)
    assert(StatusStore.load(Orchestrator.statusPath(dir))(rec.batchId).isPending)

    // batch completes while we're away → next tick downloads + finalizes
    c.terminal = true
    val done = Orchestrator.autoResumePending(dir, c)
    assert(done.map(_.batchId) == Seq(rec.batchId))
    assert(done.head.status == "completed")
    assert(done.head.outputPath.exists(p => Files.exists(Paths.get(p))))
    val fin = StatusStore.load(Orchestrator.statusPath(dir))(rec.batchId)
    assert(fin.finalStatus.contains("completed") && fin.outputFileId.isDefined)

    // idempotent: nothing pending on the following tick
    assert(Orchestrator.autoResumePending(dir, c).isEmpty)
  }

  test("resume(batchId) polls to terminal, downloads, finalizes store") {
    val dir = Files.createTempDirectory("resume2").toString
    val c = new RestartClient
    val rec = Orchestrator.orchestrate(items, "events", 1704067200L,
      col("id"), "nano", dir, c, wait = false).get
    c.terminal = true
    val res = Orchestrator.resume(rec.batchId, dir, c, sleep = _ => ())
    assert(res.status == "completed")
    assert(res.outputPath.exists(p => Files.exists(Paths.get(p))))
    val fin = StatusStore.load(Orchestrator.statusPath(dir))(rec.batchId)
    assert(fin.finalStatus.contains("completed"))
    assert(fin.outputPath == res.outputPath)
  }

  test("runTables: multi-table implicitly async, bypass set honored") {
    val dir = Files.createTempDirectory("multi").toString
    val c = new StubBatchClient
    val noTs = Tables.documents(spark, SparkTestSession.Sf).select(
      col("doc_id").as("id"), col("text").as("summary"))
    val recs = Orchestrator.runTables(
      Map("events" -> items, "static_dim" -> noTs),
      Seq("events", "static_dim"),
      cutoffEpochSec = 1704067200L, orderCol = col("id"), modelKey = "nano",
      workDir = dir, client = c, noTsFilterTables = Set("static_dim"))
    assert(recs.size == 2)
    // >1 table → async: records come back submitted, not completed
    assert(recs.forall(_.status == "submitted"))
    // both persisted durably
    assert(StatusStore.load(Orchestrator.statusPath(dir)).size == 2)
  }

  // ---- StatusStore ------------------------------------------------------

  test("status store round-trips all fields atomically") {
    val dir = Files.createTempDirectory("ss").toString
    val path = s"$dir/batch_status.json"
    val e = StatusStore.Entry("2026-01-01T00:00:00Z", "submitted", "m",
      "in.jsonl", "file_1", "news", 42L,
      finalStatus = Some("completed"), outputFileId = Some("out_1"),
      outputPath = Some("/tmp/o.jsonl"))
    StatusStore.save(path, Map("batch_1" -> e, "batch_2" -> e.copy(finalStatus = None)))
    val back = StatusStore.load(path)
    assert(back("batch_1") == e)
    assert(back("batch_2").isPending)
    assert(StatusStore.pendingIds(back) == Seq("batch_2"))
    assert(!Files.exists(Paths.get(path + ".tmp")))
  }

  test("status store load of absent/garbage file is empty") {
    val dir = Files.createTempDirectory("ss2").toString
    assert(StatusStore.load(s"$dir/nope.json").isEmpty)
    Files.writeString(Paths.get(s"$dir/arr.json"), "[1,2,3]")
    assert(StatusStore.load(s"$dir/arr.json").isEmpty)
  }

  // ---- model catalog parity ---------------------------------------------

  test("model catalog: 19 chat + 3 embedding, all resolve; unknown -> nano") {
    assert(Payload.ChatModels.size == 19)
    assert(Payload.EmbeddingModels.size == 3)
    (Payload.ChatModels ++ Payload.EmbeddingModels).foreach { id =>
      assert(Payload.resolveModel(id) == id)
    }
    assert(Payload.resolveModel("nano") == "gpt-4.1-nano-2025-04-14")
    assert(Payload.resolveModel("mini") == "gpt-4.1-mini-2025-04-14")
    assert(Payload.resolveModel("full") == "gpt-4.1-2025-04-14")
    assert(Payload.resolveModel("gpt-99-ultra") == "gpt-4.1-nano-2025-04-14")
    assert(Payload.listModels.contains("gpt-4-32k-0613"))
    assert(Payload.listModels.contains("text-embedding-ada-002"))
  }

  // ---- SRC2 facade ------------------------------------------------------

  test("catalog listing sees registered temp views") {
    items.createOrReplaceTempView("frontdoor_items")
    assert(Tables.listCatalogTables(spark).contains("frontdoor_items"))
  }
}
