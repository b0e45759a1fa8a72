package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.{BatchStatus, StubBatchClient}
import graft.state.StatusStore

/** CLI front door end-to-end (VERDICT r3 item 4): every reference flag
  * (main.py:526-706) driven through parse + run with the stub client —
  * multi-table forces async, `--test` writes under jsonl_test/ and
  * touches nothing external, `--resume` finalizes the durable status
  * entry.
  */
class MainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val now = 1704067200L // 2024-01-01T00:00:00Z

  /** Counts external interactions so `--test` can assert zero. */
  private class SpyClient extends StubBatchClient {
    var uploads = 0
    var creates = 0
    override def uploadFile(path: String): String = { uploads += 1; super.uploadFile(path) }
    override def createBatch(id: String, ep: String, w: String): String = {
      creates += 1; super.createBatch(id, ep, w)
    }
  }

  /** A data dir whose tables both carry a text candidate: two copies
    * of `documents` under different names (documents has `text` but no
    * timestamp column — the no_ts_filter config path, like the
    * reference's static GoogleTrendsHistorical).
    */
  private lazy val dataDir: String = {
    val dir = Files.createTempDirectory("maindata").toString
    val docs = Tables.documents(spark, SparkTestSession.Sf).limit(50)
    docs.write.mode("overwrite").parquet(s"$dir/news.parquet")
    docs.write.mode("overwrite").parquet(s"$dir/trends.parquet")
    dir
  }

  private def work(): String = Files.createTempDirectory("mainwork").toString

  private def cfg(dir: String, json: String): String = {
    val p = s"$dir/batch_config.json"
    Files.writeString(Paths.get(p), json)
    p
  }

  private def runMain(args: Main.CliArgs, client: StubBatchClient = new StubBatchClient)
      : (Int, Seq[String]) = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val code = Main.run(args, spark, client, now, lines += _, sleep = _ => ())
    (code, lines.toSeq)
  }

  // ---- parse ------------------------------------------------------------

  test("parse: defaults match the reference's argparse defaults") {
    val a = Main.parse(Nil).toOption.get
    assert(a.hours == 12.0 && a.model == "nano" && a.tables.isEmpty &&
      !a.test && !a.async && a.resume.isEmpty)
  }

  test("parse: every flag round-trips; -t repeats accumulate") {
    val a = Main.parse(Seq("--hours", "48", "--model", "full",
      "-t", "a,b", "--table", "c", "--test", "--async",
      "--api-key", " k1 ", "--data-dir", "/d", "--work-dir", "/w",
      "--config", "/c.json")).toOption.get
    assert(a.hours == 48.0 && a.model == "full")
    assert(a.tables == Seq("a,b", "c")) // comma-split happens in resolveTables
    assert(a.test && a.async && a.apiKey.contains("k1"))
    assert(a.dataDir == "/d" && a.workDir == "/w" && a.config == "/c.json")
  }

  test("parse: argparse-style errors") {
    assert(Main.parse(Seq("--frobnicate")).isLeft)
    assert(Main.parse(Seq("--hours", "soon")).isLeft)
    assert(Main.parse(Seq("--model", "gpt-99-ultra")).isLeft) // not in choices
    assert(Main.parse(Seq("--table")).isLeft) // missing value
    // concrete catalog ids ARE valid choices (main.py:530-538)
    assert(Main.parse(Seq("--model", "gpt-4o")).toOption.get.model == "gpt-4o")
    assert(Main.parse(Seq("--model", "text-embedding-3-small")).isRight)
  }

  // ---- informational modes ----------------------------------------------

  test("--list-models prints the full catalog and exits 0") {
    val (code, out) = runMain(Main.CliArgs(listModels = true))
    assert(code == 0)
    val s = out.mkString("\n")
    assert(s.contains("gpt-4.1-nano-2025-04-14") && s.contains("text-embedding-ada-002"))
  }

  test("--list-tables lists the data dir's tables and exits 0") {
    val (code, out) = runMain(Main.CliArgs(listTables = true,
      dataDir = SparkTestSession.Sf))
    assert(code == 0)
    assert(Tables.All.forall(out.contains))
  }

  // ---- ingest loop ------------------------------------------------------

  test("--test writes JSONL under jsonl_test/ and contacts nothing external") {
    val w = work()
    cfg(w, """{"enabled_tables": ["news"], "no_ts_filter": ["news"]}""")
    val spy = new SpyClient
    val (code, out) = runMain(Main.CliArgs(test = true, dataDir = dataDir,
      workDir = w), spy)
    assert(code == 0)
    assert(out.exists(_.contains("test_only")))
    // dry-run isolation: output under jsonl_test/, nothing submitted,
    // no watermark advanced, no status entry
    assert(Files.isDirectory(Paths.get(s"$w/jsonl_test/requests_news")))
    assert(spark.read.text(s"$w/jsonl_test/requests_news").count() == 50)
    assert(spy.uploads == 0 && spy.creates == 0)
    assert(StatusStore.load(Orchestrator.statusPath(w)).isEmpty)
  }

  test("multi-table run implicitly forces async (records stay pending)") {
    val w = work()
    cfg(w, """{"no_ts_filter": ["news", "trends"]}""")
    val spy = new SpyClient
    val (code, out) = runMain(Main.CliArgs(tables = Seq("news,trends"),
      dataDir = dataDir, workDir = w), spy)
    assert(code == 0)
    assert(spy.creates == 2)
    // async: submitted, never polled to terminal — the durable store
    // holds two PENDING entries for a later --check-outputs tick
    assert(out.count(_.contains("submitted")) == 2)
    val store = StatusStore.load(Orchestrator.statusPath(w))
    assert(store.size == 2 && store.values.forall(_.isPending))
    assert(store.values.map(_.tableName).toSet == Set("news", "trends"))
  }

  test("single table without --async waits to terminal") {
    val w = work()
    cfg(w, """{"enabled_tables": ["news"], "no_ts_filter": ["news"]}""")
    val (code, out) = runMain(Main.CliArgs(dataDir = dataDir, workDir = w))
    assert(code == 0)
    assert(out.exists(_.contains("completed")))
  }

  test("--resume finalizes the durable status entry") {
    val w = work()
    cfg(w, """{"no_ts_filter": ["news"]}""")
    // seed a pending batch via an async run against a never-completing client
    val pendingClient = new StubBatchClient {
      var terminal = false
      override def status(batchId: String): BatchStatus =
        if (terminal) BatchStatus(batchId, "completed", Some(s"out_$batchId"))
        else BatchStatus(batchId, "in_progress", None)
      override def download(fileId: String): Array[Byte] =
        """{"custom_id":"row_1"}""".getBytes("UTF-8")
    }
    runMain(Main.CliArgs(tables = Seq("news"), async = true,
      dataDir = dataDir, workDir = w), pendingClient)
    val store0 = StatusStore.load(Orchestrator.statusPath(w))
    val id = store0.keys.head
    assert(store0(id).isPending)

    pendingClient.terminal = true
    val (code, out) = runMain(Main.CliArgs(resume = Some(id),
      dataDir = dataDir, workDir = w), pendingClient)
    assert(code == 0)
    assert(out.exists(l => l.contains(id) && l.contains("completed")))
    val fin = StatusStore.load(Orchestrator.statusPath(w))(id)
    assert(fin.finalStatus.contains("completed"))
    assert(fin.outputPath.exists(p => Files.exists(Paths.get(p))))
  }

  test("--check-outputs finalizes pending batches and exits 0") {
    val w = work()
    cfg(w, """{"no_ts_filter": ["news"]}""")
    val flipClient = new StubBatchClient {
      var terminal = false
      override def status(batchId: String): BatchStatus =
        if (terminal) BatchStatus(batchId, "completed", Some(s"out_$batchId"))
        else BatchStatus(batchId, "in_progress", None)
      override def download(fileId: String): Array[Byte] = Array.emptyByteArray
    }
    runMain(Main.CliArgs(tables = Seq("news"), async = true,
      dataDir = dataDir, workDir = w), flipClient)
    flipClient.terminal = true
    val (code, out) = runMain(Main.CliArgs(checkOutputs = true, workDir = w),
      flipClient)
    assert(code == 0)
    assert(out.size == 1 && out.head.contains("completed"))
    assert(StatusStore.load(Orchestrator.statusPath(w)).values
      .forall(!_.isPending))
  }

  test("hours <= 0 short-circuits without touching any source") {
    val spy = new SpyClient
    val (code, out) = runMain(Main.CliArgs(hours = 0,
      dataDir = "/nonexistent", workDir = work()), spy)
    assert(code == 0)
    assert(out == Seq("No new data - exiting"))
    assert(spy.uploads == 0 && spy.creates == 0)
  }

  test("missing table reports failure exit code") {
    val w = work()
    val (code, out) = runMain(Main.CliArgs(tables = Seq("nope"),
      dataDir = dataDir, workDir = w))
    assert(code == 1)
    assert(out.exists(_.contains("not found")))
  }
}
