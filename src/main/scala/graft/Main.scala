package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.llm.{BatchClient, StubBatchClient}
import graft.ops.{Dedup, Payload}

/** CLI front door — the reference's `argparse` surface
  * (batch/main.py:526-706) re-expressed over the Spark engine, so a
  * user porting a cron entry has a binary to call:
  *
  * {{{
  * graft.Main [--hours N] [--model KEY] [--table T]... [--resume ID]
  *            [--test] [--async] [--list-tables] [--list-models]
  *            [--check-outputs] [--api-key KEY]
  *            [--data-dir DIR] [--work-dir DIR] [--config PATH]
  * }}}
  *
  * Reference-parity flags: `--hours` look-back window (default 12,
  * main.py:528), `--model` logical key or concrete id validated
  * against the catalog like argparse `choices` (main.py:530-538),
  * `--table/-t` repeatable + comma-split (main.py:539-547,668-672),
  * `--resume` (main.py:548), `--test` stop after JSONL (main.py:549),
  * `--async` submit-and-exit with a preliminary auto-resume pass
  * (main.py:554-562,655-657), `--list-tables` (main.py:564-568),
  * `--list-models` (main.py:569-573), `--check-outputs` single
  * finalize pass for hourly cron (main.py:575-586), `--api-key` the
  * `--openai-key` analog (main.py:590-595; recorded for the client
  * wiring — the offline build injects [[StubBatchClient]]).
  *
  * Engine-side flags replace the reference's ambient AWS/env config:
  * `--data-dir` is where the parquet tables live (the DynamoDB
  * region analog), `--work-dir` holds watermark/status/JSONL state,
  * `--config` points at `batch_config.json` (enabled_tables +
  * no_ts_filter; main.py:663-679).
  *
  * Dispatch is argv-order-independent and mirrors the reference's
  * precedence exactly: check-outputs → list-tables → list-models →
  * resume → ingest loop; >1 table implicitly switches to async so a
  * cron window is never exceeded (main.py:684-693).
  *
  * Parsing and dispatch are separated ([[parse]] / [[run]]) and the
  * clock/client/printer are injected, so the spec drives every flag
  * end-to-end without a real session teardown or network.
  */
object Main {

  case class CliArgs(hours: Double = 12.0,
                     model: String = Payload.DefaultKey,
                     tables: Seq[String] = Nil,
                     resume: Option[String] = None,
                     test: Boolean = false,
                     async: Boolean = false,
                     listTables: Boolean = false,
                     listModels: Boolean = false,
                     checkOutputs: Boolean = false,
                     apiKey: Option[String] = None,
                     dataDir: String =
                       sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"),
                     workDir: String = "graft_work",
                     configPath: Option[String] = None) {
    def config: String = configPath.getOrElse(s"$workDir/batch_config.json")
  }

  val Usage: String =
    """usage: graft.Main [--hours N] [--model KEY] [--table NAME]... [--resume ID]
      |                  [--test] [--async] [--list-tables] [--list-models]
      |                  [--check-outputs] [--api-key KEY]
      |                  [--data-dir DIR] [--work-dir DIR] [--config PATH]""".stripMargin

  /** argparse analog: unknown flags, missing values, malformed
    * numbers, and out-of-catalog `--model` values are errors (Left),
    * like argparse's exit-2 behavior.
    */
  def parse(argv: Seq[String]): Either[String, CliArgs] = {
    val modelChoices = Payload.ModelMap.keySet ++ Payload.SupportedModels
    @annotation.tailrec
    def loop(rest: List[String], acc: CliArgs): Either[String, CliArgs] = rest match {
      case Nil => Right(acc)
      case "--hours" :: v :: t =>
        v.toDoubleOption match {
          case Some(h) => loop(t, acc.copy(hours = h))
          case None => Left(s"--hours: invalid number '$v'")
        }
      case "--model" :: v :: t =>
        if (modelChoices(v)) loop(t, acc.copy(model = v))
        else Left(s"--model: invalid choice '$v'")
      case ("--table" | "-t") :: v :: t =>
        loop(t, acc.copy(tables = acc.tables :+ v))
      case "--resume" :: v :: t => loop(t, acc.copy(resume = Some(v)))
      case "--test" :: t => loop(t, acc.copy(test = true))
      case "--async" :: t => loop(t, acc.copy(async = true))
      case "--list-tables" :: t => loop(t, acc.copy(listTables = true))
      case "--list-models" :: t => loop(t, acc.copy(listModels = true))
      case "--check-outputs" :: t => loop(t, acc.copy(checkOutputs = true))
      case "--api-key" :: v :: t => loop(t, acc.copy(apiKey = Some(v.trim)))
      case "--data-dir" :: v :: t => loop(t, acc.copy(dataDir = v))
      case "--work-dir" :: v :: t => loop(t, acc.copy(workDir = v))
      case "--config" :: v :: t => loop(t, acc.copy(configPath = Some(v)))
      case flag :: Nil if flag.startsWith("--") => Left(s"$flag: missing value")
      case other :: _ => Left(s"unrecognized argument: $other")
    }
    loop(argv.toList, CliArgs())
  }

  /** The reference's scan order is DynamoDB page order; ours is an
    * explicit stable order column — the table's id-ish column when one
    * exists ([[Dedup.IdKeys]] probe, case-insensitive), else its first
    * column.
    */
  private[graft] def orderColOf(df: DataFrame): Column =
    ops.Ingest.idColOf(df).getOrElse(col(df.schema.fieldNames.head))

  /** Left = human-readable load failure (missing table vs a REAL read
    * error — a corrupt footer or permission problem must not be
    * reported as "not found" to the cron operator).
    */
  private def loadTable(spark: SparkSession, dataDir: String,
                        name: String): Either[String, DataFrame] =
    try {
      Right(if (name == "events") Tables.events(spark, dataDir)
            else Tables.load(spark, dataDir, name))
    } catch {
      case e: org.apache.spark.sql.AnalysisException
          if e.getMessage.contains("PATH_NOT_FOUND") ||
             e.getMessage.contains("Path does not exist") =>
        Left(s"$name: table not found under $dataDir")
      case e: Exception =>
        Left(s"$name: failed to load (${e.getClass.getSimpleName}: ${e.getMessage})")
    }

  /** Flag dispatch. Returns a process exit code; `out` receives what
    * the reference prints to stdout.
    */
  def run(args: CliArgs, spark: SparkSession, client: BatchClient,
          nowEpochSec: Long, out: String => Unit,
          sleep: Long => Unit = Thread.sleep): Int = {
    // --check-outputs: single finalize pass, exit (main.py:616-621)
    if (args.checkOutputs) {
      val done = Orchestrator.autoResumePending(args.workDir, client)
      done.foreach(r => out(s"${r.batchId}\t${r.status}" +
        r.outputPath.map(p => s"\t$p").getOrElse("")))
      return 0
    }
    // --list-tables (main.py:623-634): the catalog listing over the
    // data dir's registered tables (the ListTables analog)
    if (args.listTables) {
      Tables.ensureViews(spark, args.dataDir)
      Tables.listCatalogTables(spark).foreach(out)
      return 0
    }
    // --list-models (main.py:635-649)
    if (args.listModels) {
      out(Payload.listModels)
      return 0
    }
    // --resume ID (main.py:651-652): poll one batch to terminal,
    // download, finalize the durable status entry
    args.resume match {
      case Some(id) =>
        val r = Orchestrator.resume(id, args.workDir, client, sleep = sleep)
        out(s"${r.batchId}\t${r.status}" +
          r.outputPath.map(p => s"\t$p").getOrElse(""))
        return if (BatchClientStatusOk(r.status)) 0 else 1
      case None => ()
    }
    // T6: a non-positive window is an empty run — exit without
    // touching any source (dynamo_fetcher.py:182-185)
    if (args.hours <= 0) {
      out("No new data - exiting")
      return 0
    }
    // async cron shape: finalize previous batches first (main.py:655-657)
    if (args.async) Orchestrator.autoResumePending(args.workDir, client)

    val tableNames = GraftConfig.resolveTables(args.tables, args.config,
      fallback = "events")
    // >1 table implicitly switches off waiting (main.py:684-693)
    val wait = !args.async && tableNames.size <= 1
    val cutoff = nowEpochSec - (args.hours * 3600).toLong
    var failures = 0
    tableNames.foreach { t =>
      loadTable(spark, args.dataDir, t) match {
        case Left(err) =>
          out(err)
          failures += 1
        case Right(df) =>
          Orchestrator.orchestrate(df, t, cutoff, orderColOf(df), args.model,
            args.workDir, client, wait = wait, sleep = sleep,
            noTsFilter = GraftConfig.bypassTsFilter(args.config, t),
            testOnly = args.test) match {
            case None => out(s"$t: no new data")
            case Some(rec) =>
              out(s"$t: ${rec.recordCount} records -> " +
                (if (args.test) "test_only (JSONL written, nothing submitted)"
                 else s"batch ${rec.batchId} ${rec.status}"))
          }
      }
    }
    if (failures == 0) 0 else 1
  }

  private val BatchClientStatusOk = Set("completed", "test_only", "submitted")

  def main(argv: Array[String]): Unit = parse(argv.toIndexedSeq) match {
    case Left(err) =>
      System.err.println(err)
      System.err.println(Usage)
      sys.exit(2)
    case Right(args) =>
      val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
      val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      // the offline build wires the deterministic stub; a production
      // deployment swaps in an HTTP BatchClient using args.apiKey
      val code = run(args, spark, new StubBatchClient,
        System.currentTimeMillis() / 1000L, println(_))
      spark.stop()
      sys.exit(code)
  }
}
