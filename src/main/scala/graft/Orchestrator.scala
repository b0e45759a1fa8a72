package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{BatchClient, BatchLifecycle}
import graft.ops.{Ingest, Parse, Payload, Watermark}

/** End-to-end pipeline composition (SURVEY.md §3.1 stages a–g;
  * reference: batch/main.py:147-365 `orchestrate` +
  * batch/agent_api.py:12-35 programmatic surface).
  *
  * Stages a–c are ONE lazy Spark plan ([[Ingest.run]]); everything
  * crossing a network boundary (upload, batch create, poll, download)
  * stays on the driver behind the injected [[BatchClient]] — never a
  * client call inside an operator (SURVEY §7; offline envs inject the
  * deterministic stub).
  */
object Orchestrator {

  case class BatchRecord(batchId: String, table: String, model: String,
                         inputFileId: String, recordCount: Long,
                         status: String, outputFileId: Option[String])

  /** One incremental ingest+submit round for a logical table.
    * Ordering contract (reference main.py:258-278): the watermark is
    * advanced and persisted BEFORE the external submit, so a submit
    * failure never causes resends.
    *
    * @return None when no new rows (reference "No new data – exiting").
    */
  def orchestrate(items: DataFrame, table: String, cutoffEpochSec: Long,
                  orderCol: Column, modelKey: String, workDir: String,
                  client: BatchClient, wait: Boolean = true,
                  pollEveryMs: Long = 60000,
                  sleep: Long => Unit = Thread.sleep): Option[BatchRecord] = {
    val storePath = s"$workDir/batch_watermark.json"
    val store = Watermark.load(storePath)

    val requests = Ingest.run(items, cutoffEpochSec, orderCol, modelKey,
      watermark = store.get(table)).cache()
    try {
      val n = requests.count()
      if (n == 0) return None

      // A1: advance watermark from the surviving rows' source ts —
      // requests no longer carry ts, so recompute max from the gated
      // source frame (same plan prefix, Catalyst dedups the scan).
      val tsMax = Watermark.advance(
        items.select(ops.Timestamps.flexTsEpoch(
          Ingest.coalesceTsCandidates(items)).as("__ts"))
          .filter(col("__ts").isNotNull && col("__ts") >= cutoffEpochSec)
          .filter(store.get(table).map(w => col("__ts") > w).getOrElse(lit(true))),
        col("__ts"))
      tsMax.foreach(m => Watermark.save(storePath, store + (table -> m)))

      // SNK1 → X1 → X2
      val jsonlPath = s"$workDir/requests_$table"
      Payload.writeJsonl(requests, jsonlPath)
      val fileId = client.uploadFile(jsonlPath)
      val batchId = client.createBatch(fileId)

      val initial = BatchRecord(batchId, table, Payload.resolveModel(modelKey),
        fileId, n, "submitted", None)
      if (!wait) Some(initial)
      else {
        val st = BatchLifecycle.pollUntilTerminal(client, batchId,
          pollEveryMs, sleep = sleep)
        Some(initial.copy(status = st.status, outputFileId = st.outputFileId))
      }
    } finally requests.unpersist()
  }

  /** Parse side (SURVEY §3.3): batch-output JSONL files/globs → flat
    * records with provenance.
    */
  def parseOutputs(spark: SparkSession, pathOrGlob: String): DataFrame =
    Parse.pipeline(spark.read.text(pathOrGlob))

  /** SNK2 (status_checker.py:69-94): download an output file's bytes
    * to `output/batch_output_<id>.jsonl`-style paths. Driver-side IO
    * around the pipeline, never inside an operator.
    */
  def downloadOutput(client: BatchClient, fileId: String, destPath: String): Long = {
    val bytes = client.download(fileId)
    val p = java.nio.file.Paths.get(destPath)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p, bytes)
    bytes.length.toLong
  }

  /** SNK3 (parse.py:278-285): parsed records aggregated to a single
    * JSON-lines file (one part, parents created by the committer).
    */
  def writeAggregated(parsed: DataFrame, path: String): Unit =
    parsed.coalesce(1).write.mode("overwrite").json(path)

  /** X4 single-pass auto-resume over a bookkeeping frame: one probe
    * per pending batch; running batches stay pending for the next
    * tick.
    */
  def autoResume(status: Seq[BatchRecord], client: BatchClient): Seq[BatchRecord] =
    status.map { r =>
      if (BatchLifecycle.Terminal(r.status)) r
      else {
        val st = client.status(r.batchId)
        if (BatchLifecycle.Terminal(st.status))
          r.copy(status = st.status, outputFileId = st.outputFileId)
        else r
      }
    }
}
