package graft.state

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

/** Durable batch-status store — the `batch_status.json` analog
  * (reference: batch/main.py:68,87-135 `_load_status`/`_save_status`,
  * entry shape main.py:283-293). This is what lets auto-resume survive
  * a process restart: every submitted batch is persisted with its
  * input/table provenance; finalization adds `final_status` /
  * `output_file_id` in place.
  *
  * File format: `{ "<batch_id>": {"created_utc":..., "status":...,
  * "model":..., "input_jsonl":..., "input_file_id":...,
  * "table_name":..., "record_count":N, ["final_status":...,
  * "output_file_id":..., "output_path":...]}, ... }` — the same keys
  * the reference writes, so an operator could eyeball either store
  * interchangeably. Writes are atomic (tmp + ATOMIC_MOVE, like
  * [[graft.ops.Watermark.save]]).
  */
object StatusStore {

  case class Entry(createdUtc: String, status: String, model: String,
                   inputJsonl: String, inputFileId: String, tableName: String,
                   recordCount: Long,
                   finalStatus: Option[String] = None,
                   outputFileId: Option[String] = None,
                   outputPath: Option[String] = None) {
    def isPending: Boolean = finalStatus.isEmpty
  }

  type Store = Map[String, Entry]

  private val mapper = new ObjectMapper()

  def load(path: String): Store = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Map.empty
    val root = mapper.readTree(Files.readAllBytes(p))
    if (root == null || !root.isObject) return Map.empty
    root.properties().asScala.map { e =>
      val v = e.getValue
      def str(k: String): String = Option(v.get(k)).map(_.asText).getOrElse("")
      def opt(k: String): Option[String] = Option(v.get(k)).map(_.asText)
      e.getKey -> Entry(
        createdUtc = str("created_utc"), status = str("status"),
        model = str("model"), inputJsonl = str("input_jsonl"),
        inputFileId = str("input_file_id"), tableName = str("table_name"),
        recordCount = Option(v.get("record_count")).map(_.asLong).getOrElse(0L),
        finalStatus = opt("final_status"), outputFileId = opt("output_file_id"),
        outputPath = opt("output_path"))
    }.toMap
  }

  def save(path: String, store: Store): Unit = {
    val root = mapper.createObjectNode()
    store.toSeq.sortBy(_._1).foreach { case (id, en) =>
      val o: ObjectNode = root.putObject(id)
      o.put("created_utc", en.createdUtc)
      o.put("status", en.status)
      o.put("model", en.model)
      o.put("input_jsonl", en.inputJsonl)
      o.put("input_file_id", en.inputFileId)
      o.put("table_name", en.tableName)
      o.put("record_count", en.recordCount)
      en.finalStatus.foreach(o.put("final_status", _))
      en.outputFileId.foreach(o.put("output_file_id", _))
      en.outputPath.foreach(o.put("output_path", _))
    }
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp,
      mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
        .getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
      Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Record a newly-submitted batch (upsert by id). */
  def record(path: String, batchId: String, entry: Entry): Unit =
    save(path, load(path) + (batchId -> entry))

  /** Pending = no final_status yet (main.py:459). */
  def pendingIds(store: Store): Seq[String] =
    store.collect { case (id, e) if e.isPending => id }.toSeq.sorted
}
