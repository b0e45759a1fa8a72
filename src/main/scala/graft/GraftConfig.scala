package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper

/** Config-driven table-set resolution and per-table filter bypass —
  * the reference's front door (batch/main.py:652-679 `--table` →
  * `batch_config.json enabled_tables` → fallback;
  * batch/dynamo_fetcher.py:44-52 `_NO_TS_FILTER`).
  *
  * Config file shape:
  * `{"enabled_tables": ["t1","t2"], "no_ts_filter": ["static_dim"]}`.
  */
object GraftConfig {

  case class Config(enabledTables: Seq[String], noTsFilter: Set[String])

  val Empty: Config = Config(Nil, Set.empty)

  private val mapper = new ObjectMapper()

  def load(path: String): Config = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Empty
    try {
      val root = mapper.readTree(Files.readAllBytes(p))
      def strings(k: String): Seq[String] = Option(root.get(k)) match {
        case Some(n) if n.isArray => n.elements().asScala.map(_.asText).toSeq
        case _ => Nil
      }
      Config(strings("enabled_tables"), strings("no_ts_filter").toSet)
    } catch { case _: Exception => Empty }
  }

  /** Resolution chain (main.py:658-679): explicit flags (comma-split,
    * trimmed) take precedence; else the config file's `enabled_tables`;
    * else the fallback singleton.
    */
  def resolveTables(explicit: Seq[String], configPath: String,
                    fallback: String): Seq[String] = {
    val fromFlags = explicit.flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    if (fromFlags.nonEmpty) fromFlags
    else {
      val cfg = load(configPath).enabledTables.map(_.trim).filter(_.nonEmpty)
      if (cfg.nonEmpty) cfg else Seq(fallback)
    }
  }

  /** T5: tables exempt from the temporal cutoff + watermark (static
    * reference data / always-full-refresh tables).
    */
  def bypassTsFilter(configPath: String, table: String): Boolean =
    load(configPath).noTsFilter.contains(table)
}
