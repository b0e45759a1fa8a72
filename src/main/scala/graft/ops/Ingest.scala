package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The flagship ingest pipeline (SURVEY.md §3.1 stages a–c) as ONE lazy
  * plan: normalize ts → cutoff filter → extract text → usability gate →
  * first-wins dedup → payload projection. Mirrors the reference's
  * `fetch_recent` + `write_jsonl` composition
  * (batch/main.py:147-255) with stage boundaries replaced by a single
  * Catalyst plan (scan→filter→project pipelines inside one codegen
  * stage; the only wide op is the dedup shuffle + the numbering
  * window).
  */
object Ingest {

  /** @param orderCol stable total order standing in for the
    *                 reference's scan order (SURVEY §7 determinism
    *                 decision).
    */
  /** T6 (dynamo_fetcher.py:182-185): a non-positive look-back window
    * short-circuits to an empty relation without touching the source —
    * Catalyst prunes the scan entirely.
    */
  def runWindow(items: DataFrame, nowEpochSec: Long, hours: Double,
                orderCol: Column, modelKey: String = Payload.DefaultKey,
                watermark: Option[Long] = None): DataFrame =
    if (hours <= 0)
      run(items, Long.MaxValue, orderCol, modelKey, watermark)
        .limit(0)
    else
      run(items, nowEpochSec - (hours * 3600).toLong, orderCol, modelKey,
        watermark)

  def run(items: DataFrame, cutoffEpochSec: Long, orderCol: Column,
          modelKey: String = Payload.DefaultKey,
          watermark: Option[Long] = None): DataFrame = {
    val tsNorm = Timestamps.flexTsEpoch(coalesceTsCandidates(items))
    val recent = items
      .withColumn("__ts", tsNorm)
      .filter(col("__ts").isNotNull &&
        Timestamps.recentFilter(col("__ts"), cutoffEpochSec))
    val fresh = Watermark.filterNew(recent, col("__ts"), watermark)
    val usable = TextExtract.usable(fresh, "__text")
    val deduped = Dedup.dedupItems(usable, orderCol)
    Payload.requests(deduped, col("__text"),
      idColOf(deduped), orderCol, modelKey)
  }

  /** TIMESTAMP_KEYS candidate coalesce (dynamo_fetcher.py:65-84):
    * 14 case-insensitive names for the event-time column.
    */
  val TimestampKeys: Seq[String] = Seq(
    "timestamp", "ts", "time", "date", "datetime", "created", "created_at",
    "createdat", "published", "published_at", "publishedat", "pub_date",
    "est_timestamp")

  def coalesceTsCandidates(df: DataFrame): Column = {
    val byLower = df.schema.fieldNames.map(n => n.toLowerCase -> n).toMap
    val present = TimestampKeys.flatMap(byLower.get).map(col)
    if (present.isEmpty) lit(null).cast("string")
    else coalesce(present.map(_.cast("string")): _*)
  }

  private def idColOf(df: DataFrame): Option[Column] = {
    val byLower = df.schema.fieldNames.map(n => n.toLowerCase -> n).toMap
    Dedup.IdKeys.collectFirst {
      case k if byLower.contains(k) => col(byLower(k))
    }
  }
}
