package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multi-field text coalesce with type coercion (operator T3 in
  * SURVEY.md §2.2; reference: batch/dynamo_fetcher.py:87-168, duplicated
  * at batch/jsonl_formatter.py:84-150 — unified here once, per SURVEY §7).
  *
  * Semantics reproduced:
  *   - a fixed priority list of candidate column names, probed
  *     case-insensitively (the reference lower-cases every key:
  *     dynamo_fetcher.py:96-99);
  *   - strings are trimmed; empty-after-trim counts as absent;
  *   - numerics (int/float/decimal) are stringified;
  *   - nested list/dict values are serialized to compact JSON
  *     (dynamo_fetcher.py:159-167) → `to_json` here;
  *   - first non-empty candidate wins; no candidate → NULL (caller
  *     drops the row, matching the reference's "unusable item" skip).
  *
  * Spark-first design note: the reference resolves fields per ROW via a
  * lowered dict; a columnar engine resolves them once per PLAN against
  * the schema — same observable behavior, zero per-row cost.
  */
object TextExtract {

  /** Priority order from dynamo_fetcher.py:101-144 (34 entries). */
  val Candidates: Seq[String] = Seq(
    "summary", "text", "content", "review_summary", "review_text",
    "description", "body", "article", "title", "headline", "selftext",
    "query", "keyword", "term", "trend_name", "trend_breakdown",
    "company", "symbol", "percent_increase", "search_volume",
    "source_page", "started_time_ago", "avgvolume30", "bollingerlo",
    "bollingerup", "changepct", "changepctstr", "highprice", "lastprice",
    "lastpricetime", "lastupdated", "lastvolume", "lowprice", "prevclose",
    "rsi14", "sma20", "week52high", "week52low")

  /** One normalized-string Column per candidate present in df's schema,
    * in priority order; value-level coercion depends on the column type.
    */
  def candidateCols(df: DataFrame): Seq[Column] = {
    val byLower: Map[String, StructField] = Schemas.fieldsByLowerName(df)
    Candidates.flatMap(byLower.get).map { f =>
      val c = df.col(f.name)
      f.dataType match {
        case StringType =>
          val t = trim(c)
          when(t === "", lit(null: String)).otherwise(t)
        case _: NumericType => c.cast(StringType)
        case _: ArrayType | _: MapType | _: StructType => to_json(c)
        case BooleanType => c.cast(StringType)
        case _ => lit(null).cast(StringType)
      }
    }
  }

  /** df + `outCol` = first usable candidate (NULL when none). */
  def withText(df: DataFrame, outCol: String = "text_extracted"): DataFrame = {
    val cols = candidateCols(df)
    val value =
      if (cols.isEmpty) lit(null).cast(StringType) else coalesce(cols: _*)
    df.withColumn(outCol, value)
  }

  /** The usability gate: extract + drop rows with no text
    * (dynamo_fetcher.py:323-326 "skipping unusable item").
    */
  def usable(df: DataFrame, outCol: String = "text_extracted"): DataFrame =
    withText(df, outCol).filter(col(outCol).isNotNull)
}
