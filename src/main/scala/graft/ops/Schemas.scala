package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.StructField

/** The T1 case-insensitive field-resolution policy in ONE place
  * (reference: lowered key maps, dynamo_fetcher.py:96-99 /
  * jsonl_formatter.py:85). Every schema probe in the engine resolves
  * through here so the policy can't drift between operators — the
  * exact duplication accident SURVEY §4 catalogues in the reference.
  *
  * Policy: names compare lowercased; schemas with duplicate names
  * modulo case resolve LAST-wins (`toMap` keeps the final entry),
  * mirroring dict-update order in the reference.
  */
object Schemas {

  /** lowered name → actual column name. */
  def byLowerName(df: DataFrame): Map[String, String] =
    df.schema.fieldNames.map(n => n.toLowerCase -> n).toMap

  /** lowered name → full StructField (when the probe needs the type). */
  def fieldsByLowerName(df: DataFrame): Map[String, StructField] =
    df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
}
