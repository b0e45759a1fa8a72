package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-Changing-Dimension Type-2 history build (Kimball's
  * dimensional-modeling pattern): collapse an event stream's
  * per-key attribute observations into VERSIONED VALIDITY INTERVALS —
  * one row per consecutive run of the same attribute value, carrying
  * `[valid_from, valid_to)` and an `is_current` flag. This is the
  * warehouse-side complement of the row-upsert merge
  * ([[graft.state.Bookkeeping]]): upsert keeps the latest state,
  * SCD2 keeps the full history a training-data pipeline needs to
  * reconstruct "what did this dimension look like at time T"
  * (point-in-time joins against [[AsOfJoin]] consume exactly this
  * shape).
  *
  * Scale shape: ONE hash shuffle on the key; every step after it —
  * change detection (lag), version numbering (running sum), run-start
  * filter, interval close (lead) — is a window over that same
  * partitioning, so Catalyst plans a single Exchange with in-partition
  * sorts. No groupBy materializes runs; the run-START row carries the
  * version, which bounds state at one row per output interval.
  */
object Scd2 {

  /** Versioned history: `(key, attr, version, valid_from, valid_to,
    * is_current)` — `version` is 1-based per key in (ts, tieBreak)
    * order, `valid_to` is the next version's `valid_from` (null for
    * the open current version). A run is maximal: consecutive equal
    * `attr` observations (null-safe comparison) collapse into one
    * interval. `tieBreak` must be non-null and unique per key to make
    * the ordering total.
    */
  def history(events: DataFrame, keyCol: Column, attrCol: Column,
              tsCol: Column, tieBreak: Column): DataFrame = {
    val byTime = Window.partitionBy(col("key")).orderBy(col("t"), col("o"))
    val byVersion = Window.partitionBy(col("key")).orderBy(col("version"))
    events
      .select(keyCol.as("key"), attrCol.as("attr"), tsCol.as("t"),
        tieBreak.as("o"))
      // first row per key opens a run; later rows open one iff the
      // attr differs (null-safely) from the previous observation
      .withColumn("chg",
        when(lag(col("o"), 1).over(byTime).isNull, 1L)
          .otherwise(when(!(col("attr") <=> lag(col("attr"), 1).over(byTime)),
            1L).otherwise(0L)))
      .withColumn("version", sum(col("chg")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("chg") === 1L)
      .withColumn("valid_to", lead(col("t"), 1).over(byVersion))
      .select(col("key"), col("attr"), col("version"),
        col("t").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** The current snapshot — one row per key (the open interval),
    * exactly what a latest-state consumer reads without replaying
    * history.
    */
  def current(events: DataFrame, keyCol: Column, attrCol: Column,
              tsCol: Column, tieBreak: Column): DataFrame =
    history(events, keyCol, attrCol, tsCol, tieBreak)
      .filter(col("is_current"))
      .select(col("key"), col("attr"), col("version"),
        col("valid_from"))
}
