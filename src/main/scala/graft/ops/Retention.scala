package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention — the canonical behavioral-analytics matrix:
  * users grouped by their FIRST-ACTIVE period (the cohort), tracked by
  * how many are still active N periods later. Every analytics
  * consumer of an event store asks this; it's also the shape
  * training-data pipelines use for "how much of source S's day-0
  * content is still contributing at day N".
  *
  * Scale shape: two hash aggregations and one equi-join, all keyed on
  * the user — the cohort assignment (groupBy user, min day) and the
  * distinct activity set (groupBy user+day) co-partition on the same
  * key, so the join between them reuses the exchange; only the final
  * (cohort, offset) count-distinct re-shuffles, and its key space is
  * periods², tiny. All arithmetic is exact integer day math.
  */
object Retention {

  /** `(cohort_day, day_offset, n_users)` — users first active on
    * `cohort_day` who were active again `day_offset` days later
    * (offset 0 = the cohort size itself). `dayCol` is an integer
    * day index (e.g. epoch_seconds / 86400).
    */
  def cohortMatrix(events: DataFrame, userCol: Column,
                   dayCol: Column): DataFrame = {
    val activity = events.select(userCol.as("u"), dayCol.as("day")).distinct()
    val cohorts = activity.groupBy(col("u"))
      .agg(min(col("day")).as("cohort_day"))
    activity.join(cohorts, Seq("u"))
      .groupBy(col("cohort_day"),
        (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("u")).as("n_users"))
  }
}
