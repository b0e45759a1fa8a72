package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered funnel analysis — for each user, the first time they
  * completed stage 1, stage 2 AFTER stage 1, stage 3 AFTER that
  * stage 2, ... The ORDER constraint is what makes this harder than
  * three independent mins: a purchase before any view must not count.
  *
  * Scale shape: ONE hash shuffle on the user. Stage qualification is
  * a chain of running-min windows over that single partitioning — the
  * running min of qualified stage-k times is non-null exactly when
  * some earlier (or same-instant, ordered-before) stage-k event was
  * itself qualified, so a stage-(k+1) event qualifies iff that
  * running min is non-null (its own time is >= the running min by the
  * window order). No self-joins, no per-user collect, state is O(1)
  * per row in codegen'd window aggregates.
  */
object Funnel {

  /** Per-user funnel completion: `(user, stage1_t, stage2_t, ...,
    * stage_reached)` where `stageK_t` is the first instant the user
    * reached stage K respecting order (null if never) and
    * `stage_reached` counts completed stages. `stages` are matched
    * against `typeCol` in funnel order. Ties at one instant resolve
    * by `tieBreak` — an earlier-ordered stage event at the same
    * instant satisfies a later one.
    */
  def firstCompletion(events: DataFrame, userCol: Column, typeCol: Column,
                      tsCol: Column, tieBreak: Column,
                      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "at least one funnel stage")
    require(stages.distinct.size == stages.size,
      "stages must be distinct: a repeated name would let an event " +
        "satisfy its own prerequisite via the running min")
    val run = Window.partitionBy(col("u")).orderBy(col("t"), col("o"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = events.select(userCol.as("u"), typeCol.as("et"),
      tsCol.as("t"), tieBreak.as("o"))
    // qual(k) = this row is a stage-k event whose prerequisite chain
    // is satisfied at this point of the user's ordered stream
    val qualified = stages.zipWithIndex.foldLeft(base) {
      case (df, (stage, i)) =>
        val prereqOk =
          if (i == 0) lit(true)
          else min(col(s"q${i - 1}")).over(run).isNotNull
        df.withColumn(s"q$i",
          when(col("et") === stage && prereqOk, col("t")))
    }
    val aggs = stages.indices.map(i =>
      min(col(s"q$i")).as(s"stage${i + 1}_t"))
    // ascending fold nests the HIGHEST stage outermost:
    // when(s3,3) else when(s2,2) else when(s1,1) else 0
    val reached = stages.indices
      .foldLeft(lit(0L)) { (acc, i) =>
        when(col(s"stage${i + 1}_t").isNotNull, lit((i + 1).toLong))
          .otherwise(acc)
      }
    qualified.groupBy(col("u"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("stage_reached", reached)
  }
}
