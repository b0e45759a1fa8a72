package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed backward as-of join — each left row picks the latest right row
  * with `right.ts <= left.ts` within the same key (the time-series
  * "most recent fact as of this event" join; Spark has no built-in).
  *
  * Implementation is the union-and-window pattern, NOT a range join:
  * both sides are tagged and unioned, ONE shuffle partitions by the
  * join key, and a running `last(_, ignoreNulls)` over (ts, side)
  * carries the most recent right-side row forward into each left
  * row. Cost is one shuffle + one sort — no per-row range probe, no
  * broadcast requirement, skew bounded by the key's own cardinality.
  *
  * The right payload is carried as ONE struct, not per-column: a
  * per-column `last(ignoreNulls)` would assemble a frankenrow mixing
  * columns from different right rows whenever the latest match holds a
  * NULL in one payload column (an older row's non-null value survives
  * for that column only). A struct containing nulls is itself non-null,
  * so `last(struct, ignoreNulls)` takes all payload columns from the
  * same, latest, right row. Right rows tied on (key, ts) are broken by
  * the full payload struct, making the carried row deterministic.
  * This is the shape that survives 100 TB: a naive
  * `left.join(right, right.ts <= left.ts)` + groupBy-max is a range
  * join that degenerates to (near-)cross-product per key.
  *
  * Inclusive at equality: a right row with ts == left.ts matches
  * (right sorts before left at the same instant).
  */
object AsOfJoin {

  /** @param left      left frame; all its columns survive
    * @param right     right frame: key columns + `rightTs` + payload
    * @param keys      equi-join key column names (present both sides)
    * @param leftTs    left event-time column (numeric/comparable)
    * @param rightTs   right event-time column (same domain)
    * @param rightCols right payload column names to carry (must not
    *                  collide with left column names)
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: Column, rightTs: Column,
                   rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val rstructType = org.apache.spark.sql.types.StructType(
      rightCols.map(c => right.schema(c)))
    val l = left
      .withColumn("__ts", leftTs)
      .withColumn("__side", lit(1))
      .select((keys.map(col) ++ Seq(col("__ts"), col("__side")) ++
        leftCols.filterNot(keys.contains).map(col) :+
        lit(null).cast(rstructType).as("__r")): _*)
    val r = right
      .withColumn("__ts", rightTs)
      .withColumn("__side", lit(0))
      .select((keys.map(col) ++ Seq(col("__ts"), col("__side")) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc, col("__r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
    rightCols.foldLeft(carried) { (df, c) => df.withColumn(c, col("__r")(c)) }
      .filter(col("__side") === 1).drop("__ts", "__side", "__r")
  }
}
