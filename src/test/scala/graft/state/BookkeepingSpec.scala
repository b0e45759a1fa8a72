package graft.state

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** A3/X5 (batch/main.py:283-365,446-523). */
class BookkeepingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val cur = Seq(
    ("b1", "validating", 10L), ("b2", "in_progress", 20L))
    .toDF("batch_id", "status", "record_count")

  test("upsert: update existing, insert new, keep untouched") {
    val upd = Seq(("b2", "completed", 20L), ("b3", "validating", 5L))
      .toDF("batch_id", "status", "record_count")
    val merged = Bookkeeping.upsertMerge(cur, upd, Seq("batch_id"))
      .orderBy("batch_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(merged == Seq(
      ("b1", "validating", 10L),
      ("b2", "completed", 20L),
      ("b3", "validating", 5L)))
  }
  test("per-column new-over-old coalesce (NULL update keeps old value)") {
    val upd = Seq(("b1", null.asInstanceOf[String], 99L))
      .toDF("batch_id", "status", "record_count")
    val r = Bookkeeping.upsertMerge(cur, upd, Seq("batch_id"))
      .filter(col("batch_id") === "b1").collect()(0)
    assert(r.getString(1) == "validating" && r.getLong(2) == 99L)
  }
  test("pending set = rows without final_status") {
    val st = Seq(("b1", "completed"), ("b2", null.asInstanceOf[String]))
      .toDF("batch_id", "final_status")
    assert(Bookkeeping.pending(st).select("batch_id").as[String]
      .collect().toSeq == Seq("b2"))
  }
  test("terminal-state predicate matches the reference set") {
    val df = Seq("completed", "failed", "expired", "cancelled", "in_progress")
      .toDF("s")
    assert(df.filter(Bookkeeping.isTerminal(col("s"))).count() == 4)
  }
}
