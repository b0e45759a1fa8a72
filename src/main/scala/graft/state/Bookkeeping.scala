package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch-job bookkeeping as relational state (operators A3/X5 in
  * SURVEY.md §2.4/§2.8; reference: batch/main.py:283-312,342-365,446-523).
  *
  * The reference keeps a `batch_id → {status, model, record_count,
  * final_status?, output_file_id?, ...}` map in a JSON file plus a
  * DynamoDB table, updated with put/update-item upserts. Relationally
  * that state is a keyed table and the upsert is a full-outer
  * merge — `q_upsert_merge` in the oracle suite.
  */
object Bookkeeping {

  /** Keyed upsert: rows from `updates` override rows from `current` on
    * `keyCols`; non-key columns resolve new-over-old per column
    * (reference fallback merge `{**key, ...}` + put_item,
    * main.py:350-362). Both inputs must share a schema.
    *
    * Scale: a full-outer shuffle join on the key — with AQE this
    * becomes a broadcast join whenever the updates side is small
    * (the common case: one batch of updates vs. the full state table).
    */
  def upsertMerge(current: DataFrame, updates: DataFrame,
                  keyCols: Seq[String]): DataFrame = {
    val dataCols = current.columns.filterNot(keyCols.contains)
    val cur = current.select(current.columns.map(c =>
      if (keyCols.contains(c)) col(c) else col(c).as(s"__old_$c")): _*)
    val upd = updates.select(updates.columns.map(c =>
      if (keyCols.contains(c)) col(c) else col(c).as(s"__new_$c")): _*)
    cur.join(upd, keyCols, "full_outer")
      .select(keyCols.map(col) ++ dataCols.map(c =>
        coalesce(col(s"__new_$c"), col(s"__old_$c")).as(c)): _*)
  }

  /** A3: pending set = rows not yet terminal (main.py:454-462). */
  def pending(status: DataFrame, finalStatusCol: String = "final_status"): DataFrame =
    status.filter(col(finalStatusCol).isNull)

  /** Terminal-state predicate (status_checker.py:47-52). */
  val TerminalStates: Set[String] = Set("completed", "failed", "expired", "cancelled")

  def isTerminal(c: Column): Column = c.isin(TerminalStates.toSeq: _*)
}
