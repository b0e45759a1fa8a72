package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry >0 rows; every declared query runs at
  * sf0.001 and returns rows; oracle map stays in sync.
  */
class EntrySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("entry returns request records (>0 rows) with the contract shape") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSeq == Seq("custom_id", "method", "url", "body"))
    assert(df.count() > 0)
  }
  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }
  test("the rows-only set is exactly the declared irreducible pair") {
    // every other query MUST ship a DuckDB oracle — a new query landing
    // without one silently weakens the correctness gate, so this pins
    // the contract (SURVEY §2.9: HLL bias tables + layout-dependent
    // partition numbering are the only surfaces an engine-external
    // oracle cannot reproduce)
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q_approx_distinct", "q_payload_build_part"),
      s"unexpected rows-only queries: $rowsOnly")
  }
  test("all declared queries run and return rows at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          if (fn(spark, SparkTestSession.Sf).count() > 0) None else Some(s"$name: 0 rows")
        } catch { case e: Exception => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }
}
