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
