package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Salted skew join: identical result set to the plain join, hot key
  * spread across multiple salt values.
  */
class SaltingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // one celebrity key (1) with 1000 rows, plus a cold tail
  private lazy val fact = (1 to 1000).map(i => (i.toLong, 1L)) ++
    (1 to 50).map(i => (10000L + i, (i % 5 + 2).toLong))
  private lazy val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"),
    (5L, "d"), (6L, "e"), (99L, "unmatched"))

  test("salted join result equals plain join") {
    val f = fact.toDF("row_id", "k")
    val d = dim.toDF("k", "name")
    val salted = Salting.skewJoin(f, d, "k", salts = 8, saltCols = Seq(col("row_id")))
      .select("row_id", "k", "name").collect().toSet
    val plain = f.join(d, "k").select("row_id", "k", "name").collect().toSet
    assert(salted == plain)
    assert(salted.size == 1050)
  }

  test("hot key spreads over multiple salts") {
    val f = fact.toDF("row_id", "k")
    val spread = f.filter(col("k") === 1)
      .select(pmod(hash(col("row_id")), lit(8)).as("salt"))
      .distinct().count()
    assert(spread >= 6, s"only $spread salt values for the hot key")
  }

  test("salts=1 degenerates to the plain join") {
    val f = fact.toDF("row_id", "k")
    val d = dim.toDF("k", "name")
    val salted = Salting.skewJoin(f, d, "k", salts = 1, saltCols = Seq(col("row_id")))
    assert(salted.count() == f.join(d, "k").count())
  }
}
