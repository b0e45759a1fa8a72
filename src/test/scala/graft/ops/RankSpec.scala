package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class RankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("valueRanks matches SQL rank() semantics with duplicates") {
    // values: 1,1,2,5,5,5,9 -> ranks 1,1,3,4,4,4,7
    val df = Seq(1.0, 1.0, 2.0, 5.0, 5.0, 5.0, 9.0).toDF("x")
    val got = Rank.valueRanks(df, col("x"), k = 8, numRanges = 3)
      .select("v", "cnt", "rnk").as[(Double, Long, Long)]
      .collect().sortBy(_._1)
    assert(got.toSeq == Seq((1.0, 2L, 1L), (2.0, 1L, 3L),
      (5.0, 3L, 4L), (9.0, 1L, 7L)))
  }

  test("equi-depth buckets are depth-balanced and partition-invariant") {
    val df = (1 to 64).map(_.toDouble).toDF("x")
    val r1 = Rank.valueRanks(df, col("x"), k = 8, numRanges = 1)
      .select("v", "bucket").as[(Double, Long)].collect().toMap
    val r5 = Rank.valueRanks(df, col("x"), k = 8, numRanges = 5)
      .select("v", "bucket").as[(Double, Long)].collect().toMap
    assert(r1 == r5)
    // 64 distinct ranks / 8 buckets = exactly 8 values per bucket
    assert(r1.groupBy(_._2).values.map(_.size).toSet == Set(8))
    assert(r1(1.0) == 1L && r1(64.0) == 8L)
  }

  test("all multiplicity in one value still ranks from 1") {
    val df = Seq.fill(10)(3.0).toDF("x")
    val got = Rank.valueRanks(df, col("x"), k = 4)
      .as[(Double, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((3.0, 10L, 1L, 1L)))
  }
}
