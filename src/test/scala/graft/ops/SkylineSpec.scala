package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SkylineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(pts: Seq[(Long, Double)]): Set[(Long, Double)] = {
    val perX = pts.groupBy(_._1).map { case (x, g) => (x, g.map(_._2).max) }.toSeq
    perX.filter { case (x, y) =>
      !perX.exists { case (x2, y2) => x2 > x && y2 >= y }
    }.toSet
  }

  test("frontier equals brute-force dominance on a known set") {
    val pts = Seq[(Long, Double)](
      (1L, 5.0), (2L, 3.0), (3L, 7.0), (4L, 2.0), (5L, 6.0),
      (6L, 6.0), (7L, 1.0), (3L, 4.0)) // duplicate x with lower y
    val df = pts.toDF("x", "y")
    val got = Skyline.frontier(df, col("x"), col("y"), numRanges = 3)
      .as[(Long, Double)].collect().toSet
    assert(got == brute(pts))
    // the global max y always survives; later-x equal y dominates earlier
    assert(got.contains((7L, 1.0)) && got.contains((6L, 6.0)))
    assert(!got.contains((5L, 6.0)), "earlier x with equal y must be dominated")
  }

  test("partition-count invariance (prefix-max bases line up)") {
    val pts = (1L to 200L).map(x => (x, ((x * 37) % 101).toDouble))
    val df = pts.toDF("x", "y")
    val r1 = Skyline.frontier(df, col("x"), col("y"), numRanges = 1)
      .as[(Long, Double)].collect().toSet
    val r7 = Skyline.frontier(df, col("x"), col("y"), numRanges = 7)
      .as[(Long, Double)].collect().toSet
    assert(r1 == r7)
    assert(r1 == brute(pts))
  }

  test("single row and empty input degrade gracefully") {
    assert(Skyline.frontier(Seq((5L, 1.0)).toDF("x", "y"),
      col("x"), col("y")).count() == 1)
    assert(Skyline.frontier(Seq.empty[(Long, Double)].toDF("x", "y"),
      col("x"), col("y")).count() == 0)
  }
}
