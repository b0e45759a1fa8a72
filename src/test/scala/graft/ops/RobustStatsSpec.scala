package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Robust per-group stats: z-score outliers and discrete winsorization. */
class RobustStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("zOutliers flags the planted spike and nothing else") {
    // group g: nine 10.0s and one 100.0 -> only the spike clears |z| > 2
    val rows = (1L to 9L).map(i => (i, "g", 10.0)) :+ ((10L, "g", 100.0))
    val df = rows.toDF("id", "grp", "value")
    val out = RobustStats.zOutliers(df, col("grp"), col("value"), col("id"))
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(10L))
    assert(out.head.getDouble(3) > 2.0)
  }

  test("constant-value group has sigma 0 and flags nothing") {
    val df = (1L to 5L).map(i => (i, "c", 7.0)).toDF("id", "grp", "value")
    assert(RobustStats.zOutliers(df, col("grp"), col("value"), col("id"))
      .count() == 0L)
  }

  test("non-representable constant group (fp variance < 0) flags nothing") {
    // 17 rows of 140.70: s2/n - mean^2 lands a few ulps NEGATIVE in
    // doubles; without the variance clamp sigma = sqrt(-3.6e-12) = NaN
    // and Spark's NaN-greater-than-all ordering flags EVERY row
    val df = (1L to 17L).map(i => (i, "c", 140.70)).toDF("id", "grp", "value")
    assert(RobustStats.zOutliers(df, col("grp"), col("value"), col("id"))
      .count() == 0L)
  }

  test("winsorize picks present values at the exact ceil positions") {
    // n = 20, values 1..20: lo pos = ceil(0.05*20) = 1 -> 1.0,
    // hi pos = ceil(0.95*20) = 19 -> 19.0; 20.0 clips to 19.0
    val df = (1L to 20L).map(i => (i, "g", i.toDouble)).toDF("id", "grp", "value")
    val r = RobustStats.winsorize(df, col("grp"), col("value"), col("id"))
      .collect().head
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 19.0)
    assert(r.getLong(3) == 20L)
    assert(r.getLong(4) == 1L) // only the 20.0 moved
    // sum = 1..19 + 19 (clipped 20) = 190 + 19
    assert(r.getDouble(5) == 209.0)
  }

  test("winsorize of a single-row group returns that value unclipped") {
    val df = Seq((1L, "g", 42.5)).toDF("id", "grp", "value")
    val r = RobustStats.winsorize(df, col("grp"), col("value"), col("id"))
      .collect().head
    assert(r.getDouble(1) == 42.5 && r.getDouble(2) == 42.5)
    assert(r.getLong(4) == 0L && r.getDouble(5) == 42.5)
  }

  test("tied values: percentile is deterministic (value under any tie order)") {
    val df = Seq((1L, "g", 5.0), (2L, "g", 5.0), (3L, "g", 5.0),
      (4L, "g", 9.0)).toDF("id", "grp", "value")
    val r = RobustStats.winsorize(df, col("grp"), col("value"), col("id"),
      loBp = 2500, hiBp = 7500).collect().head
    // lo pos = ceil(0.25*4)=1, hi pos = ceil(0.75*4)=3 -> both land on 5.0
    assert(r.getDouble(1) == 5.0 && r.getDouble(2) == 5.0)
    assert(r.getLong(4) == 1L) // 9.0 clips down
  }
}
