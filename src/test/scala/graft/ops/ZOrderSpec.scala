package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Z-order: interleave correctness + the pruning property the layout
  * exists for (tight per-partition bounds in EVERY interleaved
  * dimension, not just the leading sort column).
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    for (i <- 0 until bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("zValue matches the reference interleave on a value sweep") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue2(col("x"), col("y"), 5).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1), 5))
    }
  }

  test("zValue only reads the low `bits` bits") {
    val df = Seq((1024L + 5L, 2048L + 3L)).toDF("x", "y")
    val z = df.select(ZOrder.zValue2(col("x"), col("y"), 10)).as[Long].head()
    assert(z == mortonRef(5L, 3L, 10))
  }

  test("three-column weave places bit i of col j at position 3i+j") {
    val df = Seq((1L, 1L, 1L)).toDF("a", "b", "c")
    val z = df.select(ZOrder.zValue(Seq(col("a"), col("b"), col("c")), 1))
      .as[Long].head()
    assert(z == 7L) // bits 0,1,2 set
  }

  test("z layout prunes on the SECOND dimension where a linear sort cannot") {
    // 64x64 grid, 16 partitions. A y-range predicate overlaps EVERY
    // partition of an x-sorted layout (each partition is a thin
    // x-strip spanning all y) but only the z-tiles whose bbox crosses
    // the y band.
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")

    def overlappingParts(df: org.apache.spark.sql.DataFrame): Long =
      df.withColumn("pid", spark_partition_id())
        .groupBy(col("pid"))
        .agg(min(col("y")).as("lo"), max(col("y")).as("hi"))
        .filter(col("lo") <= 11L && col("hi") >= 4L) // y in [4, 11]
        .count()

    val linear = grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x"))
    val zed = ZOrder.layoutByZ(grid, Seq(col("x"), col("y")), 16, bits = 6)

    val linHit = overlappingParts(linear)
    val zHit = overlappingParts(zed)
    assert(linHit == 16L, s"x-strips all span the y band (got $linHit)")
    assert(zHit <= 8L, s"z-tiles bound y: expected <=8 of 16, got $zHit")
  }
}
