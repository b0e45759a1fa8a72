package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Sweep-line concurrency: distributed prefix sum == serial reference. */
class SweepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def serialRef(iv: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    val deltas = iv.flatMap { case (lo, hi) => Seq((lo, 1L), (hi + 1, -1L)) }
      .groupBy(_._1).map { case (t, ds) => (t, ds.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    var acc = 0L
    deltas.map { case (t, net) => acc += net; (t, net, acc) }
  }

  test("matches the serial sweep on overlapping intervals") {
    val iv = Seq((0L, 10L), (5L, 15L), (10L, 20L), (30L, 40L), (35L, 36L))
    val got = Sweep.concurrency(iv.toDF("lo", "hi"), col("lo"), col("hi"),
      numRanges = 4)
      .orderBy(col("t"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == serialRef(iv))
  }

  test("prefix offsets are correct across MANY partitions (ends at zero)") {
    // 500 intervals spread over a wide domain with 32 range partitions:
    // every partition's base offset must chain exactly
    val iv = (0L until 500L).map(i => (i * 7, i * 7 + (i % 13) + 1))
    val got = Sweep.concurrency(iv.toDF("lo", "hi"), col("lo"), col("hi"),
      numRanges = 32)
      .orderBy(col("t"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == serialRef(iv))
    assert(got.last._3 == 0L, "all intervals close -> concurrency drains to 0")
    assert(got.map(_._2).sum == 0L)
  }

  test("identical intervals stack; instant interval covers its second") {
    val iv = Seq((5L, 5L), (5L, 5L), (5L, 5L))
    val got = Sweep.concurrency(iv.toDF("lo", "hi"), col("lo"), col("hi"))
      .orderBy(col("t")).as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((5L, 3L, 3L), (6L, -3L, 0L)))
  }
}
