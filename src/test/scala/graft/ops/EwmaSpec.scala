package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** E19 blocked EWMA: the block-bounded contract (exactly the plain
  * fold within one block, in-order acc·2^{−m}+c across blocks), its
  * partition-independence, and the skew fixture the r12 audit asked
  * for — one key with 10⁶ events folding through block summaries
  * instead of one history-sized buffer.
  */
class EwmaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def plainFold(values: Seq[Double]): Double =
    values.tail.foldLeft(values.head)((acc, x) => (acc + x) / 2.0)

  private def run(rows: Seq[(Long, Long, Double)], blockEvents: Long) =
    Ewma.ewmaHalf(rows.toDF("k", "o", "v"), col("k"), Seq(col("o")),
        col("v"), blockEvents)
      .orderBy("key").as[(Long, Long, Double)].collect().toSeq

  private val fixture: Seq[(Long, Long, Double)] = {
    val rnd = new scala.util.Random(42)
    for (k <- 0L until 5L; i <- 0L until 37L)
      yield (k, i, rnd.nextDouble() * math.pow(10.0, rnd.nextInt(7) - 3))
  }

  test("one block: equals the plain sequential fold bit-for-bit") {
    val got = run(fixture, blockEvents = 4096L)
    val expected = fixture.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (k, rows) =>
        val vs = rows.sortBy(_._2).map(_._3)
        (k, vs.length.toLong, plainFold(vs))
    }
    assert(got == expected)
  }

  test("multi-block: equals the driver replay of the blocked contract bit-for-bit, at several widths") {
    for (b <- Seq(3, 5, 16)) {
      val got = run(fixture, blockEvents = b.toLong)
      val expected = fixture.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (k, rows) =>
          val vs = rows.sortBy(_._2).map(_._3)
          (k, vs.length.toLong, Ewma.replay(vs, b))
      }
      assert(got == expected, s"blockEvents=$b diverged from the replay")
      // and the blocked result is the plain fold up to composition
      // rounding: ulp-scale, never structural
      got.zip(expected.map(_._1)).foreach { case ((k, _, e), _) =>
        val vs = fixture.filter(_._1 == k).sortBy(_._2).map(_._3)
        val plain = plainFold(vs)
        assert(math.abs(e - plain) <=
          math.max(math.ulp(plain) * vs.length, 1e-300),
          s"key $k: blocked $e vs plain $plain drifted beyond ulp scale")
      }
    }
  }

  test("partitioning-independent (4 vs 32 slices)") {
    val df4 = spark.createDataFrame(
      spark.sparkContext.parallelize(
        fixture.map(t => org.apache.spark.sql.Row(t._1, t._2, t._3)), 4),
      new org.apache.spark.sql.types.StructType()
        .add("k", "long").add("o", "long").add("v", "double"))
    val a = Ewma.ewmaHalf(df4, col("k"), Seq(col("o")), col("v"), 7L)
      .orderBy("key").as[(Long, Long, Double)].collect().toSeq
    assert(a == run(fixture, 7L))
  }

  test("skew fixture: one key with 10^6 events folds through block summaries (r12 hazard)") {
    // a power-law key: 10^6 events on key 0 next to small keys — the
    // old single-collect_list form held one 10^6-struct buffer; the
    // blocked form's largest buffer is 4096 structs + 245 summaries
    val n = 1000000L
    val big = spark.range(n).select(
      lit(0L).as("k"), col("id").as("o"),
      (col("id") % 997).cast("double").as("v"))
    val small = Seq((1L, 0L, 2.5), (1L, 1L, 3.5)).toDF("k", "o", "v")
    val got = Ewma.ewmaHalf(big.unionByName(small), col("k"),
        Seq(col("o")), col("v"))
      .orderBy("key").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((0L, n), (1L, 2L)))
    assert(got(1)._3 == 3.0)
    // driver replay over the same million values, same block width
    val vs = (0L until n).map(i => (i % 997).toDouble)
    assert(got.head._3 == Ewma.replay(vs, Ewma.BlockEvents.toInt))
  }

  test("two-level composition: superblock fold replays bit-for-bit; one superblock == single-level") {
    def run2(rows: Seq[(Long, Long, Double)], b: Long, sb: Long) =
      Ewma.ewmaHalf(rows.toDF("k", "o", "v"), col("k"), Seq(col("o")),
          col("v"), b, sb)
        .orderBy("key").as[(Long, Long, Double)].collect().toSeq
    // tiny widths force MANY superblocks on the 37-event keys
    for ((b, sb) <- Seq((3L, 2L), (4L, 3L), (5L, 4L))) {
      val got = run2(fixture, b, sb)
      val expected = fixture.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (k, rows) =>
          val vs = rows.sortBy(_._2).map(_._3)
          (k, vs.length.toLong, Ewma.replay(vs, b.toInt, sb.toInt))
      }
      assert(got == expected, s"($b, $sb) diverged from the 2-level replay")
      // still the plain fold up to composition rounding
      got.foreach { case (k, _, e) =>
        val plain = plainFold(fixture.filter(_._1 == k).sortBy(_._2).map(_._3))
        assert(math.abs(e - plain) <= math.max(math.ulp(plain) * 37, 1e-300))
      }
    }
    // keys fitting one superblock are BIT-IDENTICAL to the
    // single-level contract (the shipped q_ewma oracle's regime:
    // blockBlocks superblock capacity is blockEvents·blockBlocks
    // events — 16.7M at the defaults, far above any fixture key)
    assert(run2(fixture, 5L, 1000L) == run(fixture, 5L))
    // a genuinely multi-superblock key replays at width (4, 4):
    // 2000 events → 500 blocks → 125 superblocks
    val vs = (0L until 2000L).map(i => ((i * 31) % 101).toDouble)
    val one = vs.zipWithIndex.map { case (v, i) => (9L, i.toLong, v) }
    assert(run2(one, 4L, 4L) ==
      Seq((9L, 2000L, Ewma.replay(vs, 4, 4))))
  }
}
