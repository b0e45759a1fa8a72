package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** S1/A1 (batch/main.py:68-135,168-274). */
class WatermarkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def tmp() = Files.createTempDirectory("wm").toString + "/wm.json"

  test("store round-trips and tolerates a missing file") {
    val p = tmp()
    assert(Watermark.load(p).isEmpty)
    Watermark.save(p, Map("events" -> 1716241234L, "other" -> 5L))
    assert(Watermark.load(p) == Map("events" -> 1716241234L, "other" -> 5L))
  }
  test("filter is strict > (re-run with advanced mark yields nothing)") {
    val df = Seq(1L, 2L, 3L).toDF("ts")
    assert(Watermark.filterNew(df, col("ts"), Some(2L))
      .as[Long].collect().toSeq == Seq(3L))
    val mx = Watermark.advance(df, col("ts"))
    assert(mx.contains(3L))
    assert(Watermark.filterNew(df, col("ts"), mx).count() == 0)
  }
  test("advance on empty/all-null input is None") {
    assert(Watermark.advance(Seq.empty[Long].toDF("ts"), col("ts")).isEmpty)
  }
  test("runIncremental persists the mark BEFORE invoking the sink") {
    val p = tmp()
    var markAtSinkTime: Option[Long] = None
    val df = Seq(10L, 20L).toDF("ts")
    val n = Watermark.runIncremental(df, col("ts"), p, "t") { _ =>
      markAtSinkTime = Watermark.load(p).get("t")
    }
    assert(n == 2)
    assert(markAtSinkTime.contains(20L)) // reference ordering, main.py:258-278
    // second run sees nothing new; sink not called
    var called = false
    val n2 = Watermark.runIncremental(df, col("ts"), p, "t")(_ => called = true)
    assert(n2 == 0 && !called)
  }
  test("per-table isolation") {
    val p = tmp()
    Watermark.save(p, Map("a" -> 1L))
    val df = Seq(5L).toDF("ts")
    Watermark.runIncremental(df, col("ts"), p, "b")(_ => ())
    assert(Watermark.load(p) == Map("a" -> 1L, "b" -> 5L))
  }
}
