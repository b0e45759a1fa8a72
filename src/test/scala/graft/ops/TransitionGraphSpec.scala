package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TransitionGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // user 1 walks a->b->c->a->b; user 2 walks a->c->c
  private lazy val ev = Seq(
    (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "a"), (1L, 5L, "b"),
    (2L, 6L, "a"), (2L, 7L, "c"), (2L, 8L, "c")
  ).toDF("user_id", "event_id", "event_type")

  test("topEdges keeps at most k per src, ranked by frequency then dst") {
    val e1 = TransitionGraph.topEdges(ev, col("user_id"), col("event_id"),
      col("event_type"), k = 1).collect().map(r => r.getString(0) -> r.getString(1))
    // a: a->b x2 beats a->c x1; c: c->a and c->c tie 1-1, dst-tiebreak -> a
    assert(e1.toSet == Set("a" -> "b", "b" -> "c", "c" -> "a"))
    val e2 = TransitionGraph.topEdges(ev, col("user_id"), col("event_id"),
      col("event_type"), k = 2).collect()
    assert(e2.length == 5) // a->{b,c}, b->c, c->{a,c}
  }

  test("reachable is depth-capped BFS with min depth per node") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst")
    val r = TransitionGraph.reachable(spark, edges, start = "a",
      maxDepth = 2, viewName = "tg_spec_edges")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // depth cap 2: a(0), b(1), c(2); d is at depth 3 -> excluded
    assert(r == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    val r4 = TransitionGraph.reachable(spark, edges, start = "a",
      maxDepth = 4, viewName = "tg_spec_edges4")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // cycle a->b->c->a doesn't loop forever; d reached at 3; a keeps min 0
    assert(r4 == Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L))
  }

  test("quote-bearing state names and bad view names are handled safely") {
    val edges = Seq(("it's a", "b")).toDF("src", "dst")
    val r = TransitionGraph.reachable(spark, edges, start = "it's a",
      maxDepth = 1, viewName = "tg_spec_quote")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r == Map("it's a" -> 0L, "b" -> 1L))
    intercept[IllegalArgumentException](
      TransitionGraph.reachable(spark, edges, start = "a",
        maxDepth = 1, viewName = "bad; DROP VIEW x"))
  }
}
