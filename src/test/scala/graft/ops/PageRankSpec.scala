package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Fixed-point integer PageRank: conservation, ordering, determinism. */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val Scale = 1000000000000L

  private def edges(rows: (String, String, Long)*) =
    rows.toDF("src", "dst", "w")

  test("zero iterations: every node holds scale/N") {
    val e = edges(("a", "b", 1L), ("b", "c", 1L))
    val r = PageRank.ranks(e, iterations = 0).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set("a", "b", "c"))
    assert(r.values.forall(_ == Scale / 3))
  }

  test("symmetric 2-cycle: equal ranks, total mass ~ scale") {
    val e = edges(("a", "b", 1L), ("b", "a", 1L))
    val r = PageRank.ranks(e, iterations = 5).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") == r("b"))
    // floors lose at most a few units per node per iteration
    val total = r.values.sum
    assert(total <= Scale && total > Scale - 1000L)
  }

  test("a node every other node links to outranks the periphery") {
    val e = edges(("a", "hub", 1L), ("b", "hub", 1L), ("c", "hub", 1L),
      ("hub", "a", 1L))
    val r = PageRank.ranks(e, iterations = 3).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("hub") > r("b") && r("hub") > r("c"))
    assert(r("a") > r("b")) // hub's entire outflow lands on a
  }

  test("weighted edges split proportionally: heavier edge, higher rank") {
    val e = edges(("s", "x", 3L), ("s", "y", 1L), ("x", "s", 1L), ("y", "s", 1L))
    val r = PageRank.ranks(e, iterations = 3).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("x") > r("y"))
  }

  test("bit-identical across runs (pure integer arithmetic)") {
    val e = edges(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 5L), ("a", "c", 1L))
    val r1 = PageRank.ranks(e, iterations = 4).collect()
      .map(x => (x.getString(0), x.getLong(1))).sortBy(_._1).toSeq
    val r2 = PageRank.ranks(e, iterations = 4).collect()
      .map(x => (x.getString(0), x.getLong(1))).sortBy(_._1).toSeq
    assert(r1 == r2)
  }
}
