package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Chunking invariants: coverage (no token lost), overlap stitching,
  * boundary shapes, narrowness of the plan.
  */
class ChunkingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("id", "text")

  private def chunk(df: org.apache.spark.sql.DataFrame,
                    size: Int, overlap: Int) =
    Chunking.chunks(df, col("id"), col("text"), size, overlap)
      .orderBy("doc_id", "chunk_idx")

  test("no overlap: chunks partition the token stream exactly") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val out = chunk(docs(1L -> text), 4, 0).collect()
    assert(out.map(_.getString(3)).toSeq ==
      Seq("t1 t2 t3 t4", "t5 t6 t7 t8", "t9 t10"))
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 4L, 2L))
    // reassembling the chunks reproduces the document
    assert(out.map(_.getString(3)).mkString(" ") == text)
  }

  test("overlap: consecutive chunks share exactly `overlap` tokens; no redundant tail") {
    val text = (1 to 9).map(i => s"w$i").mkString(" ")
    val out = chunk(docs(1L -> text), 4, 2).collect().map(_.getString(3))
    // stride 2: starts 0,2,4,6 - start 8's chunk ("w9") lies entirely
    // inside chunk@6's overlap and is skipped (zero new tokens)
    assert(out.toSeq == Seq(
      "w1 w2 w3 w4", "w3 w4 w5 w6", "w5 w6 w7 w8", "w7 w8 w9"))
    out.sliding(2).foreach { case Array(a, b) =>
      val at = a.split(" ")
      assert(at.takeRight(2).sameElements(b.split(" ").take(
        math.min(2, b.split(" ").length))) || at.length < 4)
    }
  }

  test("every chunk contributes at least one new token") {
    // size 10, overlap 8 (stride 2), 13 tokens: naive starts 0,2,...,12
    // contain a run of tail chunks adding nothing; all must be dropped
    val text = (1 to 13).map(i => s"t$i").mkString(" ")
    val out = chunk(docs(1L -> text), 10, 8).collect().map(_.getString(3))
    var covered = 0
    out.foreach { c =>
      val ts = c.split(" ")
      val last = ts.last.drop(1).toInt
      assert(last > covered, s"chunk '$c' adds no new token")
      covered = last
    }
    assert(covered == 13) // and nothing was lost
  }

  test("doc shorter than one chunk yields exactly one full-doc chunk") {
    val out = chunk(docs(7L -> "a b"), 64, 16).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 0L && out(0).getLong(2) == 2L)
    assert(out(0).getString(3) == "a b")
  }

  test("every document emits at least one chunk; ids and idx are dense") {
    val ds = docs(1L -> "x", 2L -> "a b c d e", 3L -> "q r s t u v w")
    val out = chunk(ds, 3, 1).collect()
    assert(out.map(_.getLong(0)).distinct.toSeq == Seq(1L, 2L, 3L))
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).toSeq == rows.indices.map(_.toLong))
    }
  }

  test("coverage with overlap: distinct tokens survive in order") {
    val text = (1 to 23).map(i => s"k$i").mkString(" ")
    val out = chunk(docs(1L -> text), 5, 2).collect()
    // walking chunks, appending only tokens past the overlap, rebuilds
    // the doc: no token lost, none duplicated beyond the overlap
    val rebuilt = out.zipWithIndex.flatMap { case (r, i) =>
      val ts = r.getString(3).split(" ")
      if (i == 0) ts else ts.drop(2)
    }
    assert(rebuilt.mkString(" ") == text)
  }

  test("the plan is narrow: no exchange") {
    val plan = chunk(docs(1L -> "a b c"), 2, 0)
      .queryExecution.executedPlan.toString
    // orderBy adds one exchange; the chunker itself must add none
    val chunkOnly = Chunking.chunks(docs(1L -> "a b c"),
      col("id"), col("text"), 2, 0)
      .queryExecution.executedPlan.toString
    assert(!chunkOnly.contains("Exchange"), chunkOnly)
    assert(plan != null)
  }

  test("parameter validation") {
    val d = docs(1L -> "a")
    intercept[IllegalArgumentException] {
      Chunking.chunks(d, col("id"), col("text"), 0, 0)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunks(d, col("id"), col("text"), 4, 4)
    }
  }

  test("chunksByCost: boundaries at running cost, straddling unit stays whole") {
    import spark.implicits._
    // doc 1: costs 3,4,2,5 budget 6 -> starts 0,3,7,9 -> chunks 0,0,1,1
    // (the cost-4 unit starts at 3 and straddles 6: stays in chunk 0)
    val units = Seq(
      (1L, 0, 3L), (1L, 1, 4L), (1L, 2, 2L), (1L, 3, 5L),
      (2L, 0, 6L), (2L, 1, 1L)).toDF("doc", "pos", "cost")
    val got = Chunking.chunksByCost(units, col("doc"), col("pos"),
        col("cost"), budget = 6L)
      .orderBy("doc_id", "chunk_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 0L, 2L, 7L), // exceeds budget by straddle: documented
      (1L, 1L, 2L, 7L),
      (2L, 0L, 1L, 6L),
      (2L, 1L, 1L, 1L)))
  }
}
