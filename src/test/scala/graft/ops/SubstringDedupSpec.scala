package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Exact-substring span dedup (Lee et al. ACL'22, rolling-window
  * form): inventory shape, cross-doc span detection, self-repetition,
  * short-doc handling, and the ratio arithmetic.
  */
class SubstringDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("id", "text")

  test("window inventory: one window per start position, none for short docs") {
    val df = docs(
      1L -> "a b c d e",   // 5 tokens, W=3 -> 3 windows
      2L -> "x y")         // 2 tokens  -> none
    val inv = SubstringDedup.windowInventory(df, col("id"), col("text"), 3)
      .orderBy("doc_id", "pos").collect()
    assert(inv.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq ==
      Seq((1L, 0, "a b c"), (1L, 1, "b c d"), (1L, 2, "c d e")))
  }

  test("repeatedSpans finds a span embedded in two otherwise-different docs") {
    val span = "the quick brown fox"
    val df = docs(
      1L -> s"alpha beta $span gamma delta",
      2L -> s"one two three $span four",
      3L -> "unrelated words only here now")
    val spans = SubstringDedup.repeatedSpans(df, col("id"), col("text"),
      windowTokens = 4, minDocs = 2).collect()
    // exactly the 4-token windows common to docs 1 and 2: just `span`
    // itself (its neighbors differ between the docs)
    assert(spans.map(_.getString(0)).toSeq == Seq(span))
    assert(spans.head.getLong(1) == 2L) // n_docs
    assert(spans.head.getLong(2) == 2L) // n_occ
  }

  test("spanDupStats: cross-doc duplication and the ratio") {
    val df = docs(
      1L -> "p q r s t",       // windows: pqr qrs rst
      2L -> "p q r x y",       // windows: pqr qrx rxy -> shares pqr
      3L -> "m n o u v")       // all unique
    val stats = SubstringDedup.spanDupStats(df, col("id"), col("text"), 3)
      .orderBy("doc_id").collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 3L, 1L), (2L, 3L, 1L), (3L, 3L, 0L)))
    assert(math.abs(stats(0).getDouble(3) - 1.0 / 3.0) < 1e-12)
    assert(stats(2).getDouble(3) == 0.0)
  }

  test("self-repetition inside one document counts as duplication") {
    val df = docs(1L -> "a b a b a b")
    // W=2 windows: "a b","b a","a b","b a","a b" -> all duplicated
    val stats = SubstringDedup.spanDupStats(df, col("id"), col("text"), 2)
      .collect()
    assert(stats.head.getLong(1) == 5L)
    assert(stats.head.getLong(2) == 5L)
    assert(stats.head.getDouble(3) == 1.0)
  }

  test("documents shorter than the window report (0, 0, 0.0), not dropped") {
    val df = docs(1L -> "only two", 2L -> "a b c d")
    val stats = SubstringDedup.spanDupStats(df, col("id"), col("text"), 3)
      .orderBy("doc_id").collect()
    assert(stats.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq((1L, 0L, 0L), (2L, 2L, 0L)))
    assert(stats(0).getDouble(3) == 0.0)
  }

  test("a long shared span yields L-W+1 consecutive duplicated windows") {
    val shared = (1 to 6).map(i => s"s$i").mkString(" ") // 6 tokens
    val df = docs(
      1L -> s"head1 $shared tail1",
      2L -> s"head2 $shared tail2")
    val spans = SubstringDedup.repeatedSpans(df, col("id"), col("text"),
      windowTokens = 4, minDocs = 2).collect()
    // windows fully inside the shared span: 6-4+1 = 3
    assert(spans.length == 3)
    assert(spans.forall(_.getLong(1) == 2L))
  }

  test("scrub removes the non-canonical occurrence, keeps the first") {
    val span = "the quick brown fox jumps"
    val df = docs(
      1L -> s"alpha $span omega",
      2L -> s"one two $span three")
    val out = SubstringDedup.scrubDuplicatedSpans(df, col("id"), col("text"), 5)
      .orderBy("doc_id").collect()
    // doc 1 holds the canonical occurrence: untouched
    assert(out(0).getString(1) == s"alpha $span omega")
    assert(out(0).getLong(2) == 0L)
    // doc 2 loses exactly the 5 span tokens
    assert(out(1).getString(1) == "one two three")
    assert(out(1).getLong(2) == 5L)
  }

  test("scrub collapses self-repetition to one occurrence") {
    val df = docs(1L -> "x y x y x y")
    // W=2 duplicated windows: every occurrence after the canonical
    // "x y"@0 / "y x"@1 is dropped -> tokens 2..5 go
    val out = SubstringDedup.scrubDuplicatedSpans(df, col("id"), col("text"), 2)
      .collect()
    assert(out.head.getString(1) == "x y")
    assert(out.head.getLong(2) == 4L)
  }

  test("scrub passes short and untouched docs through verbatim") {
    val df = docs(1L -> "tiny", 2L -> "all words here are unique tokens now")
    val out = SubstringDedup.scrubDuplicatedSpans(df, col("id"), col("text"), 3)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(1)).toSeq ==
      Seq("tiny", "all words here are unique tokens now"))
    assert(out.forall(_.getLong(2) == 0L))
  }

  test("scrub plan has no mandatory broadcast on the drop-set side") {
    // the drop-set volume scales with the corpus duplication rate
    // (unbounded); a forced broadcast hint would OOM a dup-heavy
    // corpus at scale. AQE may still CHOOSE broadcast when small —
    // what must be absent is the mandatory hint in the logical plan.
    val df = docs(1L -> "a b c d e f", 2L -> "a b c d x y")
    val analyzed = SubstringDedup.scrubDuplicatedSpans(
      df, col("id"), col("text"), 3).queryExecution.analyzed
    val hints = analyzed.collect {
      case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
    }
    assert(hints.isEmpty, s"forced join-strategy hint present:\n$analyzed")
  }

  test("scrub rebuild survives a heavily duplicated document") {
    // every window duplicated: the drop set covers most of the doc;
    // the array_except mask must drop exactly the non-canonical span
    val span = (1 to 10).map(i => s"w$i").mkString(" ")
    val df = docs(1L -> span, 2L -> span, 3L -> span)
    val out = SubstringDedup.scrubDuplicatedSpans(df, col("id"), col("text"), 4)
      .orderBy("doc_id").collect()
    assert(out(0).getString(1) == span && out(0).getLong(2) == 0L)
    assert(out(1).getString(1) == "" && out(1).getLong(2) == 10L)
    assert(out(2).getString(1) == "" && out(2).getLong(2) == 10L)
  }

  test("inventory is narrow: no shuffle before the window rows exist") {
    val df = docs(1L -> "a b c d e f g h")
    val plan = SubstringDedup.windowInventory(df, col("id"), col("text"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"window inventory should not shuffle:\n$plan")
  }

  /** Brute doc pairs sharing a literal minLen-char run (codepoints). */
  private def brutePairs(rows: Seq[(Long, String)], minLen: Int): Seq[(Long, Long)] = {
    def grams(t: String): Set[String] = {
      val cps = t.codePoints.toArray
      (0 to cps.length - minLen).map(p => new String(cps, p, minLen)).toSet
    }
    val g = rows.map { case (id, t) => id -> grams(t) }
    (for {
      (a, ga) <- g; (b, gb) <- g
      if a < b && (ga intersect gb).nonEmpty
    } yield (a, b)).sortBy(identity)
  }

  test("verbatimDupPairs == brute gram-pair truth (winnowed pair probe is exact)") {
    val span = "The five boxing wizards jump quickly tonight" // 45 chars
    val rows = Seq(
      1L -> s"xx$span tail one",
      2L -> s"$span tail two",                       // pairs with 1, 4
      3L -> "nothing shared with anyone, long enough to have grams here",
      4L -> s"prefix then $span end",                // pairs with 1, 2
      5L -> s"short${span.take(31)}",                // 31-char overlap: NO pair
      // (no separator: a shared boundary space would extend the run to 32)
      6L -> ("ab" * 30),                             // periodic self-content
      7L -> ("zz" + "ab" * 20 + "qq"))               // periodic overlap with 6
    val got = SubstringDedup.verbatimDupPairs(
        rows.toDF("doc_id", "text"), col("doc_id"), col("text"),
        minLen = 32, k = 16)
      .orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got == brutePairs(rows, 32))
    assert(got.contains((1L, 2L)) && got.contains((2L, 4L)) &&
      got.contains((6L, 7L)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L), "31-char overlap leaked")
  }

  test("verbatimDupPairs matches brute truth on the sf corpus") {
    val d = graft.Tables.documents(spark, SparkTestSession.Sf)
    val rows = d.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.filter(_._2 != null)
    val got = SubstringDedup.verbatimDupPairs(d, col("doc_id"), col("text"),
        minLen = 32, k = 16)
      .orderBy("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(got == brutePairs(rows, 32))
    assert(got.nonEmpty, "sf corpus has no verbatim pairs — fixture too weak")
  }
}
