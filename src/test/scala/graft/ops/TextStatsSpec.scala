package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** E3: token counts, lang-id, quality, fingerprint, shingles, jaccard. */
class TextStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("whitespace and BPE-ish token counts") {
    val df = Seq("hello world 42 foo-bar").toDF("t")
    val r = df.select(
      TextStats.tokenCount(col("t")),
      TextStats.bpeishCount(col("t"))).collect()(0)
    assert(r.getLong(0) == 4)
    // hello, world, 42, foo, -, bar
    assert(r.getLong(1) == 6)
  }
  test("lang-id picks the language with most marker hits; und when none") {
    val df = Seq(
      "the cat and the dog of the town",
      "le chat et les chiens de la ville",
      "xyzzy plugh").toDF("t")
    val got = df.select(TextStats.langId(col("t"))).as[String].collect().toSeq
    assert(got == Seq("en", "fr", "und"))
  }
  test("marker counting keeps duplicates (filter, not intersect)") {
    val df = Seq("the the the").toDF("t")
    val n = df.select(TextStats.markerCount(TextStats.tokens(col("t")),
      TextStats.LangMarkers.head._2)).collect()(0).getLong(0)
    assert(n == 3)
  }
  test("a marker shared by two vocabularies counts toward both") {
    // "de" is in both the fr and es marker lists: one token, two slots
    val counts = Seq("de de").toDF("t").select(
      graft.functions.ArrayExprs.markerCounts(
        TextStats.tokens(col("t")),
        TextStats.LangMarkers.map(_._2.toArray).toArray))
      .as[Seq[Long]].collect()(0)
    val byLang = TextStats.LangMarkers.map(_._1).zip(counts).toMap
    assert(byLang("fr") == 2 && byLang("es") == 2 && byLang("en") == 0)
  }
  test("lang-id tie-break is first language in LangMarkers order") {
    // "la" is in both fr and es lists -> tie; fr is declared first
    val got = Seq("la la").toDF("t")
      .select(TextStats.langId(col("t"))).as[String].collect()(0)
    assert(got == "fr")
  }
  test("quality score is in [0,1] and favors clean prose") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and keeps running to the end of the field",
      "!!! ??? *** ### $$$").toDF("t")
    val s = df.select(TextStats.qualityScore(col("t"))).as[Double].collect()
    assert(s.forall(x => x >= 0.0 && x <= 1.0))
    assert(s(0) > s(1))
  }
  test("fingerprint is stable and order-sensitive") {
    val df = Seq("a b c", "a b c", "c b a").toDF("t")
    val fps = df.select(TextStats.fingerprint(col("t"))).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }
  test("shingles: n-grams, or whole text when shorter than n") {
    val df = Seq("a b c d", "a b").toDF("t")
    val sh = df.select(TextStats.shingles(col("t"), 3)).as[Seq[String]].collect()
    assert(sh(0) == Seq("a b c", "b c d"))
    assert(sh(1) == Seq("a b"))
  }
  test("jaccard of identical sets is 1, disjoint is 0") {
    val df = Seq(
      (Seq("a", "b"), Seq("a", "b")),
      (Seq("a"), Seq("b"))).toDF("x", "y")
    val j = df.select(TextStats.jaccard(col("x"), col("y"))).as[Double].collect()
    assert(j(0) == 1.0 && j(1) == 0.0)
  }
  test("repetition signals: looping text maxes out, varied text stays low") {
    val docs = Seq(
      (1L, "spam ham spam ham spam ham spam ham"), // one 2-gram dominates
      (2L, "a b c d e f g h"),                     // all distinct
      (3L, "x x x x")).toDF("doc_id", "t")         // fully repeated token
    val got = TextStats.repetitionSignals(docs, col("doc_id"), col("t"))
      .orderBy("id")
      .select("id", "n_grams", "dup_token_frac", "top_gram_frac")
      .as[(Long, Long, Double, Double)].collect().toSeq
    // doc 1: 7 grams = 4x "spam ham" + 3x "ham spam" -> top 4/7;
    //        8 tokens, 2 distinct -> dup 0.75
    assert(got(0) == ((1L, 7L, 0.75, 4.0 / 7.0)))
    // doc 2: all grams unique -> top 1/7; no dup tokens
    assert(got(1) == ((2L, 7L, 0.0, 1.0 / 7.0)))
    // doc 3: "x x" 3 times -> top 1.0; dup 0.75
    assert(got(2) == ((3L, 3L, 0.75, 1.0)))
  }
}
