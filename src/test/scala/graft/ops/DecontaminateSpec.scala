package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Contamination semantics: exact overlap ratios on hand-built docs,
  * bounds, short-doc convention, the filter, and the broadcast plan
  * shape the 100 TB claim rests on.
  */
class DecontaminateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact gram overlap: full, partial, zero") {
    val bench = df(100L -> "a b c d")           // grams: {a b c, b c d}
    val corpus = df(
      1L -> "a b c d",                          // both grams hit -> 1.0
      2L -> "a b c x y",                        // {a b c, b c x, c x y}: 1/3
      3L -> "p q r s")                          // no hits -> 0.0
    val got = Decontaminate.contamination(corpus, bench,
      col("doc_id"), col("text"), n = 3)
      .orderBy("id")
      .select("id", "n_grams", "n_hits", "contamination")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1.0),
      (2L, 3L, 1L, 1.0 / 3.0),
      (3L, 2L, 0L, 0.0)))
  }

  test("repeated grams count once (distinct semantics)") {
    val bench = df(100L -> "x x x x x")
    val corpus = df(1L -> "x x x x x x x x") // all 3-grams identical
    val got = Decontaminate.contamination(corpus, bench,
      col("doc_id"), col("text"), n = 3).head()
    assert(got.getAs[Long]("n_grams") == 1L)
    assert(got.getAs[Long]("n_hits") == 1L)
    assert(got.getAs[Double]("contamination") == 1.0)
  }

  test("short docs (< n tokens) compare whole-text grams") {
    val bench = df(100L -> "a b")
    val corpus = df(1L -> "a b", 2L -> "a c")
    val got = Decontaminate.contamination(corpus, bench,
      col("doc_id"), col("text"), n = 3)
      .orderBy("id").select("contamination").as[Double].collect().toSeq
    assert(got == Seq(1.0, 0.0))
  }

  test("decontaminated keeps only rows under the threshold") {
    val bench = df(100L -> "a b c d")
    val corpus = df(1L -> "a b c d", 2L -> "a b c x y", 3L -> "p q r s")
    val kept = Decontaminate.decontaminated(corpus, bench,
      col("doc_id"), col("text"), n = 3, maxContamination = 0.5)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(2L, 3L))
  }

  test("plan: benchmark gram probe is a broadcast join (corpus never shuffles for it)") {
    val bench = df(100L -> "a b c d")
    val corpus = df(1L -> "a b c d", 2L -> "p q r s")
    val plan = Decontaminate.contamination(corpus, bench,
      col("doc_id"), col("text"), n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  /** Brute verbatim-32-gram containment for the fixture. */
  private def bruteVerbatim(corpus: Seq[(Long, String)],
                            bench: Seq[(Long, String)], minLen: Int) = {
    val bg = bench.flatMap { case (_, t) =>
      val cps = t.codePoints.toArray
      (0 to cps.length - minLen).map(p => new String(cps, p, minLen))
    }.toSet
    corpus.map { case (id, t) =>
      val cps = t.codePoints.toArray
      val n = math.max(cps.length - minLen + 1, 0)
      val hits = (0 until n).count(p => bg(new String(cps, p, minLen)))
      (id, n.toLong, hits.toLong,
        if (n == 0) 0.0 else hits.toDouble / n.toDouble)
    }.sortBy(_._1)
  }

  test("verbatimContamination: exact 32-char containment incl. perturbed copies and short docs") {
    val span = "The five boxing wizards jump quickly tonight" // 45 chars
    val benchRows = Seq(100L -> s"Benchmark question: $span — answer below.")
    val corpusRows = Seq(
      // verbatim copy, different tokenization around it: the token-set
      // gate blurs, the character gate must hit
      1L -> s"noise   $span   more noise",
      // whitespace-perturbed INSIDE the span: no 32-char verbatim run
      2L -> s"noise ${span.replace(" jump ", "  jump ")} tail",
      3L -> "completely unrelated text that is long enough to have grams",
      4L -> "short doc") // < 32 chars: n_grams 0, contamination 0.0
    val got = Decontaminate.verbatimContamination(
        corpusRows.toDF("doc_id", "text"), benchRows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), minLen = 32)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == bruteVerbatim(corpusRows, benchRows, 32))
    val byId = got.map(r => r._1 -> r._3).toMap
    assert(byId(1L) > 0L, "verbatim copy must hit")
    assert(byId(2L) == 0L, "in-span perturbation must not hit at 32 chars")
    assert(byId(3L) == 0L && byId(4L) == 0L)
    assert(got.find(_._1 == 4L).get._2 == 0L)
  }

  test("verbatimContamination plan: bench probe + literal verify broadcast; corpus never shuffles for them") {
    val bench = df(100L -> ("b" * 40))
    val corpus = df(1L -> ("b" * 40 + " tail"), 2L -> ("z" * 40))
    val plan = Decontaminate.verbatimContamination(corpus, bench,
      col("doc_id"), col("text"), minLen = 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  private def sampledVsExact(corpus: Seq[(Long, String)],
                             bench: Seq[(Long, String)],
                             minLen: Int, k: Int): Unit = {
    def rows(got: org.apache.spark.sql.DataFrame) =
      got.orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    val exact = rows(Decontaminate.verbatimContamination(
      corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
      col("doc_id"), col("text"), minLen))
    val sampled = rows(Decontaminate.verbatimContaminationSampled(
      corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"),
      col("doc_id"), col("text"), minLen, k))
    assert(sampled == exact, s"minLen=$minLen k=$k")
  }

  test("verbatimContaminationSampled == verbatimContamination on adversarial fixtures") {
    val span = "The five boxing wizards jump quickly tonight" // 45 chars
    val bench = Seq(100L -> s"Benchmark question: $span — answer below.",
      101L -> ("ab" * 30)) // periodic: maximal hash ties in every window
    sampledVsExact(Seq(
      1L -> s"noise   $span   more noise",          // verbatim, hits
      2L -> s"noise ${span.replace(" jump ", "  jump ")} tail", // perturbed, 0
      3L -> "completely unrelated text that is long enough to have grams",
      4L -> "short doc",                            // < minLen
      5L -> ("xy" + "ab" * 40 + "yx"),              // periodic overlap + ties
      6L -> (span + " mid gap filler " + span),     // TWO disjoint runs
      7L -> s"${span.take(35)} then ${span.drop(10)}" // overlapping intervals
    ), bench, minLen = 32, k = 16)
    // a second geometry: odd minLen (no power-of-two restriction) and
    // a window as small as it gets (k = minLen - 1 -> w = 2)
    sampledVsExact(Seq(1L -> s"aa$span", 2L -> span.reverse),
      bench, minLen = 33, k = 32)
  }

  test("verbatimContaminationSampled == verbatimContamination on the sf corpus split") {
    val d = graft.Tables.documents(spark, graft.SparkTestSession.Sf)
    val corpus = d.filter(col("doc_id") % 20 =!= 0)
    val bench = d.filter(col("doc_id") % 20 === 0)
    def rows(got: org.apache.spark.sql.DataFrame) =
      got.orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(rows(Decontaminate.verbatimContaminationSampled(corpus, bench,
        col("doc_id"), col("text"), minLen = 32, k = 16)) ==
      rows(Decontaminate.verbatimContamination(corpus, bench,
        col("doc_id"), col("text"), minLen = 32)))
  }

  test("probeVerbatim against a standing VerbatimIndex == the one-shot sampled operator") {
    val d = graft.Tables.documents(spark, graft.SparkTestSession.Sf)
    val corpus = d.filter(col("doc_id") % 20 =!= 0)
    val bench = d.filter(col("doc_id") % 20 === 0)
    val idx = Decontaminate.buildVerbatimIndex(bench, col("doc_id"),
      col("text"), minLen = 32, k = 16)
    assert(idx.minLen == 32 && idx.k == 16)
    def rows(got: org.apache.spark.sql.DataFrame) =
      got.orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    val probed = rows(Decontaminate.probeVerbatim(idx, corpus,
      col("doc_id"), col("text")))
    assert(probed == rows(Decontaminate.verbatimContaminationSampled(
      corpus, bench, col("doc_id"), col("text"), minLen = 32, k = 16)))
    // probing twice off the same artifact is stable (the index frames
    // are checkpointed — nothing rebuilds or drifts between probes)
    assert(probed == rows(Decontaminate.probeVerbatim(idx, corpus,
      col("doc_id"), col("text"))))
    assert(probed.exists(_._3 > 0L), "sf split should contaminate at least one doc")
  }

  test("winnowed fingerprints are a small fraction of gram positions") {
    val d = graft.Tables.documents(spark, graft.SparkTestSession.Sf)
      .select(col("doc_id"), col("text").as("t"))
    val all = SuffixArray.gramFps(d, 16).count()
    val sel = SuffixArray.winnowedFps(d, 16, 17).count()
    // expected density ~2/(w+1) ≈ 11%; assert the order of magnitude
    assert(sel * 4 < all, s"winnowed $sel of $all grams — not sampled?")
    assert(sel > 0)
  }
}
