package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Salience ranking: rare terms outrank stopwords, scores are exact
  * rationals (tf*N/df), tie-break is deterministic, k bounds held.
  */
class TfidfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat"),        // "the" in every doc, "cat"/"sat" only here
    (2L, "the dog ran ran"),
    (3L, "the dog swam")).toDF("doc_id", "text")

  test("rare terms outrank corpus-wide terms; scores exact") {
    val top1 = Tfidf.topTerms(docs, col("doc_id"), col("text"), k = 1)
      .select("id", "term", "score")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    // doc 2: "ran" tf=2 df=1 -> 2*3/1 = 6; doc 3: "swam" 1*3/1 = 3
    assert(top1(1) == ((2L, "ran", 6.0)))
    assert(top1(2) == ((3L, "swam", 3.0)))
    // doc 1: cat and sat tie at 3.0; term-asc tie-break -> "cat"
    assert(top1(0) == ((1L, "cat", 3.0)))
  }

  test("k bounds the per-doc output; stopword ranks last") {
    val got = Tfidf.topTerms(docs, col("doc_id"), col("text"), k = 3)
      .filter(col("id") === 1L)
      .orderBy(desc("score"), asc("term"))
      .select("term").as[String].collect().toSeq
    // "the": tf=1 df=3 -> score 1, strictly below cat/sat (3.0)
    assert(got == Seq("cat", "sat", "the"))
  }

  test("df counts documents, not occurrences") {
    val df2 = Tfidf.topTerms(docs, col("doc_id"), col("text"), k = 10)
      .filter(col("term") === "ran").select("df").as[Long].head()
    assert(df2 == 1L) // "ran" twice in one doc -> df 1
  }

  test("vocabCoverage: ranks by count, cum_frac reaches the exact share") {
    // 10 tokens total: the x3, ran x2, cat/sat/dog/swam x1 ... wait:
    // doc texts above: the,cat,sat | the,dog,ran,ran | the,dog,swam
    val v = Tfidf.vocabCoverage(docs, col("text"), topK = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // counts: the=3, dog=2, ran=2, cat=sat=swam=1 (total 10)
    // rank order: the(3), dog(2 - ties with ran, token asc), ran(2)
    assert(v == Seq(
      (1L, "the", 3L, 0.3),
      (2L, "dog", 2L, 0.5),
      (3L, "ran", 2L, 0.7)))
  }

  test("vocabCoverage: topK beyond vocab covers 100%") {
    val v = Tfidf.vocabCoverage(docs, col("text"), topK = 1000)
    val last = v.orderBy(desc("rk")).select("cum_frac").as[Double].head()
    assert(math.abs(last - 1.0) < 1e-12)
    assert(v.count() == 6)
  }

  test("vocabCoverage plans a TakeOrderedAndProject, not a global sort") {
    val plan = Tfidf.vocabCoverage(docs, col("text"), topK = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("sharedSalientPairs: topical pair found, overlap is exact sum(min(tf))") {
    val corpus = Seq(
      (1L, "quark lepton quark boson field"),
      (2L, "quark lepton gluon boson mass"),  // shares quark/lepton/boson with 1
      (3L, "poem verse stanza rhyme meter"),
      (4L, "verse poem sonnet couplet line")) // shares poem/verse with 3
      .toDF("doc_id", "text")
    val pairs = Tfidf.sharedSalientPairs(corpus, col("doc_id"), col("text"),
      k = 5, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(pairs.map(p => (p._1, p._2)) == Seq((1L, 2L), (3L, 4L)))
    val p12 = pairs.head
    assert(p12._3 == 3L, s"docs 1-2 share quark/lepton/boson: $p12")
    // each shared term has tf=1 on at least one side except quark
    // (tf 2 in doc 1, 1 in doc 2 -> min 1): overlap = 3
    assert(p12._4 == 3L)
  }

  test("hotTermAudit: the dropped boilerplate term is visible with its df_top") {
    // 'common' reaches every document's top-k (k=2 keeps both terms);
    // at maxPostings=5 its postings are capped — the audit must say so
    val corpus = (1L to 10L).map(i => (i, s"common common rare$i"))
      .toDF("doc_id", "text")
    val audit = Tfidf.hotTermAudit(corpus, col("doc_id"), col("text"),
      k = 2, maxPostings = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(audit == Set(("common", 10L)), s"got $audit")
    // and the capped op indeed drops the term's pairs silently — the
    // audit is the only place the drop is visible
    assert(Tfidf.sharedSalientPairs(corpus, col("doc_id"), col("text"),
      k = 2, minShared = 1, maxPostings = 5).count() == 0)
    assert(Tfidf.hotTermAudit(corpus, col("doc_id"), col("text"),
      k = 2, maxPostings = 100).count() == 0)
  }

  test("sharedSalientPairs: id_a < id_b and no self pairs") {
    val pairs = Tfidf.sharedSalientPairs(docs, col("doc_id"), col("text"),
      k = 3, minShared = 1).collect()
    pairs.foreach(r => assert(r.getLong(0) < r.getLong(1)))
  }

  test("cache: two DIFFERENT doc frames under the SAME cacheKey get distinct results") {
    // the artifact cache must key on the input plan's semantics, not
    // the caller's string — a filtered/different frame with a reused
    // cacheKey must never be served the other frame's pair table
    val corpusA = Seq(
      (1L, "quark lepton boson field theory"),
      (2L, "quark lepton boson mass spin")).toDF("doc_id", "text")
    val corpusB = Seq(
      (7L, "sonnet couplet rhyme verse poem"),
      (8L, "sonnet couplet rhyme stanza line")).toDF("doc_id", "text")
    val key = Some("same-key-different-frames")
    val a = Tfidf.sharedSalientPairs(corpusA, col("doc_id"), col("text"),
      k = 5, minShared = 2, cacheKey = key)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val b = Tfidf.sharedSalientPairs(corpusB, col("doc_id"), col("text"),
      k = 5, minShared = 2, cacheKey = key)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(a == Set((1L, 2L)), s"corpus A pairs: $a")
    assert(b == Set((7L, 8L)), s"corpus B pairs: $b")
  }

  test("cache: the same frame + key is served one shared build (plan identity)") {
    val corpus = Seq(
      (1L, "quark lepton boson field theory"),
      (2L, "quark lepton boson mass spin")).toDF("doc_id", "text")
    val key = Some("same-frame-same-key")
    val first = Tfidf.sharedSalientPairs(corpus, col("doc_id"), col("text"),
      k = 5, minShared = 2, cacheKey = key)
    val second = Tfidf.sharedSalientPairs(corpus, col("doc_id"), col("text"),
      k = 5, minShared = 2, cacheKey = key)
    // the cached artifact is returned as the SAME DataFrame instance —
    // the localCheckpoint built once, not a second pipeline
    assert(first eq second)
  }

  test("sharedSalientPairs: maxPostings drops corpus-wide hot terms") {
    // every doc's text is identical -> every term is in every top-k;
    // a cap of 2 postings drops all terms across 3 docs -> no pairs
    val same = Seq((1L, "alpha beta"), (2L, "alpha beta"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val capped = Tfidf.sharedSalientPairs(same, col("doc_id"), col("text"),
      k = 2, minShared = 1, maxPostings = 2)
    assert(capped.count() == 0L)
    val uncapped = Tfidf.sharedSalientPairs(same, col("doc_id"), col("text"),
      k = 2, minShared = 1)
    assert(uncapped.count() == 3L) // all three pairs
  }

  test("DfStats: extend == retrain on the union; terms crossing the split add") {
    import spark.implicits._
    // "shared" lives in BOTH waves so its df must add across the fold
    val waveA = Seq((0L, "shared alpha alpha"), (2L, "shared beta"))
      .toDF("doc_id", "text")
    val waveB = Seq((4L, "shared gamma"), (6L, "delta"))
      .toDF("doc_id", "text")
    val folded = Tfidf.extendDfStats(
      Tfidf.trainDfStats(waveA, col("doc_id"), col("text")),
      waveB, col("doc_id"), col("text"))
    val retrained = Tfidf.trainDfStats(waveA.unionByName(waveB),
      col("doc_id"), col("text"))
    assert(folded.nDocs == 4L && retrained.nDocs == 4L)
    def rows(m: Tfidf.DfStats) = m.df.orderBy("term")
      .as[(String, Long)].collect().toSeq
    assert(rows(folded) == rows(retrained))
    assert(rows(folded).toMap.apply("shared") == 3L)
  }

  test("DfStats: save/load round-trips; the loaded model scores identically; unseen df=1") {
    import spark.implicits._
    val corpus = Seq((0L, "alpha beta"), (2L, "alpha gamma"))
      .toDF("doc_id", "text")
    val m = Tfidf.trainDfStats(corpus, col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("df_stats").toString
    Tfidf.saveDfStats(m, dir)
    val loaded = Tfidf.loadDfStats(spark, dir)
    assert(loaded.nDocs == m.nDocs)
    val batch = Seq((1L, "alpha zeta zeta")).toDF("doc_id", "text")
    def score(mm: Tfidf.DfStats) =
      Tfidf.topTermsAgainst(mm, batch, col("doc_id"), col("text"), k = 3)
        .orderBy("term").as[(Long, String, Long, Long, Double)].collect().toSeq
    val got = score(loaded)
    assert(got == score(m))
    // unseen "zeta" prices at df=1: score = tf*N/1 = 2*2 = 4.0, and
    // outranks the corpus-wide "alpha" (df=2 → 1*2/2 = 1.0)
    assert(got.find(_._2 == "zeta").get._4 == 1L)
    assert(got.find(_._2 == "zeta").get._5 == 4.0)
    assert(got.find(_._2 == "alpha").get._5 == 1.0)
  }
}
