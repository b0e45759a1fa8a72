package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.functions.{kernels, ArrayExprs}

/** E3/E5 depth: LM perplexity scoring + DSIR importance weights, and
  * the portable fixed-point log2 kernel they price logprobs in.
  */
class LmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- the ilog2fp kernel ----

  test("ilog2fp: exact on powers of two, bounded error elsewhere") {
    assert(kernels.ilog2fp(1L) == 0L)
    assert(kernels.ilog2fp(2L) == 65536L)
    assert(kernels.ilog2fp(1L << 30) == 30L * 65536)
    assert(kernels.ilog2fp(1L << 62) == 62L * 65536)
    // max error vs true log2 < 2^-14 bits (measured 1.5e-5 over 5k
    // random longs when the DuckDB fold was cross-checked)
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val x = math.abs(rnd.nextLong()) max 1L
      val err = math.abs(kernels.ilog2fp(x) / 65536.0 -
        math.log(x.toDouble) / math.log(2.0))
      assert(err < 6.2e-5, s"x=$x err=$err")
    }
  }

  test("ilog2fp: monotone non-decreasing and loud on non-positive") {
    val rnd = new scala.util.Random(11)
    val xs = (1 to 500).map(_ => math.abs(rnd.nextLong()) max 1L).sorted
    xs.sliding(2).foreach { case Seq(a, b) =>
      assert(kernels.ilog2fp(a) <= kernels.ilog2fp(b))
    }
    intercept[IllegalArgumentException](kernels.ilog2fp(0L))
    intercept[IllegalArgumentException](kernels.ilog2fp(-5L))
  }

  test("ilog2fp: Column expression == kernel (codegen path)") {
    val vals = Seq(1L, 2L, 3L, 7L, 65536L, (1L << 31) - 1, 1L << 31,
      (1L << 40) + 12345L, Long.MaxValue)
    val got = vals.toDF("x")
      .select(ArrayExprs.ilog2fp(col("x"))).as[Long].collect()
    assert(got.toSeq == vals.map(kernels.ilog2fp))
  }

  // ---- perplexity ----

  test("perplexity: hand-checked bigram model on a toy corpus") {
    // reference doc (is_ref): "a b a b a b" -> all tokens >= MinCount
    // needs counts >= 5, so repeat: a x6, b x6
    val ref = "a b a b a b a b a b a b"
    val docs = Seq(
      (1L, ref, "en"),
      (2L, "a b a b", "de"), // in-vocab bigrams only
      (3L, "a z", "de") // z is OOV -> <unk>
    ).toDF("doc_id", "text", "lang")
    val out = Lm.perplexity(docs, col("lang") === lit("en"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    // vocab = {a, b} (6 >= 5 each), V = 3
    // ref bigrams: (a,b) x6, (b,a) x5 -> c1(a)=6, c1(b)=5
    val il = kernels.ilog2fp _
    val lpAB = il(6L + 1) - il(6L + 3) // P(b|a) = 7/9
    val lpBA = il(5L + 1) - il(5L + 3) // P(a|b) = 6/8
    // doc 1: 11 bigrams (6 ab + 5 ba)
    val nll1 = -(6 * lpAB + 5 * lpBA)
    // doc 2: ab, ba, ab
    val nll2 = -(2 * lpAB + lpBA)
    // doc 3: one bigram (a, <unk>): unseen bigram, prefix a ->
    // backoff = -il(c1(a) + V) = -il(9)
    val nll3 = il(9L)
    assert(out == Seq(
      (1L, 11L, nll1, nll1 / 11),
      (2L, 3L, nll2, nll2 / 3),
      (3L, 1L, nll3, nll3 / 1)))
  }

  test("perplexity: reference-language docs score lower at sf0.001") {
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val out = Lm.perplexity(docs, col("lang") === lit("en"))
      .join(docs.select("doc_id", "lang"), "doc_id")
    val Seq((enBits, otherBits)) = out
      .agg(
        avg(when(col("lang") === "en", col("bits_fp"))).as("en"),
        avg(when(col("lang") =!= "en", col("bits_fp"))).as("other"))
      .as[(Double, Double)].collect().toSeq
    assert(enBits < otherBits,
      s"en mean bits $enBits should beat non-en $otherBits")
  }

  test("perplexity: docs with <2 tokens or null text are dropped") {
    val docs = Seq(
      (1L, "a b a b a b a b a b", "en"),
      (2L, "solo", "en"),
      (3L, null.asInstanceOf[String], "en"),
      (4L, "   ", "en")
    ).toDF("doc_id", "text", "lang")
    val ids = Lm.perplexity(docs, col("lang") === lit("en"))
      .select("doc_id").as[Long].collect().toSeq
    assert(ids == Seq(1L))
  }

  test("perplexityBuckets: equi-depth tertiles ordered by score") {
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val out = Lm.perplexityBuckets(docs, col("lang") === lit("en"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.map(_._3).toSet == Set(1L, 2L, 3L))
    // bucket is monotone in the score: every head doc scores <= every
    // tail doc, with any boundary ties sharing one bucket
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket(1L).max <= byBucket(2L).min)
    assert(byBucket(2L).max <= byBucket(3L).min)
    // equi-depth up to value-run granularity: no bucket under 20%
    val n = out.size.toDouble
    byBucket.values.foreach(b => assert(b.size / n > 0.2))
  }

  // ---- the durable model ----

  test("extend == full retrain; saved model round-trips bit-exactly") {
    // plant a word that crosses the MinCount cutoff ONLY when the
    // new batch is folded in (3 + 2 occurrences) — a post-cutoff
    // artifact could never replay this; the additive one must
    val planted = Seq(
      (9000001L, "zzqv zzqv zzqv filler", "en"),
      (9000002L, "zzqv zzqv filler tail", "en")
    ).toDF("doc_id", "text", "lang")
      .withColumn("source", lit("src0")).withColumn("n_chars", lit(0L))
    val docs = Tables.documents(spark, SparkTestSession.Sf)
      .unionByName(planted)
    val en = col("lang") === lit("en")
    // 3 occurrences (doc 9000001) stay in the old slice; the 2 that
    // tip the count over the cutoff (doc 9000002) arrive in the new
    val isNew = col("doc_id") % 3 === 0 || col("doc_id") === 9000002L
    val oldDocs = docs.filter(!isNew)
    val newDocs = docs.filter(isNew)
    val full = Lm.trainCounts(docs, en)
    val oldCounts = Lm.trainCounts(oldDocs, en)
    val inc = Lm.extend(oldCounts, newDocs, en)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    val scoreFull = rows(Lm.scoreWith(full, docs))
    val scoreInc = rows(Lm.scoreWith(inc, docs))
    assert(scoreInc == scoreFull,
      "fold-in extension must reproduce the full retrain's scores")
    // the planted word is below the cutoff on the old slice alone
    // and inside the vocabulary only after the extension
    def inVocab(m: Lm.LmModel) = m.words
      .filter(col("w") === "zzqv" && col("c") >= Lm.MinCount).count() == 1
    assert(!inVocab(oldCounts) && inVocab(inc),
      "planted word should cross the vocab cutoff only after extend")
    val path = java.nio.file.Files.createTempDirectory("lm_model").toString
    Lm.saveModel(inc, path)
    val scoreLoaded = rows(Lm.scoreWith(Lm.loadModel(spark, path), docs))
    assert(scoreLoaded == scoreFull)
  }

  test("DSIR model: extend == full recount; artifact round-trips") {
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val en = col("lang") === lit("en")
    val isNew = col("doc_id") % 4 === 0
    val full = Lm.dsirCounts(docs, en)
    val inc = Lm.extendDsir(Lm.dsirCounts(docs.filter(!isNew), en),
      docs.filter(isNew), en)
    val a = Lm.dsirWeightsWith(full, docs).collect().map(_.toSeq).toSeq
    val b = Lm.dsirWeightsWith(inc, docs).collect().map(_.toSeq).toSeq
    assert(a == b, "fold-in extension must reproduce the full recount")
    assert(a == Lm.dsirWeights(docs, en).collect().map(_.toSeq).toSeq)
    val path = java.nio.file.Files.createTempDirectory("dsir_model").toString
    Lm.saveDsir(inc, path)
    val c = Lm.dsirWeightsWith(Lm.loadDsir(spark, path), docs)
      .collect().map(_.toSeq).toSeq
    assert(c == a)
    // the artifact is bucket-bounded — never more rows than Buckets
    assert(Lm.loadDsir(spark, path).bk.count() <= Lm.Buckets)
  }

  test("DSIR scoring: occurrences in buckets the model never saw get the smoothed arm") {
    import graft.functions.kernels
    // train on one vocabulary, score a doc whose words hash into
    // buckets the model cannot have touched (disjoint tokens)
    val trainDocs = Seq((1L, "aa bb aa bb", "en"), (2L, "aa bb cc", "de"))
      .toDF("doc_id", "text", "lang")
    val model = Lm.dsirCounts(trainDocs, col("lang") === lit("en"))
    val novel = Seq((10L, "qqxz wwvk")).toDF("doc_id", "text")
      .withColumn("lang", lit("de"))
    val out = Lm.dsirWeightsWith(model, novel)
      .as[(Long, Long, Long)].collect().toSeq
    // the doc must be present with ALL THREE feature occurrences
    // (2 unigrams + 1 bigram), not silently truncated
    assert(out.map(o => (o._1, o._2)) == Seq((10L, 3L)))
    // and its weight is exactly 3x the zero-count smoothed arm
    val Seq((rtGot, ttGot)) = model.bk
      .agg(sum(col("r")), sum(col("t"))).as[(Long, Long)].collect().toSeq
    val w0 = kernels.ilog2fp(rtGot + Lm.Buckets) -
      kernels.ilog2fp(ttGot + Lm.Buckets)
    assert(out.head._3 == 3L * w0)
  }

  // ---- DSIR ----

  test("dsirWeights: target-like docs outrank, order is (w desc, id)") {
    // target slice speaks {aa bb cc}; the distractors speak {xx yy}
    val docs = (
      (1L to 10L).map(i => (i, "aa bb cc aa bb cc", "en")) ++
        (11L to 14L).map(i => (i, "aa bb cc aa bb cc", "de")) ++
        (15L to 30L).map(i => (i, "xx yy xx yy xx yy", "de"))
      ).toDF("doc_id", "text", "lang")
    val out = Lm.dsirWeights(docs, col("lang") === lit("en"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out.size == 30.min(Lm.TopK))
    // weights non-increasing, ties by doc_id
    out.sliding(2).foreach { case Seq(a, b) =>
      assert(a._3 > b._3 || (a._3 == b._3 && a._1 < b._1))
    }
    // every target-vocab doc (1-14) beats every distractor (15-30)
    val rankOf = out.map(_._1).zipWithIndex.toMap
    assert((1L to 14L).map(rankOf).max < (15L to 30L).map(rankOf).min)
  }

  test("dsirWeights: top slice is target-enriched at sf0.001") {
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val out = Lm.dsirWeights(docs, col("lang") === lit("en"))
      .join(docs.select("doc_id", "lang"), "doc_id")
    val n = out.count()
    val en = out.filter(col("lang") === "en").count()
    val baseEn = docs.filter(col("lang") === "en").count().toDouble /
      docs.count()
    assert(en.toDouble / n > baseEn,
      s"top-$n en share ${en.toDouble / n} should beat base rate $baseEn")
  }

  // ---- dsirSample (Gumbel-top-k importance resampling) ----

  test("dsirSample: keys are weight + the seeded Gumbel arm, exactly") {
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val en = col("lang") === lit("en")
    val model = Lm.dsirCounts(docs, en)
    val out = Lm.dsirSampleWith(model, docs)
      .as[(Long, Long, Long)].collect().toSeq
    val n = docs.count()
    assert(out.size == math.min(Lm.SampleK.toLong, n).toInt)
    assert(out.map(_._1).distinct.size == out.size, "without replacement")
    // keys sorted (desc, doc_id asc on ties)
    assert(out == out.sortBy { case (id, _, k) => (-k, id) })
    // each key replays from doc_id + weight alone
    val m = 2147483647L
    out.foreach { case (id, w, key) =>
      val x0 = (id + Lm.SampleSeed) % (m - 1) + 1
      val h = (((x0 * 48271L) % m) * 48271L) % m
      val eFp = 31L * 65536 - kernels.ilog2fp(h)
      assert(key == w + 16L * 65536 - kernels.ilog2fp(eFp),
        s"doc $id key mismatch")
    }
  }

  test("dsirSample: seed changes the draw; heavy weights win more") {
    // 1 target doc, 1 target-like raw doc (high weight), 18 junk docs
    val docs = ((1L, "good clean text tokens good clean", "en") +:
      (2L, "good clean text tokens clean good", "xx") +:
      (3L to 20L).map(i => (i, s"junk noise junk blob noise$i junk", "xx")))
      .toDF("doc_id", "text", "lang")
    val model = Lm.dsirCounts(docs, col("lang") === lit("en"))
    val draws = (1 to 12).map { s =>
      Lm.dsirSampleWith(model, docs, k = 3, seed = 1000L * s)
        .select("doc_id").as[Long].collect().toSet
    }
    assert(draws.distinct.size > 1, "different seeds should vary the draw")
    // the two target-like docs carry far more weight than any junk doc:
    // they should make the top-3 in a clear majority of draws
    val hits = draws.count(d => d.contains(1L) && d.contains(2L))
    assert(hits >= 8, s"target-like docs sampled in only $hits/12 draws")
  }

  // ---- plan shape ----

  test("plans: model lookups broadcast; no sort-merge join anywhere") {
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    Seq(
      Lm.perplexity(docs, col("lang") === lit("en")),
      Lm.dsirWeights(docs, col("lang") === lit("en")),
      Lm.dsirSample(docs, col("lang") === lit("en"))
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"), "expected broadcast lookups")
      assert(!plan.contains("SortMergeJoin"),
        "a corpus-side sort-merge join means a model table was not broadcast")
      assert(!plan.contains("CartesianProduct"),
        "scalar attach must be a broadcast nested loop, not a cartesian")
    }
  }
}
