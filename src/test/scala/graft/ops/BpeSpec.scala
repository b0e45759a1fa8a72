package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** E3 depth: BPE merge training / application. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mergeStep is left-to-right non-overlapping greedy") {
    assert(Bpe.mergeStep(Seq("a", "b", "c"), "a", "b") == Seq("ab", "c"))
    // overlapping run: [a,a,a] merges the FIRST pair only
    assert(Bpe.mergeStep(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.mergeStep(Seq("a", "a", "a", "a"), "a", "a") == Seq("aa", "aa"))
    // a fresh merge never cascades into the symbol it just produced
    assert(Bpe.mergeStep(Seq("a", "b", "b"), "a", "b") == Seq("ab", "b"))
    // merged symbols participate as single units
    assert(Bpe.mergeStep(Seq("ab", "b", "b"), "ab", "b") == Seq("abb", "b"))
    assert(Bpe.mergeStep(Seq.empty, "a", "b") == Seq.empty)
  }

  test("train learns the classic merges on a skewed toy corpus") {
    val docs = Seq(
      (1L, "low low low lower lower"),
      (2L, "low lowest newest newest newest")).toDF("doc_id", "text")
    val model = Bpe.train(docs, col("text"), nMerges = 4)
    val merges = model.merges.orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq
    // 'lo'+'w' dominates: "low"-prefixed words appear 7 times.
    // rank 0: (l,o) cnt 7; rank 1: (lo,w) cnt 7; then es/est family
    assert(merges.head._2 == "l" && merges.head._3 == "o" && merges.head._4 == 7L)
    assert(merges(1)._2 == "lo" && merges(1)._3 == "w" && merges(1)._4 == 7L)
    // vocab end-state equals applying the merge list in rank order
    val pairs = merges.map(m => (m._2, m._3))
    model.vocab.select(col("word"), col("syms")).as[(String, Seq[String])]
      .collect().foreach { case (w, syms) =>
        assert(syms == Bpe.applyMerges(w.map(_.toString), pairs),
          s"vocab end-state != applyMerges for '$w'")
      }
  }

  test("tie-break is (cnt DESC, lft, rgt) lexicographic") {
    // 'ab' and 'ba' pairs both appear exactly twice -> 'a','b' wins
    val docs = Seq((1L, "ab ab ba ba")).toDF("doc_id", "text")
    val m = Bpe.train(docs, col("text"), nMerges = 1).merges
      .as[(Int, String, String, Long)].collect()(0)
    assert((m._2, m._3, m._4) == ("a", "b", 2L))
  }

  test("tokenCounts sums final segment lengths per document") {
    val docs = Seq(
      (1L, "low low newest"),
      (2L, "lower")).toDF("doc_id", "text")
    val model = Bpe.train(docs, col("text"), nMerges = 3)
    val lens = model.vocab.select(col("word"), size(col("syms")))
      .as[(String, Int)].collect().toMap
    val got = Bpe.tokenCounts(docs, col("doc_id"), col("text"), model)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, (2 * lens("low") + lens("newest")).toLong),
      (2L, 1L, lens("lower").toLong)))
  }

  test("train stops early when no pairs remain") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val model = Bpe.train(docs, col("text"), nMerges = 10)
    assert(model.merges.count() == 1) // (a,b) then every word is one symbol
    assert(model.vocab.select(col("syms")).as[Seq[String]].collect()
      .forall(_ == Seq("ab")))
  }

  test("extendWordFreq: fold-in then retrain == train on the full corpus") {
    val old = Seq((1L, "low low low lower"), (2L, "low newest")).toDF("doc_id", "text")
    val fresh = Seq((3L, "newest newest widest low")).toDF("doc_id", "text")
    val standing = Bpe.wordFreq(old, col("text"))
    val extended = Bpe.extendWordFreq(standing, fresh, col("text"))
    val a = Bpe.trainFromWords(extended, nMerges = 5).merges
      .orderBy("rank").collect().toSeq
    val b = Bpe.train(old.unionByName(fresh), col("text"), nMerges = 5).merges
      .orderBy("rank").collect().toSeq
    assert(a == b, "maintained-artifact retrain diverged from full retrain")
    // the extended table has exact union counts
    val m = extended.as[(String, Long)].collect().toMap
    assert(m("low") == 5L && m("newest") == 3L && m("widest") == 1L)
  }

  test("tokenIds: chars lexicographic from 0, merges at C + rank, ids dense") {
    val docs = Seq((1L, "ab ab ba b")).toDF("doc_id", "text")
    val model = Bpe.train(docs, col("text"), nMerges = 1) // learns (a,b)
    val ids = Bpe.tokenIds(model).orderBy("token_id")
      .as[(Long, String, String)].collect().toSeq
    assert(ids == Seq((0L, "a", "char"), (1L, "b", "char"), (2L, "ab", "merge")))
  }

  test("segmentation is lossless: concatenated symbols reconstruct every word") {
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val model = Bpe.train(docs, col("text"), nMerges = 12)
    val bad = model.vocab.select(col("word"), col("syms"))
      .as[(String, Seq[String])].collect()
      .filter { case (w, syms) => syms.mkString != w }
    assert(bad.isEmpty, s"lossy segmentation for: ${bad.take(5).toSeq}")
  }

  test("OOV segmentation splits by codepoints: non-BMP words never carve surrogates") {
    // training enumerates symbols codepoint-wise (Spark-SQL substring);
    // the OOV arm must agree — a UTF-16 code-unit split counts 𝕏 (one
    // codepoint, two code units) as 2 symbols and desyncs n_tokens
    // from training semantics on real multilingual crawl
    assert(Bpe.codepointSyms("𝕏𝕏a") ==
      Seq("𝕏", "𝕏", "a"))
    val train = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val model = Bpe.train(train, col("text"), nMerges = 2)
    // astral-plane OOV word: 3 codepoints (𝕏𝕏a), 5 UTF-16 units
    val docs = Seq((9L, "𝕏𝕏a low")).toDF("doc_id", "text")
    val got = Bpe.tokenCounts(docs, col("doc_id"), col("text"), model)
      .as[(Long, Long, Long)].collect().toSeq
    val lowLen = model.vocab.filter(col("word") === "low")
      .select(size(col("syms"))).as[Int].collect()(0)
    assert(got == Seq((9L, 2L, (3 + lowLen).toLong)),
      s"OOV token count not codepoint-based: $got")
    // lossless even through merges that DO apply inside a non-BMP word
    val m2 = Bpe.train(Seq((1L, "𝕏a 𝕏a")).toDF("doc_id", "text"),
      col("text"), nMerges = 1)
    val pairs = m2.merges.orderBy("rank").as[(Int, String, String, Long)]
      .collect().map(m => (m._2, m._3)).toSeq
    assert(Bpe.applyMerges(Bpe.codepointSyms("𝕏a𝕏a"), pairs)
      .mkString == "𝕏a𝕏a")
  }

  test("null and empty text: dropped from training, absent from counts") {
    val docs = Seq((1L, "ab ab"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val wf = Bpe.wordFreq(docs, col("text")).as[(String, Long)].collect().toMap
    assert(wf == Map("ab" -> 2L)) // null explodes to no rows, "" filtered
    val model = Bpe.train(docs, col("text"), nMerges = 2)
    assert(model.merges.count() == 1) // only (a,b); then exhausted
    val tc = Bpe.tokenCounts(docs, col("doc_id"), col("text"), model)
      .as[(Long, Long, Long)].collect().toSeq
    assert(tc == Seq((1L, 2L, 2L))) // wordless docs have no count row
  }

  test("sharedTrain == train; different keys/params never alias") {
    val docs = Seq((1L, "low low lower newest")).toDF("doc_id", "text")
    val a = Bpe.sharedTrain(docs, col("text"), 3, Some("k1"))
    val b = Bpe.train(docs, col("text"), 3)
    assert(a.merges.orderBy("rank").collect().toSeq ==
      b.merges.orderBy("rank").collect().toSeq)
    assert(a.vocab.orderBy("word").collect().toSeq ==
      b.vocab.orderBy("word").collect().toSeq)
    // a different merge count under the same key is a different artifact
    val c = Bpe.sharedTrain(docs, col("text"), 1, Some("k1"))
    assert(c.merges.count() == 1 && a.merges.count() == 3)
    // and tokenCounts through the shared model matches the direct one
    val x = Bpe.tokenCounts(docs, col("doc_id"), col("text"), a)
      .orderBy("doc_id").collect().toSeq
    val y = Bpe.tokenCounts(docs, col("doc_id"), col("text"), b)
      .orderBy("doc_id").collect().toSeq
    assert(x == y)
  }

  test("model save/load round-trips the artifact") {
    val docs = Seq((1L, "low low lower newest")).toDF("doc_id", "text")
    val model = Bpe.train(docs, col("text"), nMerges = 3)
    val dir = java.nio.file.Files.createTempDirectory("bpe_model").toString
    Bpe.saveModel(model, dir)
    val back = Bpe.loadModel(spark, dir)
    assert(back.merges.orderBy("rank").collect().toSeq ==
      model.merges.orderBy("rank").collect().toSeq)
    assert(back.vocab.orderBy("word").collect().toSeq ==
      model.vocab.orderBy("word").collect().toSeq)
    // the loaded vocab drives tokenCounts identically
    val a = Bpe.tokenCounts(docs, col("doc_id"), col("text"), model)
      .orderBy("doc_id").collect().toSeq
    val b = Bpe.tokenCounts(docs, col("doc_id"), col("text"), back)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
