package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.functions.kernels

/** E3 depth: the unigram-LM (SentencePiece-style) tokenizer — hard-EM
  * training, Viterbi segmentation, and the integer determinism that
  * makes both oracle-replayable.
  */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def il(x: Long) = kernels.ilog2fp(x)

  test("segmentBlock: picks the cheapest split, smallest-start ties") {
    // P(ab) high => "abc" segments as [ab, c], not [a, b, c]
    val counts = Seq("ab" -> 10L, "a" -> 1L, "b" -> 1L, "c" -> 1L)
    val t = counts.map(_._2).sum; val v = counts.size.toLong
    val cost = counts.map { case (p, c) => p -> (il(t + v) - il(c + 1)) }.toMap
    assert(Unigram.segmentBlock("abc", cost) == Seq("ab", "c"))
    assert(Unigram.segmentBlock("cab", cost) == Seq("c", "ab"))
    // all-equal costs: every split of "aa" costs the same number of
    // pieces; the DP must still be deterministic (smallest start wins
    // at each position => single-char walk)
    val flat = Map("a" -> 100L, "aa" -> 100L).map {
      case (p, c) => p -> (il(203 + 2) - il(c + 1))
    }
    assert(Unigram.segmentBlock("aa", flat) == Seq("aa"),
      "two-piece split costs double one equal-cost piece")
    // missing pieces never break coverage: chars always present
    val charsOnly = Map("x" -> (il(3) - il(2)), "y" -> (il(3) - il(2)))
    assert(Unigram.segmentBlock("xyx", charsOnly) == Seq("x", "y", "x"))
  }

  test("blocks: words beyond MaxWordLen segment per independent block") {
    val w = "abcdefghijklmnopqrstuvwxyz" // 26 chars -> 12 + 12 + 2
    assert(Unigram.blocks(w) == Seq("abcdefghijkl", "mnopqrstuvwx", "yz"))
    assert(Unigram.blocks("short") == Seq("short"))
  }

  test("codepoint contract: non-BMP text never splits a surrogate pair") {
    // U+1F600 is two UTF-16 code units; blocks and the DP must index
    // by CODEPOINTS (matching Spark-SQL substring and DuckDB substr),
    // never carving lone surrogates
    val emoji = "😀" // 😀
    val w = emoji * 13 // 13 codepoints = 26 code units -> blocks 12 + 1
    assert(Unigram.blocks(w) == Seq(emoji * 12, emoji))
    val cost = Map(emoji -> 0L, (emoji + emoji) -> 0L)
    Unigram.segmentBlock(emoji * 3, cost).foreach { p =>
      assert(!p.exists(c => Character.isHighSurrogate(c) &&
        p.indexOf(c) == p.length - 1), s"lone surrogate in piece [$p]")
      assert(cost.contains(p), s"piece [$p] not a whole-codepoint vocab entry")
    }
    // end-to-end: a tiny corpus with a supplementary-plane word trains
    // and tokenizes consistently (UDF segmentation == SQL-side counts)
    val docs = Seq((1L, s"$emoji$emoji ab ab"), (2L, s"ab $emoji$emoji"))
      .toDF("doc_id", "text")
    val model = Unigram.train(docs, col("text"))
    val out = Unigram.tokenCounts(docs, col("doc_id"), col("text"), model)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out.map(_._2) == Seq(3L, 2L), "word counts")
    assert(out.forall(_._4 < Unigram.Inf), "no <unk>-priced pieces on own corpus")
    val pieces = model.vocab.collect().map(_.getString(0))
    assert(pieces.forall(p => p.codePointCount(0, p.length) <= Unigram.MaxPieceLen))
  }

  test("train: deterministic vocab, chars kept, budget respected") {
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val m1 = Unigram.train(docs, col("text")).vocab
      .orderBy(desc("cnt"), asc("piece")).collect().map(_.toSeq).toSeq
    val m2 = Unigram.train(docs, col("text")).vocab
      .orderBy(desc("cnt"), asc("piece")).collect().map(_.toSeq).toSeq
    assert(m1 == m2, "training must be partitioning-independent")
    val pieces = m1.map(_.head.asInstanceOf[String])
    assert(pieces.forall(_.length <= Unigram.MaxPieceLen))
    val chars = pieces.filter(_.length == 1).toSet
    val corpusChars = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .select(explode(expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))")))
      .distinct().as[String].collect().toSet
    assert(corpusChars.subsetOf(chars), "every corpus char stays in vocab")
    assert(pieces.count(_.length > 1) <= Unigram.VocabSize)
  }

  test("train: extend the word table == full retrain") {
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val isNew = col("doc_id") % 5 === 0
    val folded = Bpe.extendWordFreq(
      Bpe.wordFreq(docs.filter(!isNew), col("text")),
      docs.filter(isNew), col("text"))
    val a = Unigram.trainFromWords(folded).vocab
      .orderBy(desc("cnt"), asc("piece")).collect().map(_.toSeq).toSeq
    val b = Unigram.train(docs, col("text")).vocab
      .orderBy(desc("cnt"), asc("piece")).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("tokenCounts: per-doc totals replay from the segmenter; lossless") {
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val model = Unigram.train(docs, col("text"))
    val cost = model.vocab.collect()
      .map(r => (r.getString(0), r.getLong(2))).toMap
    val out = Unigram.tokenCounts(docs, col("doc_id"), col("text"), model)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect().toSeq
    val expected = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq.sortBy(_._1)
      .map { case (id, text) =>
        val words = text.split(" ").filter(_.nonEmpty)
        val segs = words.map(w =>
          Unigram.blocks(w).flatMap(b => Unigram.segmentBlock(b, cost)))
        // lossless: pieces concatenate back to the word
        words.zip(segs).foreach { case (w, s) => assert(s.mkString == w) }
        (id, words.length.toLong, segs.map(_.length.toLong).sum,
          segs.flatten.map(cost).sum)
      }
    assert(out == expected)
  }

  test("plans: tokenize is one corpus pass with broadcast word stats") {
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val model = Unigram.train(docs, col("text"))
    val plan = Unigram.tokenCounts(docs, col("doc_id"), col("text"), model)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
  }
}
