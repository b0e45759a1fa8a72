package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The standing-index maintenance guard: every id-bearing extend/probe
  * family must FAIL LOUDLY when a batch re-uses a standing id (the
  * re-crawled-duplicate case that would otherwise silently corrupt
  * the artifact — double-counted fingerprints, aliased pair members),
  * and must accept the same batch under `checkDisjoint = false` (the
  * documented opt-out for callers that can prove disjointness).
  */
class DisjointGuardSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(ids: Long*) =
    ids.map(i => (i, s"the quick brown fox $i jumps over the lazy dog " * 3))
      .toDF("doc_id", "text")

  private def assertGuard(what: String)(f: => Any): Unit = {
    // eager guards throw IllegalArgumentException at call time; the
    // scan-riding guards (KnnGraph.extend, dupPairsAgainst) surface as
    // a raise_error inside the fold's job, wrapped by Spark — walk the
    // cause chain, the loudness contract is the message
    val e = intercept[Throwable](f)
    def msgs(t: Throwable, depth: Int): List[String] =
      if (t == null || depth > 8) Nil
      else Option(t.getMessage).toList ::: msgs(t.getCause, depth + 1)
    val all = msgs(e, 0).mkString("\n")
    assert(all.contains("must be disjoint"), s"$what: $e")
    assert(all.contains(what), s"guard must name the operation: $e")
  }

  test("MinHash.extend rejects a batch that re-uses a standing id") {
    val idx = MinHash.buildIndex(docs(1, 2, 3), col("doc_id"), col("text"),
      shingleN = 3, k = 8, bands = 4)
    assertGuard("MinHash.extend") {
      MinHash.extend(idx, docs(3, 4), col("doc_id"), col("text")) }
    // disjoint batch folds; the opt-out also accepts
    MinHash.extend(idx, docs(4, 5), col("doc_id"), col("text"))
    MinHash.extend(idx, docs(3, 4), col("doc_id"), col("text"),
      checkDisjoint = false)
  }

  test("SubstringDedup.extendWinnowIndex and dupPairsAgainst reject id re-use") {
    val idx = SubstringDedup.buildWinnowIndex(docs(1, 2), col("doc_id"),
      col("text"), minLen = 16, k = 8)
    assertGuard("SubstringDedup.extendWinnowIndex") {
      SubstringDedup.extendWinnowIndex(idx, docs(2, 3), col("doc_id"),
        col("text")) }
    assertGuard("SubstringDedup.dupPairsAgainst") {
      SubstringDedup.dupPairsAgainst(idx, docs(1, 2), docs(2, 3),
        col("doc_id"), col("text")).collect() }
    assertGuard("SubstringDedup.dupPairsAgainst") {
      SubstringDedup.dupPairsAgainstCapped(idx, docs(1, 2), docs(2, 3),
        col("doc_id"), col("text")).collect() }
    SubstringDedup.extendWinnowIndex(idx, docs(3), col("doc_id"), col("text"))
    SubstringDedup.extendWinnowIndex(idx, docs(2, 3), col("doc_id"),
      col("text"), checkDisjoint = false)
  }

  test("SuffixArray.extendRepeatGroups rejects id re-use") {
    val standing = SuffixArray.trainRepeatGroups(docs(1, 2), col("doc_id"),
      col("text"), minLen = 16)
    assertGuard("SuffixArray.extendRepeatGroups") {
      SuffixArray.extendRepeatGroups(standing, docs(1, 2), docs(2, 3),
        col("doc_id"), col("text")) }
    SuffixArray.extendRepeatGroups(standing, docs(1, 2), docs(2, 3),
      col("doc_id"), col("text"), checkDisjoint = false)
  }

  test("KnnGraph.extend and extendLayered reject vec_id re-use") {
    val emb = graft.Tables.embeddings(spark, SparkTestSession.Sf)
      .select(col("vec_id"), col("embedding"))
    val old = emb.filter(col("vec_id") < 400)
    val g = KnnGraph.build(old, k = 5)
    assertGuard("KnnGraph.extend") {
      KnnGraph.extend(old, emb.filter(col("vec_id") >= 399), g, k = 5) }
    assertGuard("KnnGraph.extend") {
      KnnGraph.extendLayered(old, emb.filter(col("vec_id") >= 399),
        KnnGraph.buildLayered(old, g, k = 5, entryStep = 4L)) }
    KnnGraph.extend(old, emb.filter(col("vec_id") >= 399), g, k = 5,
      checkDisjoint = false)
  }

  test("Similarity.extendSemIndex rejects bench id re-use") {
    val emb = graft.Tables.embeddings(spark, SparkTestSession.Sf)
      .select(col("vec_id"), col("embedding"))
    val idx = Similarity.buildSemIndex(emb, emb.filter(col("vec_id") < 8))
    assertGuard("Similarity.extendSemIndex") {
      Similarity.extendSemIndex(idx,
        emb.filter(col("vec_id") >= 7 && col("vec_id") < 12)) }
    Similarity.extendSemIndex(idx,
      emb.filter(col("vec_id") >= 8 && col("vec_id") < 12))
  }

  test("PerceptualHash.extendHashIndex rejects pid re-use") {
    val hashes = Seq((1L, 0x1234L), (2L, 0x5678L)).toDF("pid", "ph")
    val idx = graft.multimodal.PerceptualHash.buildHashIndex(hashes)
    assertGuard("PerceptualHash.extendHashIndex") {
      graft.multimodal.PerceptualHash.extendHashIndex(idx,
        Seq((2L, 0x9abcL)).toDF("pid", "ph")) }
    graft.multimodal.PerceptualHash.extendHashIndex(idx,
      Seq((3L, 0x9abcL)).toDF("pid", "ph"))
    graft.multimodal.PerceptualHash.extendHashIndex(idx,
      Seq((2L, 0x9abcL)).toDF("pid", "ph"), checkDisjoint = false)
  }
}
