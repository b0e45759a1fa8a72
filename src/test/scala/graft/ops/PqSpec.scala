package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Product-quantization ANN: codebook shapes and normalization, code
  * range, index narrowness, and recall of the ADC+re-rank pipeline
  * against the exact brute-force baseline.
  */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val Dim = 64

  test("codebooks: [m][ks][d/m] shape, unit-norm entries, training moves seeds") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val books = Pq.trainCodebooks(e, Dim, m = 8, ks = 16, iterations = 2)
    assert(books.length == 8)
    assert(books.forall(_.length == 16))
    assert(books.forall(_.forall(_.length == Dim / 8)))
    // spherical k-means: every entry unit-L2 (or an untouched zero seed)
    books.flatten.foreach { c =>
      val n = math.sqrt(c.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-9 || n == 0.0, s"norm $n")
    }
    val seeded = Pq.trainCodebooks(e, Dim, m = 8, ks = 16, iterations = 0)
    assert(books.zip(seeded).exists { case (a, b) =>
      a.zip(b).exists { case (x, y) => !x.sameElements(y) }
    })
  }

  test("encode: m codes per vector, each in [0, ks)") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val books = Pq.trainCodebooks(e, Dim, m = 8, ks = 16, iterations = 1)
    val codes = Pq.encode(e, books).limit(50).collect()
    codes.foreach { r =>
      val cs = r.getSeq[Int](1)
      assert(cs.length == 8)
      assert(cs.forall(c => c >= 0 && c < 16))
    }
  }

  test("encode is narrow: no shuffle to build the code table") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val books = Pq.trainCodebooks(e, Dim, iterations = 0)
    val plan = Pq.encode(e, books).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"encode should be narrow:\n$plan")
  }

  test("pqTopK recall: the exact top hit survives ADC + re-rank; scores exact") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val exact = Similarity.topKByCosine(e, queryId = 3L, k = 10).collect()
    val pq = Pq.pqTopK(e, queryId = 3L, k = 10).collect()
    // re-ranked scores are true cosines, so any overlap matches exactly
    val exactByid = exact.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pq.foreach { r =>
      exactByid.get(r.getLong(0)).foreach(s => assert(r.getDouble(1) == s))
    }
    // recall@10 vs exact top-10 must clear 0.5 with rerank=100 over
    // a 200-vector sf0.001 corpus (generous: direction-only ADC)
    val overlap = pq.map(_.getLong(0)).toSet
      .intersect(exact.map(_.getLong(0)).toSet).size
    assert(overlap >= 5, s"recall@10 too low: $overlap/10")
    // and the single best neighbor is found
    assert(pq.head.getLong(0) == exact.head.getLong(0))
  }

  test("ivfPqTopK: cell restriction still recovers the exact top hit") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val exact = Similarity.topKByCosine(e, queryId = 3L, k = 10).collect()
    val ivfpq = Pq.ivfPqTopK(e, queryId = 3L, k = 10).collect()
    assert(ivfpq.nonEmpty)
    // scores of surviving candidates are exact cosines
    val exactById = exact.map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ivfpq.foreach { r =>
      exactById.get(r.getLong(0)).foreach(s => assert(r.getDouble(1) == s))
    }
    // with 4/16 cells probed the true nearest neighbor must land in a
    // probed cell for this query (pinned by seed-determinism)
    assert(ivfpq.head.getLong(0) == exact.head.getLong(0))
  }

  test("ivfPqTopKBatch: per-query rows match the single-query path") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val queries = e.filter(col("vec_id").isin(3L, 5L))
      .select(col("vec_id").as("query_id"), col("embedding"))
    val batch = Pq.ivfPqTopKBatch(e, queries, k = 10).collect()
      .groupBy(_.getLong(0))
    assert(batch.keySet == Set(3L, 5L))
    // query 3's slice of the batch == the single-query result, rank
    // for rank (same codebooks, same probes, same LUT doubles)
    val single = Pq.ivfPqTopK(e, queryId = 3L, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val slice3 = batch(3L).sortBy(_.getLong(3))
      .map(r => (r.getLong(1), r.getDouble(2))).toSeq
    assert(slice3 == single, s"batch=$slice3 single=$single")
  }

  test("pqTopKBatch == ivfPqTopKBatch probing every cell") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .sortBy(t => (t._1, t._4)).toSeq
    val full = key(Pq.pqTopKBatch(e, queries, k = 10).collect())
    val allCells = key(Pq.ivfPqTopKBatch(e, queries, k = 10,
      nCentroids = 16, nProbe = 16).collect())
    assert(full == allCells)
  }

  test("sharedCodebooks: train-once per frame+key; params and frames never alias") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val key = Some("pq-books-spec")
    val b1 = Pq.sharedCodebooks(e, Dim, cacheKey = key)
    val b2 = Pq.sharedCodebooks(e, Dim, cacheKey = key)
    assert(b1 eq b2) // one training, same arrays
    // different params under the same key: a separate training
    val b3 = Pq.sharedCodebooks(e, Dim, iterations = 1, cacheKey = key)
    assert(!(b3 eq b1))
    // a different frame under the same key: trained on ITS data
    val half = e.filter(col("vec_id") % 2 === 0)
    val b4 = Pq.sharedCodebooks(half, Dim, cacheKey = key)
    assert(!(b4 eq b1))
    // and the cached arrays equal an uncached training bit-for-bit
    val fresh = Pq.trainCodebooks(e, Dim)
    assert(b1.zip(fresh).forall { case (x, y) =>
      x.zip(y).forall { case (a, b) => a.sameElements(b) } })
  }

  test("ivfPqTopKBatch plan: queries broadcast, corpus never shuffled before the join") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val queries = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val plan = Pq.ivfPqTopKBatch(e, queries, k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"cell join should broadcast:\n$plan")
  }

  test("codebooks save/load round-trips bitwise; loaded books encode identically") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val books = Pq.trainCodebooks(e, Dim, m = 8, ks = 16, iterations = 1)
    val dir = java.nio.file.Files.createTempDirectory("pq_books").toString
    Pq.saveCodebooks(spark, books, dir)
    val back = Pq.loadCodebooks(spark, dir)
    assert(back.length == books.length &&
      back.zip(books).forall { case (x, y) =>
        x.zip(y).forall { case (a, b) => a.sameElements(b) } },
      "loaded codebooks differ bitwise")
    val a = Pq.encode(e, books).orderBy("vec_id").collect().toSeq
    val b = Pq.encode(e, back).orderBy("vec_id").collect().toSeq
    assert(a == b)
  }
}
