package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** E2: dot/cosine kernels, brute-force top-k, LSH ANN recall. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dot product matches manual computation (float arrays)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b"))).as[Double].collect()(0)
    assert(got == (4.0 + 10.0 + 18.0))
  }
  test("cosine of identical vectors is 1.0") {
    val df = Seq((Array(0.5f, -0.25f), Array(0.5f, -0.25f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }
  test("brute-force top-k: k rows, descending, query row excluded") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val rows = Similarity.topKByCosine(e, 0L, 10).collect()
    assert(rows.length == 10)
    assert(!rows.map(_.getLong(0)).contains(0L))
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }
  test("ANN LSH recalls a planted near-identical vector") {
    // LSH recall is a function of similarity: near-identical vectors
    // collide in (essentially) every band. Plant a slightly-perturbed
    // copy of the query vector and require ANN to surface it first.
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val q = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).as[Seq[Float]].collect()(0)
    val planted = q.zipWithIndex.map { case (v, i) =>
      v + (if (i % 7 == 0) 0.001f else -0.001f)
    }
    val withPlant = e.unionByName(
      Seq((999999L, planted, 0)).toDF("vec_id", "embedding", "label"))
    val ann = Similarity.annTopK(withPlant, 0L, 5).collect()
    assert(ann.head.getLong(0) == 999999L)
    assert(ann.head.getDouble(1) > 0.99)
  }
  test("near-dup pairs are id_a < id_b and above threshold") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val rows = Similarity.nearDupPairs(e, col("label"), 0.30).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.30))
  }
}
