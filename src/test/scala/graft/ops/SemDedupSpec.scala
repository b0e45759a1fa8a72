package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** SemDeDup: cluster-blocked semantic dedup on an unlabeled corpus. */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val emb = Tables.embeddings(spark, SparkTestSession.Sf)

  test("dropped rows reference a smaller-id neighbor above threshold") {
    val rows = SemDedup.duplicates(emb, nCells = 16, threshold = 0.30).collect()
    assert(rows.nonEmpty, "sf0.001 embeddings contain planted near-dups")
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_of") < r.getAs[Long]("vec_id"),
        "canonical representative is the lowest id")
      assert(r.getAs[Double]("score") >= 0.30)
    }
    // one verdict per dropped vector
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
  }

  test("kept + dropped partition the corpus; kept contains no in-cell dup") {
    val total = emb.count()
    val dropped = SemDedup.duplicates(emb, nCells = 16, threshold = 0.30)
    val kept = SemDedup.deduplicated(emb, nCells = 16, threshold = 0.30)
    assert(kept.count() + dropped.count() == total)
    // re-running SemDeDup on the kept set with the ORIGINAL centroids
    // finds nothing: every surviving vector is its group's lowest id,
    // so no kept vector has a smaller-id >=t neighbor in its cell
    val cents = Similarity.ivfCentroids(emb, 16)
    val residual = SemDedup.duplicates(kept, nCells = 16, threshold = 0.30,
      centroids = Some(cents))
    assert(residual.count() == 0L)
  }

  test("autoCells keeps cells task-sized: ceil(n / target), min 1") {
    assert(SemDedup.autoCells(0L) == 1)
    assert(SemDedup.autoCells(1L) == 1)
    assert(SemDedup.autoCells(4096L) == 1)
    assert(SemDedup.autoCells(4097L) == 2)
    assert(SemDedup.autoCells(1000000L) == 245) // ceil(1e6/4096)
    assert(SemDedup.autoCells(100L, targetPerCell = 10L) == 10)
    // linear growth: 100x the corpus -> 100x the cells (task size constant)
    assert(SemDedup.autoCells(409600000L) == 100 * SemDedup.autoCells(4096000L))
  }

  test("nCells <= 0 auto-derives the cell count from the corpus") {
    // sf0.001 corpus is < 4096 vectors -> auto collapses to one cell,
    // which equals the explicit centroids=first-1 layout
    val auto = SemDedup.duplicates(emb, threshold = 0.30).collect()
    val one = SemDedup.duplicates(emb, threshold = 0.30,
      centroids = Some(Similarity.ivfCentroids(emb, 1))).collect()
    assert(auto.map(r => (r.getLong(0), r.getLong(1))).toSet ==
      one.map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(auto.nonEmpty)
  }

  test("k-means-trained centroids plug into the same dedup path") {
    val trained = Similarity.kmeansCentroids(emb, nCentroids = 16, iterations = 2)
    val rows = SemDedup.duplicates(emb, threshold = 0.30,
      centroids = Some(trained)).collect()
    assert(rows.nonEmpty, "planted near-dups survive under trained cells")
    rows.foreach { r =>
      assert(r.getAs[Long]("dup_of") < r.getAs[Long]("vec_id"))
      assert(r.getAs[Double]("score") >= 0.30)
    }
    // deterministic: the training loop is seed-free (first-k init +
    // fixed iterations), so a second run is bit-identical
    val again = SemDedup.duplicates(emb, threshold = 0.30,
      centroids = Some(Similarity.kmeansCentroids(emb, 16, 2))).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
  }

  test("trained cells on a clumped-seed fixture: planted twins found under both geometries (recall no worse)") {
    import spark.implicits._
    // the clumped-seed skew shape (seeds in a tiny arc, corpus over a
    // quarter circle) with exact twins planted in the broad region —
    // a twin pair shares any geometry's cell, so BOTH geometries must
    // catch every planted dup; trained cells may only ADD coverage
    val rnd = new scala.util.Random(11)
    def vec(theta: Double) = Seq(math.cos(theta).toFloat,
      math.sin(theta).toFloat, (rnd.nextDouble() * 0.01).toFloat,
      (rnd.nextDouble() * 0.01).toFloat)
    val base = (0 until 16).map(i => (i.toLong, vec(i * 0.003))) ++
      (16 until 116).map(i =>
        (i.toLong, vec(0.05 + (i - 16) * 1.45 / 100.0)))
    val twins = (0 until 10).map(j => (200L + j, base(16 + 5 * j)._2))
    val skewed = (base ++ twins).toDF("vec_id", "embedding")
    val planted = twins.map(_._1).toSet
    def dupIds(c: Option[Array[Array[Double]]]) =
      SemDedup.duplicates(skewed, nCells = 16, threshold = 0.9,
          centroids = c)
        .select("vec_id").as[Long].collect().toSet
    val seedDups = dupIds(None)
    val trainedDups = dupIds(
      Some(Similarity.kmeansCentroids(skewed, 16, iterations = 3)))
    assert(planted.subsetOf(seedDups), s"seed cells missed ${planted -- seedDups}")
    assert(planted.subsetOf(trainedDups), s"trained cells missed ${planted -- trainedDups}")
    assert(trainedDups.size >= seedDups.size,
      "trained cells lost dedup coverage on the skewed fixture")
  }

  test("blocking bounds the pair space: fewer verdicts than all-pairs at a loose threshold") {
    // with one cell the operator degenerates to all-pairs; with 16
    // cells a cross-cell near-dup pair is (correctly) not considered.
    val cents1 = Similarity.ivfCentroids(emb, 1)
    val allPairs = SemDedup.duplicates(emb, threshold = 0.05,
      centroids = Some(cents1)).count()
    val blocked = SemDedup.duplicates(emb, nCells = 16, threshold = 0.05).count()
    assert(blocked <= allPairs)
    assert(allPairs > 0)
  }
}
