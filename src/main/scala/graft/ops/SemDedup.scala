package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SemDeDup (Abbas et al., arXiv:2303.09540 "SemDeDup: Data-efficient
  * learning at web-scale through semantic deduplication") — semantic
  * near-duplicate removal where the quadratic pair space is blocked by
  * a coarse k-means CELL derived from the embeddings themselves,
  * rather than by an existing label/band column. This is the missing
  * member of the embedding-dedup family: [[Similarity.nearDupPairs]]
  * needs a caller-supplied blocking column; SemDeDup derives one, so
  * it applies to an unlabeled corpus — the normal state of web-scale
  * pretraining data.
  *
  * Scale shape (100 TB): cell assignment is a narrow map (native
  * argmax-dot kernel against a small broadcast centroid array, the
  * same [[Similarity.ivfCell]] the ANN index uses); the self-join
  * shuffles on the cell id, so each task sees one cell's vectors and
  * the pair space is sum over cells of |cell|^2 — never corpus^2. The
  * paper's recipe (k-means into many thousands of clusters, pairwise
  * cosine inside each) is exactly this shape; nCells scales with the
  * corpus so cells stay task-sized, and AQE's skew split handles a
  * fat cell.
  *
  * Drop policy: within a cell, a vector is a duplicate iff some
  * LOWER-id vector in the same cell has cosine >= threshold; each
  * dropped vector reports its smallest-id such neighbor (`dup_of`) —
  * deterministic, and keeps exactly one representative per duplicate
  * group under transitive closure within the cell (the paper keeps
  * one per group; lowest-id is its reproducible instantiation).
  */
object SemDedup {

  /** Task-sized cell count for a corpus of `n` vectors:
    * ceil(n / targetPerCell), minimum 1. The Abbas et al. recipe keeps
    * cells small enough that the in-cell pairwise pass is one task's
    * work (|cell|² comparisons); deriving nCells linearly from the
    * corpus count keeps that invariant at ANY scale — a fixed nCells
    * would silently re-quadratize as the corpus grows.
    */
  def autoCells(n: Long, targetPerCell: Long = 4096L): Int = {
    require(targetPerCell > 0, "targetPerCell must be positive")
    math.max(1L, (n + targetPerCell - 1) / targetPerCell)
      .min(Int.MaxValue.toLong).toInt
  }

  /** Dropped vectors: `(vec_id, dup_of, score)` — `dup_of` is the
    * smallest-id same-cell neighbor with cosine >= threshold, `score`
    * that pair's cosine (rounded to `roundTo` BEFORE thresholding,
    * the [[Similarity.nearDupPairs]] convention). Pass pre-trained
    * `centroids` (e.g. [[Similarity.kmeansCentroids]]) to reuse an
    * index; defaults to the deterministic seed centroids so results
    * are reproducible cross-engine. `nCells <= 0` (the default)
    * derives a task-sized cell count from the corpus via
    * [[autoCells]] (one bounded count() action); pass an explicit
    * nCells for a pinned, oracle-reproducible layout.
    */
  def duplicates(embeddings: DataFrame, nCells: Int = 0,
                 threshold: Double = 0.30, roundTo: Int = 6,
                 centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    val cents = centroids.getOrElse {
      val cells = if (nCells > 0) nCells else autoCells(embeddings.count())
      Similarity.ivfCentroids(embeddings, cells)
    }
    val celled = embeddings.withColumn(
      "cell", Similarity.ivfCell(col("embedding"), cents))
    val pairs = Similarity.nearDupPairs(celled, col("cell"), threshold, roundTo)
    pairs
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("id_b")).orderBy(col("id_a"))))
      .filter(col("rn") === 1)
      .select(col("id_b").as("vec_id"), col("id_a").as("dup_of"), col("score"))
  }

  /** The kept corpus: input rows minus [[duplicates]] (left-anti on
    * vec_id). Same schema as the input.
    */
  def deduplicated(embeddings: DataFrame, nCells: Int = 0,
                   threshold: Double = 0.30, roundTo: Int = 6,
                   centroids: Option[Array[Array[Double]]] = None): DataFrame = {
    val dropped = duplicates(embeddings, nCells, threshold, roundTo, centroids)
      .select(col("vec_id"))
    embeddings.join(dropped, Seq("vec_id"), "left_anti")
  }
}
