package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Vector similarity search over an `array<float>` embedding column
  * (north-star operator E2, SURVEY.md §2.9).
  *
  * All scalar math is expression-level (`zip_with` + `aggregate` with a
  * DOUBLE accumulator in array-index order → deterministic, codegen'd,
  * no UDF). Two physical strategies:
  *
  *   - brute force: scan + score + `TakeOrderedAndProject` (orderBy +
  *     limit). Correct baseline; O(N·d) per query — fine when the
  *     corpus side is scanned once per small query set.
  *   - LSH (random hyperplane / SRP): a fixed, seed-deterministic set of
  *     hyperplanes maps each vector to a signature; candidates share a
  *     signature band with the query, then exact re-rank within the
  *     bucket. At 100 TB the bucket join replaces the full scan, and the
  *     signature groupBy partitions the corpus so each probe touches a
  *     few partitions instead of all of them.
  */
object Similarity {

  /** Σ aᵢ·bᵢ accumulated in DOUBLE in index order (deterministic).
    * Native Catalyst expression ([[graft.functions.DotDouble]]) — the
    * `aggregate(zip_with(...))` form it replaces is CodegenFallback
    * (interpreted per element) and allocates the product array.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayExprs.dotDouble(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force top-k by cosine against one stored query vector
    * (`queryId` row of the same table). The query embedding is a
    * one-row broadcast — never a shuffle of the corpus.
    * Output: (vec_id, score) with `score` rounded for stable ordering;
    * ties broken by vec_id.
    */
  def topKByCosine(embeddings: DataFrame, queryId: Long, k: Int,
                   roundTo: Int = 6): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    embeddings.filter(col("vec_id") =!= queryId)
      .join(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), roundTo).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Seed-deterministic random hyperplanes (plan-build constants). */
  def hyperplanes(dim: Int, bits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(bits)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** SRP signature: one bit per hyperplane (sign of the projection),
    * packed into a LongType column. bits must be <= 63.
    */
  def srpSignature(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = dot(vec, typedLit(p))
      when(proj >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** ANN via LSH bucketing: candidates = vectors sharing at least one
    * signature *band* with the query (multi-band OR-amplification),
    * exactly re-ranked by cosine. `bits` total sign bits split into
    * `bands` bands. Scale path: the corpus is exploded to (band,
    * bandKey) — a linear-size index that a 1000-executor cluster
    * shuffles once and reuses; each query touches only its buckets.
    */

  /** Banded LSH keys over an SRP signature: one (band, key) struct per
    * band, key = that band's bit-slice. Shared by the single-query and
    * batch ANN paths — the join keys MUST be built identically on both
    * sides, so this lives in exactly one place.
    */
  private def bandKeys(sigCol: Column, bands: Int, width: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(sigCol, b * width)
          .bitwiseAND(lit((1L << width) - 1)).as("key"))
    }: _*)

  def annTopK(embeddings: DataFrame, queryId: Long, k: Int,
              dim: Int = 64, bits: Int = 16, bands: Int = 4,
              seed: Long = 42L, roundTo: Int = 6): DataFrame = {
    require(bits % bands == 0, "bits must divide into bands")
    val planes = hyperplanes(dim, bits, seed)
    val width = bits / bands
    val sig = srpSignature(col("embedding"), planes)


    val corpus = embeddings.filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), col("embedding"), explode(bandKeys(sig, bands, width)).as("bk"))
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"), explode(bandKeys(sig, bands, width)).as("bk"))

    corpus.join(broadcast(q), corpus("bk") === q("bk"))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), roundTo).as("score"))
      .groupBy(col("vec_id")).agg(max(col("score")).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** IVF-style ANN — the second scale path besides SRP-LSH: the corpus
    * is partitioned into cells by nearest centroid; a query probes only
    * its `nProbe` closest cells. The cell column doubles as a physical
    * partitioning key at scale (`repartition(col("cell"))` co-locates
    * each cell), so a probe touches a bounded slice of a 100 TB corpus.
    *
    * Centroids here are seed vectors taken deterministically from the
    * data (ids < nCentroids); production would plug sampled k-means
    * centroids into the same API — assignment and probing are
    * unchanged.
    */
  def ivfCentroids(embeddings: DataFrame, nCentroids: Int): Array[Array[Double]] =
    embeddings.filter(col("vec_id") < nCentroids)
      .orderBy(col("vec_id"))
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)

  /** Lloyd's k-means refinement of the IVF centroids, expressed as
    * pure DataFrame aggregations: each iteration assigns every vector
    * to its nearest centroid (the same native `argmaxCosine` kernel
    * the index uses), then recomputes per-(cell, dimension) means with
    * ONE groupBy over the posexploded dims. Driver traffic is bounded
    * at nCentroids x dim rows per iteration (here 16 x 64 = 1024) —
    * the corpus itself never leaves the cluster, so the loop scales to
    * any corpus size; iterations, not data, bound the driver.
    *
    * Means are FIXED-POINT (2⁻³⁰-quantized): each member value is
    * floored to an integer multiple of 2⁻³⁰ and summed as a long —
    * integer sums are order-independent, so training is bit-identical
    * on any partitioning AND recomputable by the SQL oracle (a plain
    * double `avg` depends on float summation order in the last ulps,
    * which is why `q_ivf_trained` was rows-only before round 7). The
    * quantization error (≤ 2⁻³⁰ per value) is orders of magnitude
    * below float32 input precision — clustering is unaffected.
    *
    * Cells that lose all members keep their previous centroid (the
    * standard empty-cluster fallback).
    */
  def kmeansCentroids(embeddings: DataFrame, nCentroids: Int = 16,
                      iterations: Int = 3): Array[Array[Double]] = {
    val Scale = 1073741824.0 // 2^30: double mult/floor by a power of 2 is exact
    var cents = ivfCentroids(embeddings, nCentroids)
    var i = 0
    while (i < iterations) {
      val dims = embeddings
        .withColumn("cell", ivfCell(col("embedding"), cents))
        .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(sum(floor(col("v").cast("double") * lit(Scale)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = cents.map(_.clone())
      dims.foreach { r =>
        next(r.getAs[Int]("cell"))(r.getAs[Int]("pos")) =
          (r.getAs[Long]("s").toDouble / r.getAs[Long]("n").toDouble) / Scale
      }
      cents = next
      i += 1
    }
    cents
  }

  /** Cell assignment: argmax of cosine against the (small, carried as
    * one codegen reference object) centroid set — a native kernel
    * ([[graft.functions.ArgMaxCosine]]): one pass per centroid per row.
    * The unrolled `array(16 × cosine(vec, typedLit))` form it replaces
    * evaluated the giant score array twice
    * (`array_position(scores, array_max(scores))`).
    */
  def ivfCell(vec: Column, centroids: Array[Array[Double]]): Column =
    graft.functions.ArrayExprs.argmaxCosine(vec, centroids)

  /** Top-nProbe probe cells for a query vector, as array<int>. */
  def ivfProbeCells(vec: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    graft.functions.ArrayExprs.probeCells(vec, centroids, nProbe)

  def ivfTopK(embeddings: DataFrame, queryId: Long, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4,
              roundTo: Int = 6, trainIterations: Int = 0): DataFrame = {
    val cents =
      if (trainIterations > 0) kmeansCentroids(embeddings, nCentroids, trainIterations)
      else ivfCentroids(embeddings, nCentroids)
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"),
        ivfProbeCells(col("embedding"), cents, nProbe).as("probes"))
    embeddings.filter(col("vec_id") =!= queryId)
      .withColumn("cell", ivfCell(col("embedding"), cents))
      .join(broadcast(q), array_contains(col("probes"), col("cell")))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), roundTo).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }

  /** Brute-force batch top-k: the corpus is scanned ONCE for the whole
    * query set (broadcast), scored, and ranked per query — exact, and
    * the per-query shuffle is keyed by query_id (never global). The
    * exact baseline the ANN variants approximate.
    *
    * @param queries (query_id, embedding), broadcast-sized.
    */
  def topKByCosineBatch(corpus: DataFrame, queries: DataFrame, k: Int,
                        roundTo: Int = 6): DataFrame = {
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    corpus.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), roundTo).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** HARD-NEGATIVE mining (contrastive-training data prep): for each
    * query vector, the top-k most-similar corpus vectors with a
    * DIFFERENT label — the similar-but-wrong examples a contrastive /
    * retrieval trainer pairs against each anchor. Same one-corpus-scan
    * shape as [[topKByCosineBatch]] (queries broadcast, per-query
    * window keyed by query_id), with the label-mismatch gate applied
    * BEFORE ranking so the window never sees same-label rows.
    *
    * @param queries (query_id, embedding, label), broadcast-sized.
    */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                    roundTo: Int = 6): DataFrame = {
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"),
      col("label").as("q_label"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    corpus.join(broadcast(q),
        col("vec_id") =!= col("query_id") && col("label") =!= col("q_label"))
      .select(col("query_id"), col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("q_emb")), roundTo).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** IVF-bucketed hard-negative mining — the scale path over
    * [[hardNegatives]]: the brute form's label-mismatch predicate makes
    * its join a broadcast nested-loop over the WHOLE corpus per anchor;
    * here each anchor probes only its `nProbe` nearest coarse cells
    * (the [[semanticContamination]] shape), the corpus is assigned its
    * one cell in the same scan, and the join is a broadcast equi-join
    * on the cell id — per-anchor work drops from |corpus| to the probed
    * cells. Approximate like every IVF path: a true top-k negative
    * outside the probed cells is missed (recall spec-pinned vs the
    * brute baseline); within the probed pool the ranking is exact.
    *
    * @param queries (query_id, embedding, label), broadcast-sized.
    */
  def ivfHardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                       nCentroids: Int = 16, nProbe: Int = 4,
                       roundTo: Int = 6): DataFrame = {
    val cents = ivfCentroids(corpus, nCentroids)
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"),
      col("label").as("q_label"),
      explode(ivfProbeCells(col("embedding"), cents, nProbe)).as("probe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    corpus.withColumn("cell", ivfCell(col("embedding"), cents))
      .join(broadcast(q),
        col("cell") === col("probe") && col("vec_id") =!= col("query_id") &&
          col("label") =!= col("q_label"))
      .select(col("query_id"), col("vec_id"), col("label"),
        round(cosine(col("embedding"), col("q_emb")), roundTo).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Batch ANN (SRP-LSH) over a query TABLE — the right amortization at
    * scale: ONE banded index pass over the corpus, the (small) query
    * side broadcast, candidates re-ranked exactly, top-k per query via
    * a per-query window (shuffle keyed by query_id — never global).
    *
    * @param queries (query_id, embedding); must be broadcast-sized
    *                (typically ≤ millions of rows — it is the probe
    *                set, not the corpus).
    */
  def annTopKBatch(corpus: DataFrame, queries: DataFrame, k: Int,
                   dim: Int = 64, bits: Int = 16, bands: Int = 4,
                   seed: Long = 42L, roundTo: Int = 6): DataFrame = {
    require(bits % bands == 0, "bits must divide into bands")
    val planes = hyperplanes(dim, bits, seed)
    val width = bits / bands
    val corpusIdx = corpus.select(col("vec_id"), col("embedding"),
      explode(bandKeys(srpSignature(col("embedding"), planes), bands, width)).as("bk"))
    val queryIdx = queries.select(col("query_id"), col("embedding").as("q_emb"),
      explode(bandKeys(srpSignature(col("embedding"), planes), bands, width)).as("qbk"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    corpusIdx.join(broadcast(queryIdx),
        corpusIdx("bk") === queryIdx("qbk") &&
          corpusIdx("vec_id") =!= queryIdx("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), roundTo).as("score"))
      .groupBy(col("query_id"), col("vec_id")).agg(max(col("score")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Batch ANN (IVF): corpus assigned to cells once; each query probes
    * its nProbe nearest cells; per-query exact re-rank. The cell column
    * is the natural physical partitioning key at scale.
    */
  def ivfTopKBatch(corpus: DataFrame, queries: DataFrame, k: Int,
                   nCentroids: Int = 16, nProbe: Int = 4,
                   roundTo: Int = 6, trainIterations: Int = 0): DataFrame = {
    val cents =
      if (trainIterations > 0) kmeansCentroids(corpus, nCentroids, trainIterations)
      else ivfCentroids(corpus, nCentroids)
    val q = queries.select(col("query_id"), col("embedding").as("q_emb"),
      explode(ivfProbeCells(col("embedding"), cents, nProbe)).as("probe"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    corpus.withColumn("cell", ivfCell(col("embedding"), cents))
      .join(broadcast(q),
        col("cell") === col("probe") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("embedding"), col("q_emb")), roundTo).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** SEMANTIC decontamination (E7 composed with E2): corpus rows whose
    * embedding is cosine-close to ANY held-out benchmark embedding —
    * the paraphrase-robust complement of the n-gram gate
    * ([[Decontaminate]]): a reworded eval question shares no 3-grams
    * with its source but keeps its embedding neighborhood.
    *
    * Scale shape: the (small) benchmark side probes `nProbe` cells of
    * the corpus-seeded IVF coarse quantizer and BROADCASTS; the corpus
    * is assigned its one cell in the same scan — the join is a
    * broadcast equi-join on the cell id, never corpus × benchmark, and
    * the corpus never shuffles. A corpus row has exactly one cell, so
    * each (corpus, bench) pair arises at most once — no distinct
    * needed. Output (vec_id, bench_id, score ≥ threshold); downstream
    * drops every flagged vec_id.
    */
  /** Standing semantic-decontamination artifact for
    * write-once-probe-many embedding gates (the MinHash
    * `CorpusIndex` shape): the coarse-quantizer centroids (driver
    * arrays, trained/seeded from the REFERENCE corpus at build time —
    * a stream must not re-derive geometry per batch) plus the
    * benchmark side pre-exploded to its probe cells, eagerly
    * checkpointed. Each micro-batch computes its one cell in-scan and
    * broadcast-joins the bench probes — per-batch work tracks the
    * batch, never the corpus or the bench build.
    */
  final case class SemIndex(cents: Array[Array[Double]], bench: DataFrame)

  def buildSemIndex(corpus: DataFrame, bench: DataFrame,
                    nCentroids: Int = 16, nProbe: Int = 4): SemIndex = {
    val cents = ivfCentroids(corpus, nCentroids)
    SemIndex(cents,
      bench.select(col("vec_id").as("bench_id"),
        col("embedding").as("b_emb"),
        explode(ivfProbeCells(col("embedding"), cents, nProbe)).as("probe"))
        .localCheckpoint())
  }

  /** PERSIST a [[SemIndex]]: the exploded bench probes as parquet and
    * the coarse-quantizer centroids in the manifest — full-precision
    * `Double.toString` round-trips bit-exactly, so a loaded index
    * assigns every batch row the same cell the saved one did.
    */
  def saveSemIndex(idx: SemIndex, path: String): Unit = {
    idx.bench.write.mode("overwrite").parquet(s"$path/bench")
    val cents = idx.cents.map(_.mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    java.nio.file.Files.write(java.nio.file.Paths.get(path, "params.json"),
      s"""{"cents":$cents}""".getBytes("UTF-8"))
  }

  def loadSemIndex(spark: org.apache.spark.sql.SparkSession,
                   path: String): SemIndex = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "params.json")), "UTF-8")
    val body = txt.substring(txt.indexOf("[[") + 1, txt.lastIndexOf("]]") + 1)
    val cents = body.split("\\],?").filter(_.nonEmpty).map { row =>
      row.dropWhile(c => c == '[' || c == ',').stripPrefix("[")
        .split(",").filter(_.nonEmpty).map(_.toDouble)
    }
    require(cents.nonEmpty && cents.forall(_.nonEmpty), "bad cents manifest")
    SemIndex(cents, spark.read.parquet(s"$path/bench"))
  }

  /** INDEX MAINTENANCE for the semantic gate — fold a NEW benchmark
    * set (a freshly added eval suite) into a standing [[SemIndex]]:
    * only the new bench rows are probed-and-exploded against the
    * EXISTING coarse geometry (cell space must stay fixed, or every
    * previously assigned corpus/batch cell would be invalidated); the
    * old artifact's blocks are unioned, never recomputed — the
    * [[graft.ops.MinHash.extend]] accounting, and the old snapshot
    * stays valid.
    */
  def extendSemIndex(idx: SemIndex, newBench: DataFrame,
                     nProbe: Int = 4,
                     checkDisjoint: Boolean = true): SemIndex = {
    if (checkDisjoint)
      Guards.requireDisjointIds(idx.bench.select(col("bench_id")),
        newBench.select(col("vec_id")), "Similarity.extendSemIndex")
    SemIndex(idx.cents,
      idx.bench.unionByName(
        newBench.select(col("vec_id").as("bench_id"),
          col("embedding").as("b_emb"),
          explode(ivfProbeCells(col("embedding"), idx.cents, nProbe))
            .as("probe"))
          .localCheckpoint()))
  }

  /** Probe an embedding batch against a standing [[SemIndex]]: rows of
    * the batch cosine-close (≥ threshold) to ANY benchmark member.
    * Output (vec_id, bench_id, score) — identical semantics to
    * [[semanticContamination]] when the index was built from the same
    * corpus/bench (spec-pinned).
    */
  def probeSemIndex(idx: SemIndex, batch: DataFrame, threshold: Double,
                    roundTo: Int = 6): DataFrame =
    batch.withColumn("cell", ivfCell(col("embedding"), idx.cents))
      .join(broadcast(idx.bench),
        col("cell") === col("probe") && col("vec_id") =!= col("bench_id"))
      .withColumn("score", round(cosine(col("embedding"), col("b_emb")), roundTo))
      .filter(col("score") >= threshold)
      .select(col("vec_id"), col("bench_id"), col("score"))

  def semanticContamination(corpus: DataFrame, bench: DataFrame,
                            threshold: Double, nCentroids: Int = 16,
                            nProbe: Int = 4, roundTo: Int = 6): DataFrame = {
    val cents = ivfCentroids(corpus, nCentroids)
    val b = bench.select(col("vec_id").as("bench_id"),
      col("embedding").as("b_emb"),
      explode(ivfProbeCells(col("embedding"), cents, nProbe)).as("probe"))
    corpus.withColumn("cell", ivfCell(col("embedding"), cents))
      .join(broadcast(b),
        col("cell") === col("probe") && col("vec_id") =!= col("bench_id"))
      .withColumn("score", round(cosine(col("embedding"), col("b_emb")), roundTo))
      .filter(col("score") >= threshold)
      .select(col("vec_id"), col("bench_id"), col("score"))
  }

  /** Embedding-cosine near-duplicate pairs within a blocking column
    * (e.g. a coarse cluster/label/LSH band). Blocking bounds the
    * quadratic pair space — the all-pairs crossJoin is intentionally
    * not offered.
    */
  def nearDupPairs(embeddings: DataFrame, blockCol: Column,
                   threshold: Double, roundTo: Int = 6): DataFrame = {
    val a = embeddings.select(blockCol.as("blk"), col("vec_id").as("id_a"),
      col("embedding").as("emb_a"))
    val b = embeddings.select(blockCol.as("blk"), col("vec_id").as("id_b"),
      col("embedding").as("emb_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score", round(cosine(col("emb_a"), col("emb_b")), roundTo))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /** [[nearDupPairs]] behind the session artifact cache — the pair
    * EVIDENCE every embedding-dup policy reads (the cluster report,
    * the standing-ClusterIndex demo, leakage-safe splitting, the raw
    * pair listing) materializes ONCE per (session, corpus, threshold)
    * instead of re-running the blocked self-join per consuming query:
    * the write-once pair-table accounting at 100 TB, and the same
    * shape as [[SubstringDedup.sharedVerbatimDupPairs]] on the
    * verbatim-evidence side. Keyed on the embedding table's semantic
    * plan + (threshold, roundTo), so two different corpora or
    * thresholds can never alias each other's pair table.
    */
  def sharedNearDupPairs(embeddings: DataFrame, blockCol: Column,
                         threshold: Double, roundTo: Int = 6,
                         cacheKey: Option[String] = None): DataFrame =
    cacheKey match {
      case None => nearDupPairs(embeddings, blockCol, threshold, roundTo)
      case Some(src) => SessionArtifactCache.getOrBuild(
        embeddings.select(blockCol, col("vec_id"), col("embedding")),
        tag = s"neardup_pairs:$src",
        params = s"threshold=$threshold,roundTo=$roundTo") {
        nearDupPairs(embeddings, blockCol, threshold, roundTo)
      }
    }

  /** PERSIST the embedding near-dup pair table — the across-session
    * half of [[sharedNearDupPairs]], completing the policy-artifact
    * symmetry with [[SubstringDedup.saveVerbatimPairs]] on the
    * verbatim-evidence side: parquet + a manifest carrying the
    * EVIDENCE GEOMETRY (threshold, roundTo), so a loaded table can
    * never silently mix with pairs scored under a different
    * threshold (a pair at cosine ≥ 0.30 is not a pair at ≥ 0.50).
    */
  def saveNearDupPairs(pairs: DataFrame, threshold: Double, roundTo: Int,
                       path: String): Unit = {
    pairs.write.mode("overwrite").parquet(s"$path/pairs")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "params.json"),
      s"""{"threshold":$threshold,"roundTo":$roundTo}""".getBytes("UTF-8"))
  }

  /** Load a persisted near-dup pair table; returns (pairs, threshold,
    * roundTo) and refuses a manifest missing either geometry field.
    */
  def loadNearDupPairs(spark: org.apache.spark.sql.SparkSession,
                       path: String): (DataFrame, Double, Int) = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "params.json")), "UTF-8")
    def numOf(key: String): String = {
      val m = s""""$key"\\s*:\\s*(-?[\\d.]+)""".r.findFirstMatchIn(txt)
      require(m.isDefined, s"params.json missing $key")
      m.get.group(1)
    }
    (spark.read.parquet(s"$path/pairs"),
      numOf("threshold").toDouble, numOf("roundTo").toInt)
  }
}
