package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou et al., TPAMI'11 "Product
  * Quantization for Nearest Neighbor Search") — the compressed-index
  * path of the similarity family: [[Similarity]] already covers exact
  * brute force, SRP-LSH bucketing, and IVF cell probing; PQ adds the
  * strategy that shrinks the CORPUS REPRESENTATION itself. Each
  * d-dim vector is split into `m` subvectors; each subvector is
  * quantized to one of `ks` per-subspace codebook entries; the stored
  * index is `m` small ints per vector (m=8, ks=16 -> 8 nibbles vs 64
  * floats: 64x smaller). At 100 TB that is the difference between an
  * index that fits in executor memory and one that doesn't — scan the
  * code table, score against a per-query lookup table, re-rank only
  * the survivors against the full vectors.
  *
  * Spark shape:
  *   - training is Lloyd's per-subspace spherical k-means expressed as
  *     DataFrame aggregations — ONE job per iteration covering ALL m
  *     subspaces (explode to (subspace, code, dim), groupBy avg);
  *     driver traffic is bounded at m x ks x (d/m) = d x ks doubles
  *     per iteration (here 64 x 16 = 1024), never corpus rows —
  *     the same bounded-driver contract as
  *     [[Similarity.kmeansCentroids]];
  *   - codebook entries are L2-normalized, so code assignment by the
  *     native `argmaxCosine` kernel IS the max-dot assignment, and the
  *     ADC score is a direction-only cosine approximation (subvector
  *     magnitudes are dropped — the exact re-rank restores them);
  *   - the asymmetric-distance (ADC) score is a plan-time-unrolled sum
  *     of `m` `element_at(lut_j, code_j + 1)` lookups against the
  *     query's literal lookup table — fully codegen'd, no UDF, cost
  *     O(m) per row instead of O(d);
  *   - candidates = top `rerank` rows by ADC; the final answer exactly
  *     re-ranks only those by full cosine. The corpus is scanned once
  *     for codes (cheap, compressed) and the expensive full-vector
  *     math touches `rerank` rows, not the corpus.
  */
object Pq {

  /** Codebooks `[m][ks][d/m]`, unit-L2 rows. Deterministic seed:
    * subspace j's code c starts from vec_id == c's j-th subvector
    * (mirrors [[Similarity.ivfCentroids]]); `iterations` rounds of
    * spherical k-means refine them. Cells that lose all members keep
    * their previous entry.
    */
  def trainCodebooks(embeddings: DataFrame, dim: Int, m: Int = 8,
                     ks: Int = 16, iterations: Int = 2): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val sub = dim / m
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0.0) v else v.map(_ / n)
    }
    var books: Array[Array[Array[Double]]] =
      embeddings.filter(col("vec_id") < ks).orderBy(col("vec_id"))
        .select(col("embedding")).collect()
        .map(_.getSeq[Float](0).map(_.toDouble).toArray) match {
        case seeds =>
          Array.tabulate(m)(j =>
            seeds.map(s => normalize(s.slice(j * sub, j * sub + sub))))
      }
    var i = 0
    while (i < iterations) {
      val b = books
      // one job: every row contributes (subspace, code, pos, v) for
      // all m subspaces; groupBy avg is the Lloyd's mean update
      // fixed-point (2^-30) means, like Similarity.kmeansCentroids:
      // exact integer sums are order-independent, so codebook training
      // is bit-reproducible and the SQL oracle replays it
      val Scale = 1073741824.0
      val contrib = embeddings.select(
        explode(array((0 until m).map { j =>
          val sv = slice(col("embedding"), j * sub + 1, sub)
          struct(lit(j).as("j"),
            graft.functions.ArrayExprs.argmaxCosine(sv, b(j)).as("code"),
            sv.as("sv"))
        }: _*)).as("e"))
        .select(col("e.j").as("j"), col("e.code").as("code"),
          posexplode(col("e.sv")).as(Seq("pos", "v")))
        .groupBy(col("j"), col("code"), col("pos"))
        .agg(sum(floor(col("v").cast("double") * lit(Scale)).cast("long")).as("s"),
          count(lit(1)).as("n"))
        .collect()
      val next = books.map(_.map(_.clone()))
      contrib.groupBy(r => (r.getAs[Int]("j"), r.getAs[Int]("code")))
        .foreach { case ((j, c), rows) =>
          val v = next(j)(c)
          rows.foreach(r => v(r.getAs[Int]("pos")) =
            (r.getAs[Long]("s").toDouble / r.getAs[Long]("n").toDouble) / Scale)
          next(j)(c) = normalize(v)
        }
      books = next
      i += 1
    }
    books
  }

  /** `(vec_id, codes array<int>)` — the compressed index: m codes per
    * vector, assigned by the native argmax-cosine kernel per subspace.
    * Narrow (no shuffle).
    */
  def encode(embeddings: DataFrame, books: Array[Array[Array[Double]]]): DataFrame = {
    val m = books.length
    val sub = books.head.head.length
    embeddings.select(col("vec_id"),
      array((0 until m).map { j =>
        graft.functions.ArrayExprs.argmaxCosine(
          slice(col("embedding"), j * sub + 1, sub), books(j))
      }: _*).as("codes"))
  }

  /** ADC top-k for one stored query (`queryId` row): score the code
    * table against the query's lookup table, keep the top `rerank`
    * candidates, exactly re-rank those by full cosine. Output
    * (vec_id, score) — score is the EXACT cosine of the surviving
    * candidates, so downstream consumers see true similarities.
    * The 1-row query collect is bounded driver traffic (same contract
    * as the watermark max).
    */
  /** [[trainCodebooks]] behind the session value cache: a persisted
    * PQ index at scale is TRAINED ONCE and read by every query — with
    * `cacheKey` (naming the source, e.g. the data dir) the 2·
    * `iterations` corpus jobs + driver collects run once per session
    * and every PQ query reuses the arrays. Keyed on the embeddings
    * plan's semantics, so a different corpus under the same key never
    * aliases ([[SessionArtifactCache]] rules).
    */
  def sharedCodebooks(embeddings: DataFrame, dim: Int, m: Int = 8,
                      ks: Int = 16, iterations: Int = 2,
                      cacheKey: Option[String] = None): Array[Array[Array[Double]]] =
    cacheKey match {
      case Some(src) =>
        SessionArtifactCache.getOrCompute(
          embeddings.select(col("vec_id"), col("embedding")),
          tag = s"pq_books:$src", params = s"$dim:$m:$ks:$iterations")(
          trainCodebooks(embeddings, dim, m, ks, iterations))
      case None => trainCodebooks(embeddings, dim, m, ks, iterations)
    }

  /** PERSIST trained codebooks as a parquet artifact — `path/books`
    * (j, code, vec array<double>) — completing the durable-index
    * family (MinHash / HashIndex / FrameIndex / SemIndex / BpeModel):
    * at 100 TB the codebooks are the write-once tokenizer of the
    * vector corpus, trained once and shipped to every query site.
    * Doubles round-trip parquet exactly, so a loaded book encodes
    * bit-identically to the one that was saved.
    */
  def saveCodebooks(spark: SparkSession, books: Array[Array[Array[Double]]],
                    path: String): Unit = {
    import spark.implicits._
    val rows = for (j <- books.indices; c <- books(j).indices)
      yield (j, c, books(j)(c).toSeq)
    rows.toDF("j", "code", "vec")
      .repartition(1).write.mode("overwrite").parquet(s"$path/books")
  }

  /** Load persisted codebooks. The collect is m·ks rows (the codebook
    * itself — 128 at the defaults), bounded by construction.
    */
  def loadCodebooks(spark: SparkSession, path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(s"$path/books")
      .select(col("j"), col("code"), col("vec")).collect()
    require(rows.nonEmpty, s"empty codebook artifact at $path")
    val m = rows.iterator.map(_.getInt(0)).max + 1
    val ks = rows.iterator.map(_.getInt(1)).max + 1
    val out = Array.ofDim[Array[Double]](m, ks)
    rows.foreach { r =>
      out(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    require(out.forall(_.forall(_ != null)),
      s"codebook artifact at $path is missing (j, code) cells")
    out
  }

  def pqTopK(embeddings: DataFrame, queryId: Long, k: Int, dim: Int = 64,
             m: Int = 8, ks: Int = 16, iterations: Int = 2,
             rerank: Int = 100, roundTo: Int = 6,
             cacheKey: Option[String] = None): DataFrame = {
    require(rerank >= k, "rerank pool must be at least k")
    val sub = dim / m
    val books = sharedCodebooks(embeddings, dim, m, ks, iterations, cacheKey)
    val qVec = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    // per-subspace lookup table: lut(j)(c) = dot(q_j, codebook(j)(c))
    val lut: Array[Array[Double]] = Array.tabulate(m) { j =>
      val qj = qVec.slice(j * sub, j * sub + sub)
      books(j).map(c => c.zip(qj).map { case (a, b) => a * b }.sum)
    }
    val adc = (0 until m).map { j =>
      element_at(typedLit(lut(j)), col("codes").getItem(j) + 1)
    }.reduce(_ + _)
    val candidates = encode(embeddings.filter(col("vec_id") =!= queryId), books)
      .select(col("vec_id"), adc.as("adc"))
      .orderBy(col("adc").desc, col("vec_id").asc)
      .limit(rerank)
    rerankExact(embeddings, candidates, queryId, k, roundTo)
  }

  /** IVF-PQ (the composition FAISS ships as `IVFx,PQy`): the coarse
    * IVF quantizer restricts the scan to the query's `nProbe` cells,
    * and the PQ code table is all that is scored inside them — at
    * scale the two multiply: touch 1/nCells of the corpus, at 1/64th
    * the bytes per row. We quantize the raw vector, not the
    * IVF residual (residuals aren't unit-scale, which would break the
    * spherical codebooks; the exact re-rank restores any lost
    * precision). Probe selection runs on the driver against the same
    * centroid array the cell assignment uses — no extra job.
    */
  def ivfPqTopK(embeddings: DataFrame, queryId: Long, k: Int, dim: Int = 64,
                m: Int = 8, ks: Int = 16, iterations: Int = 2,
                nCentroids: Int = 16, nProbe: Int = 4,
                rerank: Int = 100, roundTo: Int = 6,
                cacheKey: Option[String] = None): DataFrame = {
    require(rerank >= k, "rerank pool must be at least k")
    val sub = dim / m
    val cents = Similarity.ivfCentroids(embeddings, nCentroids)
    val books = sharedCodebooks(embeddings, dim, m, ks, iterations, cacheKey)
    val qVec = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
    }
    val probes = cents.zipWithIndex
      .sortBy { case (c, i) => (-cos(qVec, c), i) }
      .take(nProbe).map(_._2)
    val lut: Array[Array[Double]] = Array.tabulate(m) { j =>
      val qj = qVec.slice(j * sub, j * sub + sub)
      books(j).map(c => c.zip(qj).map { case (a, b) => a * b }.sum)
    }
    val adc = (0 until m).map { j =>
      element_at(typedLit(lut(j)), col("codes").getItem(j) + 1)
    }.reduce(_ + _)
    val cellCorpus = embeddings.filter(col("vec_id") =!= queryId)
      .filter(Similarity.ivfCell(col("embedding"), cents).isin(probes.toSeq: _*))
    val candidates = encode(cellCorpus, books)
      .select(col("vec_id"), adc.as("adc"))
      .orderBy(col("adc").desc, col("vec_id").asc)
      .limit(rerank)
    rerankExact(embeddings, candidates, queryId, k, roundTo)
  }

  /** Per-query ADC lookup table as ONE flat array column of m·ks
    * doubles — lut[j·ks + c] = dot(q_j, books(j)(c)) — via the native
    * [[graft.functions.ArrayExprs.pqLut]] kernel (index-order folds,
    * bit-identical to the driver-side table of [[pqTopK]] and the SQL
    * oracle's list_sum). The kernel replaced an m·ks·sub-operand
    * Column expression whose generated method blew Janino's 64 KB
    * limit and silently dropped the query-side stage to interpreted
    * mode.
    */
  private def lutColumn(emb: Column, books: Array[Array[Array[Double]]]): Column =
    graft.functions.ArrayExprs.pqLut(emb, books)

  /** ADC score of a `codes` column against a flat per-query `lut`
    * column: m `element_at` lookups folded in subspace order — O(m)
    * per (corpus, query) candidate, fully codegen'd.
    */
  private def adcScore(lut: Column, codes: Column, m: Int, ks: Int): Column =
    (0 until m).map(j =>
      element_at(lut, codes.getItem(j) + lit(j * ks) + 1)).reduce(_ + _)

  /** Batch ADC top-k over a query TABLE — the amortization the
    * uncompressed paths already have ([[Similarity.annTopKBatch]]):
    * the corpus is ENCODED ONCE (one scan producing m small codes per
    * row), every query scores that one code table through its
    * broadcast lookup table at O(m) per pair, and only the per-query
    * `rerank` survivors touch full vectors. At 100 TB this is the
    * difference between q scans of 64-float rows and one scan of
    * 8-nibble rows shared by the whole mining batch.
    *
    * @param queries (query_id, embedding); broadcast-sized.
    * Output (query_id, vec_id, score, rank ≤ k) — score is the exact
    * cosine of the surviving candidates, shape-identical to
    * [[Similarity.ivfTopKBatch]].
    *
    * Plan note: the corpus-side join is a BroadcastNestedLoopJoin by
    * DESIGN — plain PQ has no blocking key (scoring every corpus row
    * against every query IS the full ADC scan), the build side is the
    * tiny query table, and the per-pair work is the O(m) lookup fold.
    * The cell-bounded scale path is [[ivfPqTopKBatch]].
    */
  def pqTopKBatch(embeddings: DataFrame, queries: DataFrame, k: Int,
                  dim: Int = 64, m: Int = 8, ks: Int = 16,
                  iterations: Int = 2, rerank: Int = 100,
                  roundTo: Int = 6,
                  cacheKey: Option[String] = None): DataFrame = {
    require(rerank >= k, "rerank pool must be at least k")
    val books = sharedCodebooks(embeddings, dim, m, ks, iterations, cacheKey)
    val q = queries.select(col("query_id"),
      col("embedding").as("q_emb"),
      lutColumn(col("embedding"), books).as("lut"))
    rerankBatch(embeddings,
      encode(embeddings, books)
        .join(broadcast(q), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          adcScore(col("lut"), col("codes"), m, ks).as("adc"), col("q_emb")),
      k, rerank, roundTo)
  }

  /** Batch IVF-PQ (the FAISS `IVFx,PQy` shape, amortized over a query
    * table): the corpus computes its coarse cell AND its PQ codes in
    * one scan; each query broadcasts with its `nProbe` probe cells and
    * flat lookup table; the candidate space is an equi-join on the
    * cell id — per-query work is the probed pool at O(m) bytes-scored
    * per row, never the corpus. A corpus row has exactly one cell and
    * probe cells are distinct, so each (query, vec) pair arises at
    * most once — no dedup shuffle.
    */
  def ivfPqTopKBatch(embeddings: DataFrame, queries: DataFrame, k: Int,
                     dim: Int = 64, m: Int = 8, ks: Int = 16,
                     iterations: Int = 2, nCentroids: Int = 16,
                     nProbe: Int = 4, rerank: Int = 100,
                     roundTo: Int = 6,
                     cacheKey: Option[String] = None): DataFrame = {
    require(rerank >= k, "rerank pool must be at least k")
    val sub = dim / m
    val books = sharedCodebooks(embeddings, dim, m, ks, iterations, cacheKey)
    val cents = Similarity.ivfCentroids(embeddings, nCentroids)
    // the 1024-op LUT fold is computed in its OWN select, the explode
    // in the NEXT one: inline, it lands in the Project ABOVE Generate,
    // where it (a) re-evaluates once per probe cell and (b) blows the
    // Generate doConsume past Janino's method limit, dropping the
    // stage to interpreted (the ExtractGenerator trap, PlanHygieneSpec)
    val q = queries.select(col("query_id"),
        col("embedding").as("q_emb"),
        lutColumn(col("embedding"), books).as("lut"),
        Similarity.ivfProbeCells(col("embedding"), cents, nProbe)
          .as("probes"))
      .select(col("query_id"), col("q_emb"), col("lut"),
        explode(col("probes")).as("probe"))
    val corpus = embeddings.select(col("vec_id"),
      Similarity.ivfCell(col("embedding"), cents).as("cell"),
      array((0 until m).map { j =>
        graft.functions.ArrayExprs.argmaxCosine(
          slice(col("embedding"), j * sub + 1, sub), books(j))
      }: _*).as("codes"))
    rerankBatch(embeddings,
      corpus.join(broadcast(q),
          col("cell") === col("probe") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"),
          adcScore(col("lut"), col("codes"), m, ks).as("adc"), col("q_emb")),
      k, rerank, roundTo)
  }

  /** Per-query (adc-top-`rerank` → exact cosine top-`k`) tail shared
    * by the batch paths. `scored` carries (query_id, vec_id, adc,
    * q_emb); the candidate pool after the first window is
    * rerank × |queries| rows — broadcast-joined back to the full
    * vectors, so the expensive math touches candidates only.
    */
  private def rerankBatch(embeddings: DataFrame, scored: DataFrame,
                          k: Int, rerank: Int, roundTo: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAdc = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").desc, col("vec_id").asc)
    val cand = scored
      .withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= rerank)
      .select(col("query_id"), col("vec_id"), col("q_emb"))
    val wK = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id").asc)
    embeddings.select(col("vec_id"), col("embedding"))
      .join(broadcast(cand), "vec_id")
      .select(col("query_id"), col("vec_id"),
        round(Similarity.cosine(col("embedding"), col("q_emb")), roundTo)
          .as("score"))
      .withColumn("rank", row_number().over(wK).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Exact cosine re-rank of an ANN candidate pool against the full
    * vectors — candidates are a (vec_id)-keyed slice, the query a
    * 1-row broadcast.
    */
  private def rerankExact(embeddings: DataFrame, candidates: DataFrame,
                          queryId: Long, k: Int, roundTo: Int): DataFrame = {
    val q = embeddings.filter(col("vec_id") === queryId)
      .select(col("embedding").as("q_emb"))
    embeddings.join(candidates, "vec_id")
      .join(broadcast(q))
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding"), col("q_emb")), roundTo)
          .as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(k)
  }
}
