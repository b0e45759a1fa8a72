package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The full pre-training corpus-curation pipeline as ONE declarative
  * plan — the capstone composition of the round-4 operators:
  *
  *   quality gate (TextStats.qualityScore)
  *   → repetition gate (TextStats.repetitionSignals)
  *   → benchmark decontamination (Decontaminate.contamination)
  *   → exact first-wins dedup (min id per exact text)
  *   → deterministic hash-mod subsample (Sampling.hashBucket)
  *
  * Every stage is individually oracle-verified, and the composition
  * is too (q_curate) — the point is that curation is a DATAFLOW, not
  * a script: Catalyst sees the whole plan, so column pruning and
  * filter ordering cross stage boundaries, and nothing materializes
  * between stages.
  *
  * Scale shape: three doc-keyed shuffles (repetition count,
  * contamination hit count, their joins — all keyed on the doc id,
  * mergeable partitionings), one text-keyed shuffle (exact dedup),
  * one broadcast probe (benchmark grams). No global sort, no
  * corpus-wide hot key, no driver state. The gates' thresholds are
  * plain column predicates, so Catalyst pushes what it can and the
  * survivors shrink every downstream exchange.
  */
object Curate {

  /** Curated corpus: survivors with their audit columns
    * (id, quality, top_gram_frac, contamination).
    */
  def curate(corpus: DataFrame, bench: DataFrame,
             idCol: Column, textCol: Column,
             minQuality: Double = 0.45,
             maxTopGram: Double = 0.6,
             maxContamination: Double = 0.6,
             sampleBp: Int = 8000): DataFrame = {
    val scored = corpus.select(idCol.as("id"),
      textCol.as("text"),
      TextStats.qualityScore(textCol).as("quality"))
    val rep = TextStats.repetitionSignals(corpus, idCol, textCol)
      .select(col("id"), col("top_gram_frac"))
    val cont = Decontaminate.contamination(corpus, bench, idCol, textCol)
      .select(col("id"), col("contamination"))
    // first-wins exact dedup: the kept id per exact text
    val keep = corpus.groupBy(textCol.as("text"))
      .agg(min(idCol).as("keep_id"))
      .select(col("keep_id").as("id"))
    scored
      .join(rep, Seq("id"))
      .join(cont, Seq("id"))
      .join(keep, Seq("id"), "left_semi")
      .filter(col("quality") >= minQuality &&
        col("top_gram_frac") <= maxTopGram &&
        col("contamination") < maxContamination &&
        Sampling.hashBucket(col("id"), 10000) < sampleBp)
      .select(col("id"), col("quality"), col("top_gram_frac"),
        col("contamination"))
  }

  /** [[curate]] with a SEMANTIC-dedup stage (E11∘E2): qualifying
    * k-NN-graph edges (cosine ≥ `semThreshold`) are near-duplicate
    * pairs, [[ConnectedComponents]] labels their clusters, and every
    * NON-CANONICAL member (id ≠ its cluster's min label — the
    * first-wins convention of the exact-dedup stage) is dropped from
    * the curated survivors. The edge table is the session's shared
    * graph artifact ([[KnnGraph.sharedGraph]]) — at scale ONE
    * write-once build serves ANN, hubness, cluster reporting, and
    * this curation gate; the composition costs one more doc-keyed
    * anti-join on top of [[curate]]'s plan.
    *
    * `embeddings.vec_id` must key the same documents as `idCol` (the
    * embedding table is the corpus's embedding column, stored
    * columnar-separate the way a 100 TB pipeline would).
    */
  def curateSem(corpus: DataFrame, bench: DataFrame, embeddings: DataFrame,
                idCol: Column, textCol: Column,
                minQuality: Double = 0.45,
                maxTopGram: Double = 0.6,
                maxContamination: Double = 0.6,
                sampleBp: Int = 8000,
                semThreshold: Double = 0.35,
                k: Int = 5,
                graphCacheKey: Option[String] = None): DataFrame = {
    val edges = KnnGraph.sharedGraph(embeddings, k, cacheKey = graphCacheKey)
      .filter(col("score") >= semThreshold)
    // the cluster table rides the same session artifact q_graph_clusters
    // reads — one propagation over the qualifying edges per session
    val nonCanonical = ConnectedComponents
      .sharedComponents(edges, "src", "dst", graphCacheKey)
      .filter(col("id") =!= col("comp"))
      .select(col("id"))
    curate(corpus, bench, idCol, textCol, minQuality, maxTopGram,
        maxContamination, sampleBp)
      .join(nonCanonical, Seq("id"), "left_anti")
  }

  /** The FULL curation composition over STANDING decontamination
    * artifacts — [[curate]]'s gates (quality, repetition, token-set
    * contamination, first-wins exact dedup, Knuth subsample) plus the
    * E7 family's other two arms: the SEMANTIC gate
    * ([[Similarity.probeSemIndex]] against a standing
    * [[Similarity.SemIndex]]) and the VERBATIM gate
    * ([[Decontaminate.probeVerbatim]] against a standing
    * [[Decontaminate.VerbatimIndex]]). Taking the indexes as
    * parameters (rather than re-deriving them from the corpus) is
    * what makes this the production shape: the bench artifacts are
    * built once, and the batch pipeline and its streaming twin
    * ([[graft.streaming.StreamingIngest.curateBatches]]) run the SAME
    * gates against the SAME geometry — the spec pins their equality.
    *
    * `corpusEmb` is the corpus's embedding column (vec_id keys the
    * same documents as `idCol` — the [[curateSem]] convention).
    * Shuffle budget: [[curate]]'s plus two doc-keyed anti-joins; both
    * probes broadcast the bench side, so the corpus never shuffles
    * for them.
    */
  def curateFull(corpus: DataFrame, bench: DataFrame, corpusEmb: DataFrame,
                 semIdx: Similarity.SemIndex,
                 verbIdx: Decontaminate.VerbatimIndex,
                 idCol: Column, textCol: Column,
                 minQuality: Double = 0.45,
                 maxTopGram: Double = 0.6,
                 maxContamination: Double = 0.6,
                 maxVerbatim: Double = 0.2,
                 semThreshold: Double = 0.30,
                 sampleBp: Int = 8000): DataFrame = {
    val semHit = Similarity.probeSemIndex(semIdx, corpusEmb, semThreshold)
      .select(col("vec_id").as("id")).distinct()
    val verbHit = Decontaminate.probeVerbatim(verbIdx, corpus, idCol, textCol)
      .filter(col("contamination") >= maxVerbatim)
      .select(col("doc_id").as("id"))
    curate(corpus, bench, idCol, textCol, minQuality, maxTopGram,
        maxContamination, sampleBp)
      .join(semHit, Seq("id"), "left_anti")
      .join(verbHit, Seq("id"), "left_anti")
  }

  /** Raw corpus → packed training sequences, one flow: [[curate]] the
    * survivors, [[Chunking]] them into context-window chunks, then
    * [[Packing]] the chunks into fixed token-budget packs. This is
    * the END of a pre-training data pipeline — what ships to the
    * trainer — expressed as a single composition whose stages are
    * each individually oracle-/spec-verified.
    *
    * Chunk ids are `doc_id * maxChunksPerDoc + chunk_idx` so packing
    * keys stay unique longs without coordination; callers must keep
    * `doc_id < Long.MaxValue / maxChunksPerDoc` (a 100 TB corpus of
    * 64-bit hashes would pre-map ids to a dense range first — the
    * id-compaction join is one zipWithIndex-style shuffle).
    *
    * Shuffle budget on top of curate's: the chunker is narrow (zero),
    * the packer adds its one pmod-shard exchange. The curated-id
    * semi-join prunes documents BEFORE chunking, so the fan-out only
    * pays for survivors.
    */
  def toSequences(corpus: DataFrame, bench: DataFrame,
                  idCol: Column, textCol: Column,
                  chunkTokens: Int = 512, overlap: Int = 0,
                  packBudget: Long = 2048L, shards: Int = 64,
                  maxChunksPerDoc: Long = 1000000L): Dataset[Packing.Packed] = {
    val kept = curate(corpus, bench, idCol, textCol).select(col("id"))
    val docs = corpus.select(idCol.as("id"), textCol.as("text"))
      .join(kept, Seq("id"), "left_semi")
    val chunks = Chunking.chunks(docs, col("id"), col("text"),
      chunkTokens, overlap)
    // a doc with >= maxChunksPerDoc chunks would collide its ids into
    // the next doc's range — silent lineage corruption; fail loudly
    // instead (raise_error is a codegen'd per-row guard, no extra pass)
    val chunkId = when(col("chunk_idx") < maxChunksPerDoc,
      col("doc_id") * lit(maxChunksPerDoc) + col("chunk_idx"))
      .otherwise(raise_error(concat(
        lit(s"doc exceeds maxChunksPerDoc=$maxChunksPerDoc chunks: id "),
        col("doc_id").cast("string"))))
    Packing.packGreedy(chunks, chunkId,
      col("n_tokens"), packBudget, shards)
  }
}
