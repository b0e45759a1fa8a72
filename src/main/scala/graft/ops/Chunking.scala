package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking — the context-window stage of an LLM training /
  * RAG-indexing pipeline: split each document into fixed token-budget
  * chunks with a configurable overlap so no training sequence or
  * retrieval unit exceeds the model's window (overlap preserves
  * cross-boundary context; standard sliding-window layout, e.g.
  * Lewis et al., NeurIPS'20 §2 use 100-word chunks for RAG indexes).
  *
  * Scale shape: this is a NARROW transformation — tokenize, generate
  * the chunk starts per row (`sequence`), `posexplode`, `slice` — so
  * it costs zero shuffles at any corpus size; output partitioning
  * follows the input and Catalyst keeps the whole chain inside one
  * whole-stage-codegen span (no UDF, no CodegenFallback). The fan-out
  * factor is bounded by ceil(maxTokens/stride) per doc, so skew only
  * mirrors document-length skew, which the parquet scan already has.
  *
  * Determinism: chunk boundaries are a pure function of the token
  * array and the (chunkTokens, overlap) parameters — the same corpus
  * chunks identically on any cluster size, and the DuckDB oracle
  * reproduces it bit-for-bit (q_chunk is hash-verified, not
  * rows-only).
  *
  * Tokenization follows the corpus convention of the `documents`
  * table (single-space separated; see [[TextStats.tokens]]).
  */
object Chunking {

  /** One row per (doc, chunk): `doc_id, chunk_idx, n_tokens,
    * chunk_text`. Starts advance by `stride = chunkTokens - overlap`;
    * the final chunk may be shorter than `chunkTokens` (it is
    * emitted, never dropped — dropping the tail would silently lose
    * up to stride-1 tokens per document). A trailing start whose
    * remaining tokens all lie inside the PREVIOUS chunk's overlap
    * (n − start ≤ overlap) is skipped: it would add zero new tokens,
    * i.e. a fully redundant training sequence — with overlap =
    * chunkTokens/2 that duplicate would hit ~stride/n of all docs.
    */
  def chunks(docs: DataFrame, idCol: Column, textCol: Column,
             chunkTokens: Int, overlap: Int = 0): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(overlap >= 0 && overlap < chunkTokens,
      "overlap must be in [0, chunkTokens)")
    val stride = chunkTokens - overlap
    docs
      .select(idCol.as("doc_id"), TextStats.tokens(textCol).as("toks"))
      // sequence(0, n-1, stride): n >= 1 always (split never yields an
      // empty array), so the bounds are legal and every doc emits at
      // least one chunk; the filter drops starts that are fully
      // contained in the previous chunk (start 0 always survives).
      .select(col("doc_id"), col("toks"),
        posexplode(filter(
          sequence(lit(0), size(col("toks")) - 1, lit(stride)),
          s => s === 0 || s + lit(overlap) < size(col("toks"))))
          .as(Seq("chunk_idx", "start")))
      .select(
        col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(chunkTokens), size(col("toks")) - col("start"))
          .cast("long").as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** COST-WEIGHTED chunking: units (e.g. words) carry a cost in model
    * tokens (e.g. their BPE segment length — see [[Bpe.tokenCounts]]),
    * and a unit is assigned to chunk floor(start / budget) where
    * `start` is the running cost of everything before it. Units are
    * ATOMIC — one that straddles a boundary lands entirely in the
    * chunk where it starts, so a chunk may exceed the budget by up to
    * maxCost − 1 (the downstream packer enforces the hard cap; this
    * stage only needs deterministic, order-stable boundaries). The
    * window is keyed per document — never global — and the rest is
    * one aggregation: two shuffles total at any corpus size.
    * Output: (doc_id, chunk_id, n_units, n_tokens).
    */
  def chunksByCost(units: DataFrame, docCol: Column, posCol: Column,
                   costCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    units
      .select(docCol.as("doc_id"), posCol.as("pos"), costCol.as("cost"))
      .withColumn("start",
        sum(col("cost")).over(
          Window.partitionBy(col("doc_id")).orderBy(col("pos"))) - col("cost"))
      .withColumn("chunk_id", expr(s"start div ${budget}L"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_units"), sum(col("cost")).as("n_tokens"))
  }
}
