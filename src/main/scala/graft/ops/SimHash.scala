package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection (north-star operator E1-near,
  * SURVEY.md §2.9): each document folds its token hashes into one
  * 64-bit signature; near-duplicates differ in ≤ `maxHamming` bits.
  *
  * Candidate generation uses the pigeonhole principle: the signature is
  * split into `maxHamming + 1` chunks, so any pair within the Hamming
  * radius agrees on at least one whole chunk — an equality join on
  * (chunk index, chunk value), never an all-pairs scan. One shuffle on
  * a uniform key; linear index size. This is the standard web-scale
  * SimHash partitioning (Manku et al., WWW'07 — public literature).
  */
object SimHash {

  val Bits = 64

  /** Per-token 62-bit portable hash (two polynomial streams packed —
    * [[graft.functions.kernels.simhash64]]), ±1 vote per bit, sign of
    * the vote = signature bit — pure integer arithmetic an independent
    * engine can recompute, so the DuckDB oracle verifies signatures
    * bit-for-bit. Implemented as a native Catalyst expression
    * ([[graft.functions.SimHash64]]): the equivalent
    * `aggregate`/`transform` form is CodegenFallback (interpreted,
    * allocating a 64-element array per token) — two orders of
    * magnitude slower on the per-row path that dominates at scale.
    */
  def simhash(tokensCol: Column): Column =
    graft.functions.ArrayExprs.simhash64(tokensCol)

  def hamming(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** (id, simhash) per document. */
  def signatures(docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("id"), simhash(TextStats.tokens(textCol)).as("sh"))

  /** Candidate pairs from the pigeonhole chunk join, with their exact
    * Hamming distance (unfiltered — callers pick the radius). `chunks`
    * controls selectivity: any pair within Hamming distance
    * `chunks − 1` is guaranteed to collide on ≥1 chunk.
    */
  def candidateDistances(docs: DataFrame, idCol: Column, textCol: Column,
                         chunks: Int = 4): DataFrame = {
    // chunks <= 0 divides by zero; chunks > 64 makes width 0, every
    // chunk key degenerates to (i, 0) and the join goes all-pairs
    require(chunks >= 1 && chunks <= Bits, s"chunks must be in [1, $Bits]")
    val width = Bits / chunks
    val sigs = signatures(docs, idCol, textCol)
    def chunkKeys(sh: Column): Column = array((0 until chunks).map { i =>
      val w = if (i == chunks - 1) Bits - i * width else width
      val mask = if (w >= 64) -1L else (1L << w) - 1
      struct(lit(i).as("ci"),
        shiftrightunsigned(sh, i * width).bitwiseAND(lit(mask)).as("cv"))
    }: _*)
    val idx = sigs.select(col("id"), col("sh"), explode(chunkKeys(col("sh"))).as("ck"))
    val a = idx.select(col("id").as("id_a"), col("sh").as("sh_a"), col("ck"))
    val b = idx.select(col("id").as("id_b"), col("sh").as("sh_b"), col("ck"))
    a.join(b, Seq("ck"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sh_a"), col("sh_b")).as("dist"))
      .distinct()
  }

  /** Near-dup pairs with Hamming distance ≤ maxHamming; the
    * maxHamming+1 chunk split guarantees no false negatives.
    */
  def nearDupPairs(docs: DataFrame, idCol: Column, textCol: Column,
                   maxHamming: Int = 3): DataFrame =
    candidateDistances(docs, idCol, textCol, maxHamming + 1)
      .filter(col("dist") <= maxHamming)
}
