package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Prefix-filtered exact set-similarity self-join (the candidate
  * scheme of AllPairs/PPJoin — Bayardo et al. WWW'07, Xiao et al.
  * WWW'08): all pairs of documents whose SHINGLE SETS have Jaccard
  * similarity ≥ τ, computed exactly, with a candidate space bounded
  * by the *prefix filter* instead of the corpus².
  *
  * Principle: order every set by a single global token order (here:
  * document frequency ascending — rarest first, ties by token).
  * If |A∩B| ≥ ⌈τ·|A|⌉ (implied by J(A,B) ≥ τ, since
  * o/(|A|+|B|−o) ≥ τ and |B| ≥ o give o ≥ τ·|A|), then A and B must
  * share at least one element among the first
  * ℓ(S) = |S| − ⌈τ·|S|⌉ + 1 elements of each set under that order.
  * So candidate generation only explodes the ℓ-prefix — and because
  * the order is df-ascending, prefix tokens are the RAREST in the
  * corpus, keeping the per-token bucket fan-out small by
  * construction. A sizes filter (τ·max ≤ min, exact integers)
  * prunes cross-length pairs before the distinct.
  *
  * Shape at 100 TB: shuffles are keyed on token (df count + postings
  * join) and on doc id (set collection + verify joins) — never an
  * all-pairs product. Degenerate corpora (everything a duplicate of
  * everything) degrade toward the true output size, which is itself
  * quadratic in that case. τ is a rational `tauNum/tauDen` so every
  * filter is exact integer arithmetic; the one double (the reported
  * jaccard) is a single divide of two exact longs — deterministic,
  * so a SQL oracle hash-matches.
  *
  * Reference tie-in: the reference dedups only on exact priority keys
  * (`batch/main.py:272-285`); this is the similarity-join member of
  * the mandated near-dup family (SURVEY §2.9 E1).
  */
object SetSim {

  /** All pairs (id_a < id_b) with shingle-set Jaccard ≥ tauNum/tauDen.
    * Output: id_a, id_b, inter, uni (exact longs), jaccard (double).
    */
  def jaccardJoin(docs: DataFrame, idCol: Column, textCol: Column,
                  shingleN: Int = 3, tauNum: Int = 1, tauDen: Int = 2): DataFrame = {
    require(tauNum > 0 && tauDen >= tauNum, "need 0 < tau <= 1")

    // (id, sorted-distinct shingle set, set size) — one narrow pass,
    // PINNED: this frame is consumed four times (df counting, prefix
    // postings, both verify sides); without the checkpoint the corpus
    // would re-tokenize + re-sort per consumer (lazy: the first
    // consumer materializes, bounded at one row per doc)
    val sets = docs.select(
      idCol.as("id"),
      array_sort(array_distinct(
        graft.ops.TextStats.shingles(textCol, shingleN))).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .localCheckpoint(eager = false)

    // document frequency per shingle (distinct semantics: sets, not bags)
    val postings = sets.select(col("id"), col("n"), explode(col("toks")).as("tok"))
    val dfreq = postings.groupBy(col("tok")).agg(count(lit(1)).as("df"))

    // global order = (df asc, tok asc); the ℓ-prefix of each set under
    // that order. ℓ = n − ⌈τ·n⌉ + 1, integer-exact:
    // ⌈τ·n⌉ = (tauNum·n + tauDen − 1) div tauDen (`div`, not `/` —
    // Spark's `/` on longs is double division).
    val prefix = postings
      .join(dfreq, "tok") // shuffle keyed on tok
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id"))
          .orderBy(col("df").asc, col("tok").asc)))
      .withColumn("l",
        expr(s"n - ((n * $tauNum + ${tauDen - 1}) div $tauDen) + 1"))
      .filter(col("rk") <= col("l"))
      .select(col("id"), col("n"), col("tok"))

    // candidates: share a prefix token + integer size filter
    // (J ≥ τ ⟹ τ·max(|A|,|B|) ≤ min(|A|,|B|))
    val a = prefix.toDF("id_a", "n_a", "tok")
    val b = prefix.toDF("id_b", "n_b", "tok")
    val cand = a.join(b, "tok")
      .filter(col("id_a") < col("id_b") &&
        greatest(col("n_a"), col("n_b")) * tauNum <=
          least(col("n_a"), col("n_b")) * tauDen)
      .select(col("id_a"), col("id_b")).distinct()

    // verify: exact merge-pass intersection over the pre-sorted sets
    // (native codegen kernel — no intermediate array / hash set per pair)
    val setsA = sets.select(col("id").as("id_a"), col("toks").as("toks_a"),
      col("n").as("n_a"))
    val setsB = sets.select(col("id").as("id_b"), col("toks").as("toks_b"),
      col("n").as("n_b"))
    cand.join(setsA, "id_a").join(setsB, "id_b")
      .withColumn("inter",
        graft.functions.ArrayExprs.interCountSorted(col("toks_a"), col("toks_b")))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .filter(col("inter") * tauDen >= col("uni") * tauNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        (col("inter").cast("double") / col("uni").cast("double")).as("jaccard"))
  }

  /** Bipartite (cross-corpus) variant: all pairs (a ∈ docsA, b ∈ docsB)
    * with shingle-set Jaccard ≥ τ — the NEAR-DUP form of benchmark
    * decontamination (the exact n-gram form is `Decontaminate`): find
    * training documents that are fuzzy copies of eval/benchmark
    * documents, where token-level edits defeat exact n-gram overlap.
    *
    * Same prefix-filter principle as [[jaccardJoin]]; the global token
    * order comes from document frequency over the UNION of both
    * corpora (any one consistent total order keeps the filter exact —
    * df-ascending keeps prefix buckets rare by construction). The
    * candidate join is A-prefix × B-prefix on the token, so the pair
    * space is Σ_tok dfA_prefix(tok)·dfB_prefix(tok), never |A|·|B|.
    */
  def crossJaccardJoin(docsA: DataFrame, docsB: DataFrame,
                       idCol: Column, textCol: Column,
                       shingleN: Int = 3, tauNum: Int = 1, tauDen: Int = 2)
      : DataFrame = {
    require(tauNum > 0 && tauDen >= tauNum, "need 0 < tau <= 1")

    def sets(docs: DataFrame): DataFrame = docs.select(
      idCol.as("id"),
      array_sort(array_distinct(
        graft.ops.TextStats.shingles(textCol, shingleN))).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .localCheckpoint(eager = false)

    val setsA = sets(docsA)
    val setsB = sets(docsB)
    val postA = setsA.select(col("id"), col("n"), explode(col("toks")).as("tok"))
    val postB = setsB.select(col("id"), col("n"), explode(col("toks")).as("tok"))
    val dfreq = postA.select(col("tok")).unionAll(postB.select(col("tok")))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))

    def prefix(post: DataFrame): DataFrame = post
      .join(dfreq, "tok")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("id"))
          .orderBy(col("df").asc, col("tok").asc)))
      .withColumn("l",
        expr(s"n - ((n * $tauNum + ${tauDen - 1}) div $tauDen) + 1"))
      .filter(col("rk") <= col("l"))
      .select(col("id"), col("n"), col("tok"))

    val a = prefix(postA).toDF("id_a", "n_a", "tok")
    val b = prefix(postB).toDF("id_b", "n_b", "tok")
    val cand = a.join(b, "tok")
      .filter(greatest(col("n_a"), col("n_b")) * tauNum <=
        least(col("n_a"), col("n_b")) * tauDen)
      .select(col("id_a"), col("id_b")).distinct()

    val fullA = setsA.select(col("id").as("id_a"), col("toks").as("toks_a"),
      col("n").as("n_a"))
    val fullB = setsB.select(col("id").as("id_b"), col("toks").as("toks_b"),
      col("n").as("n_b"))
    cand.join(fullA, "id_a").join(fullB, "id_b")
      .withColumn("inter",
        graft.functions.ArrayExprs.interCountSorted(col("toks_a"), col("toks_b")))
      .withColumn("uni", col("n_a") + col("n_b") - col("inter"))
      .filter(col("inter") * tauDen >= col("uni") * tauNum)
      .select(col("id_a"), col("id_b"), col("inter"), col("uni"),
        (col("inter").cast("double") / col("uni").cast("double")).as("jaccard"))
  }
}
