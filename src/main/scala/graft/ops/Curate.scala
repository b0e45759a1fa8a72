package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
}
