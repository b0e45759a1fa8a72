package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Balanced training-shard assignment — the "materialize the corpus
  * as N shard files a trainer can stream" step of a data pipeline.
  * Plain hash-mod balances COUNTS but not token mass when document
  * lengths are skewed; sorting by weight and dealing round-robin
  * balances mass but needs a global sort. This operator composes two
  * existing exact primitives instead:
  *
  *   1. equi-depth weight strata from [[Rank.valueRanks]] (two-pass
  *      prefix scan — no global window, driver traffic bounded by
  *      numRanges accumulators);
  *   2. the layout-independent multiplicative-hash scramble (the same
  *      one [[Sampling]] uses, oracle-verified) round-robins documents
  *      to shards WITHIN each stratum.
  *
  * Every shard then draws near-uniformly from every weight stratum,
  * so shard mass converges to corpus_mass/nShards with variance
  * bounded by the per-stratum weight spread (k strata of n/k docs
  * each) — while staying fully deterministic, layout-independent, and
  * SQL-oracle-matchable (exact integer arithmetic end to end).
  */
object Sharding {

  /** Per-document assignment: (id, weight, bucket, shard). `bucket` is
    * the 1-based equi-depth weight stratum (k = `strata`); `shard` the
    * 0-based target shard.
    */
  def assign(docs: DataFrame, idCol: Column, weightCol: Column,
             nShards: Int, strata: Int = 8): DataFrame = {
    require(nShards > 0 && strata > 0, "need positive shard/strata counts")
    // one row per distinct weight, with its stratum — small relative
    // to the corpus (bounded by distinct weight values), broadcast to
    // avoid shuffling the corpus for the stratum lookup
    val buckets = Rank.valueRanks(docs.select(weightCol.as("w0")),
      col("w0"), k = strata)
      .select(col("v"), col("bucket"))
    docs.select(idCol.as("id"), weightCol.as("weight"))
      .withColumn("v", col("weight").cast("double"))
      .join(broadcast(buckets), "v")
      .withColumn("shard", pmod(col("id") * lit(2654435761L), lit(nShards.toLong)))
      .select(col("id"), col("weight"), col("bucket"), col("shard"))
  }
}
