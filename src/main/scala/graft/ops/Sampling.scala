package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and source mixing — the selection stage of a
  * training-data pipeline: choose WHICH documents enter the mix, at
  * WHAT per-source proportions, reproducibly across reruns and
  * cluster sizes.
  *
  * Everything here is narrow or one-shuffle:
  *
  *  - hash-mod sampling is a pure filter: no shuffle, no state, the
  *    same rows survive on 1 executor or 1000 (`rand()` does NOT give
  *    that — its draw depends on partition layout, so a repartition
  *    changes the sample; a scrambled key mod M is layout-independent
  *    and re-runnable, which is what makes a 100 TB sample auditable);
  *  - quota mixing is one window shuffle partitioned by source —
  *    bounded state per source, no global sort;
  *  - temperature weighting is driver-side arithmetic over per-source
  *    COUNTS (a few rows), never over data.
  *
  * The scramble is Knuth's multiplicative hash (`key * 2654435761 mod
  * 2^32`-style, Fibonacci hashing): multiplication by a large odd
  * constant decorrelates sequential ids from the mod-M buckets. It is
  * plain 64-bit arithmetic, so the DuckDB oracle computes bit-equal
  * buckets with the same SQL expression — sampling stays
  * hash-verified, not rows-only (ids here are < 2^31, so `id * c`
  * stays well inside 64-bit range on both engines).
  */
object Sampling {

  /** Knuth's multiplicative constant (2^32 / phi, odd). */
  val KnuthC: Long = 2654435761L

  /** Layout-independent pseudo-uniform bucket in [0, m) for an
    * integral id column. `id` must be a non-negative long below 2^31 —
    * ENFORCED at runtime ([[graft.ops.Sharding.assign]] rationale:
    * past 2^31 the Knuth multiply leaves signed-64-bit range, where
    * Spark's non-ANSI wraparound silently skews the sample and an
    * exact-arithmetic verifier diverges; fail loudly instead).
    *
    * NULL contract: a NULL id yields a NULL bucket, which the sample
    * filters DROP — a sampler may under-sample a corrupt row, but
    * must never throw on it. The opposite of [[Sharding.assign]],
    * where NULL-id rows ride into shards (an assigner must not lose
    * corpus mass). Callers tracking corruption should count NULL ids
    * upstream; the drop here is silent.
    */
  def hashBucket(idCol: Column, m: Int): Column = {
    val id = idCol.cast("long")
    // a NULL id propagates a NULL bucket (dropped by the < filters
    // downstream, the pre-guard behavior) — without the explicit
    // branch the range check is NULL, falls to otherwise, and throws
    // a messageless error (concat with a NULL id is NULL)
    when(id.isNull, lit(null).cast("long"))
      .when(id >= 0 && id < lit(1L << 31), pmod(id * lit(KnuthC), lit(m.toLong)))
      .otherwise(raise_error(concat(
        lit("Sampling.hashBucket: id must be in [0, 2^31), got "),
        id.cast("string"))))
  }

  /** Uniform p-fraction sample: keep rows whose bucket falls under
    * p*10000 (basis points, so p=0.0137 is exact).
    */
  def uniform(df: DataFrame, idCol: Column, p: Double): DataFrame = {
    require(p >= 0 && p <= 1, "p in [0,1]")
    df.filter(hashBucket(idCol, 10000) < math.round(p * 10000).toDouble)
  }

  /** Per-stratum rates (basis points out of 10000) with a default for
    * unlisted strata: a single codegen'd filter — the whole sampler is
    * scan+filter, nothing wide.
    */
  def stratified(df: DataFrame, strataCol: Column, idCol: Column,
                 ratesBp: Map[String, Int], defaultBp: Int): DataFrame = {
    require((defaultBp +: ratesBp.values.toSeq).forall(r => r >= 0 && r <= 10000),
      "rates are basis points in [0,10000]")
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (k, v)) =>
      when(strataCol === k, lit(v)).otherwise(acc)
    }
    df.filter(hashBucket(idCol, 10000) < rate.cast("long"))
  }

  /** Deterministic k-row uniform sample: the k smallest scrambled
    * keys. One TakeOrderedAndProject (top-k per partition, merge on
    * the driver) — never a global sort.
    */
  def uniformK(df: DataFrame, idCol: Column, k: Int): DataFrame =
    df.orderBy(hashBucket(idCol, 1000000007), idCol).limit(k)

  /** Source mixing by explicit per-source quotas: rank rows within
    * each source by `priority` (ties broken by `idCol` so the result
    * is total-order deterministic) and keep the top quota(source).
    * One shuffle partitioned by source; per-partition state is one
    * counter. Unlisted sources get `defaultQuota`.
    */
  def mixByQuota(df: DataFrame, sourceCol: Column, idCol: Column,
                 quotas: Map[String, Long], defaultQuota: Long,
                 priority: Column): DataFrame = {
    val quota = quotas.foldLeft(lit(defaultQuota)) { case (acc, (k, v)) =>
      when(sourceCol === k, lit(v)).otherwise(acc)
    }
    val w = Window.partitionBy(sourceCol).orderBy(priority.desc, idCol.asc)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= quota)
      .drop("__rk")
  }

  /** Adaptive per-group gate: keep the top `keepBp` basis-points
    * FRACTION of each group by `rankCol` (ties broken by `idCol`, so
    * the cut is total-order deterministic). The training-data use is
    * a per-source RELATIVE quality threshold — "drop the worst 30%
    * of every source" — which, unlike one global constant, doesn't
    * wipe out sources whose score distribution sits lower overall
    * (per-source quality percentiles are standard curation practice,
    * e.g. CCNet's per-language perplexity buckets, Wenzek et al.
    * LREC'20 §4.3).
    *
    * One shuffle: both windows (rank and count) share the same
    * partitioning, so Catalyst plans a single exchange. The keep
    * predicate is exact integer arithmetic (`rn·10000 ≤ n·keepBp`,
    * i.e. keep floor(n·keepBp/10000) rows) — bit-identical in the
    * DuckDB oracle, no float threshold drift.
    */
  def topFractionPerGroup(df: DataFrame, groupCol: Column, rankCol: Column,
                          idCol: Column, keepBp: Int): DataFrame = {
    require(keepBp >= 0 && keepBp <= 10000, "keepBp is basis points in [0,10000]")
    val w = Window.partitionBy(groupCol).orderBy(rankCol.desc, idCol.asc)
    val wc = Window.partitionBy(groupCol)
    // row_number() is an Int: multiply in LONG, or groups >= 214,749
    // rows silently wrap the int product in non-ANSI mode
    df.withColumn("__rn", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wc))
      .filter(col("__rn") * 10000L <= col("__n") * keepBp)
      .drop("__rn", "__n")
  }

  /** Temperature-scaled mixture quotas (the multinomial-sampling
    * weighting of multilingual/multi-corpus training, Conneau &
    * Lample, NeurIPS'19 §3.1): source i with n_i documents gets
    * budget * n_i^(1/T) / sum_j n_j^(1/T), rounded down, any
    * remainder given to the largest sources first (largest-remainder
    * rounding, capped at n_i — a quota above the source's size is
    * just the source). T=1 is proportional; T→∞ is uniform;
    * 0<T<1 sharpens toward big sources.
    *
    * Driver-side arithmetic over per-source counts (rows = number of
    * sources, not data): pair with [[mixByQuota]].
    */
  def temperatureQuotas(counts: Map[String, Long], temperature: Double,
                        budget: Long): Map[String, Long] = {
    require(temperature > 0, "temperature must be positive")
    require(budget >= 0, "budget must be non-negative")
    if (counts.isEmpty) return Map.empty
    val weights = counts.map { case (s, n) =>
      s -> math.pow(n.toDouble, 1.0 / temperature)
    }
    val total = weights.values.sum
    if (total == 0) return counts.map { case (s, _) => s -> 0L }
    val raw = weights.map { case (s, w) => s -> budget * w / total }
    val floor = raw.map { case (s, r) =>
      s -> math.min(r.toLong, counts(s))
    }
    var left = budget - floor.values.sum
    // largest fractional remainder first; never exceed a source's size
    val order = raw.toSeq.sortBy { case (s, r) => -(r - floor(s)) }.map(_._1)
    val out = scala.collection.mutable.Map(floor.toSeq: _*)
    for (s <- order if left > 0) {
      val room = counts(s) - out(s)
      val add = math.min(room, left)
      if (add > 0) { out(s) += add; left -= add }
    }
    out.toMap
  }

  /** LEAKAGE-SAFE train/validation split (E5∘E1): the split key is
    * the row's NEAR-DUP CLUSTER, not the row — two near-duplicate
    * documents can never straddle the boundary, so the validation set
    * measures generalization, not memorized near-copies (splitting by
    * row id silently leaks every duplicated document into both
    * sides). `pairs` is any near-dup pair table (MinHash / SimHash /
    * embedding — the E1 detectors all emit (id_a, id_b));
    * [[graft.ops.ConnectedComponents]] closes it into clusters, rows
    * without a pair are their own singleton cluster, and the cluster
    * label hashes through [[hashBucket]] — layout-independent,
    * re-runnable, oracle-verifiable like every sampler here.
    *
    * Scale shape: the component table is bounded by DUPLICATED rows
    * (pair mass), not the corpus; the corpus pays one id-keyed join
    * against it and a pure-arithmetic filter — no corpus shuffle
    * beyond that join (bucket/co-partition it at deployment).
    * Output: the input row ids with (group_id, split).
    */
  def leakageSafeSplit(df: DataFrame, idCol: Column, pairs: DataFrame,
                       valBp: Int,
                       cacheKey: Option[String] = None): DataFrame = {
    require(valBp >= 0 && valBp <= 10000, "valBp is basis points in [0,10000]")
    // `cacheKey` routes the closure through the session-shared cluster
    // artifact ([[ConnectedComponents.sharedComponents]]) — the split
    // reads the SAME table the dup-cluster report and keep-best policy
    // read, one propagation per (session, pair table)
    val comp = ConnectedComponents
      .sharedComponents(pairs, "id_a", "id_b", cacheKey)
      .select(col("id").as("__cc_id"), col("comp").as("__cc_comp"))
    df.select(idCol.as("id"))
      .join(comp, col("id") === col("__cc_id"), "left")
      .select(col("id"),
        coalesce(col("__cc_comp"), col("id")).as("group_id"))
      .withColumn("split",
        when(hashBucket(col("group_id"), 10000) < valBp, lit("val"))
          .otherwise(lit("train")))
  }
}
