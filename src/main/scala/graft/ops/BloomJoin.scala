package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter pre-join pruning — the explicit form of runtime
  * row-level filtering (Spark's own InjectRuntimeFilter plants the
  * same `BloomFilterAggregate` → `might_contain` pair under AQE when
  * heuristics allow; here it is an operator the user controls).
  *
  * Why it matters at 100 TB: a selective dimension join still
  * shuffles the ENTIRE fact side before the join discards most of it.
  * Building a bloom filter over the dimension's join keys (one small
  * aggregation) and filtering the fact side BEFORE its exchange cuts
  * the shuffled volume to ~(selectivity + fpp) of the fact table —
  * the filter is a codegen'd hash probe against broadcast bytes, far
  * cheaper than shuffling the rows it removes.
  *
  * Exactness: the bloom admits false positives, so the pre-filter
  * keeps a SUPERSET of the matching fact rows; the real join that
  * follows removes the stragglers. The composed result is therefore
  * bit-identical to the plain join — q_bloom_join is hash-verified
  * against the plain-join SQL oracle.
  *
  * Driver traffic is the serialized bloom only (numBits/8 bytes,
  * ~1 MiB at 8M bits) — bounded and independent of either table's
  * row count, same contract as the k-means centroid collect
  * documented in [[Similarity]].
  *
  * Both sides hash with `XxHash64` over the key expression, so the
  * fact and dimension key columns must share a data type (cast before
  * calling if they differ — a long and its string form hash
  * differently).
  */
object BloomJoin {

  /** Optimal bit count for `n` items at false-positive rate `fpp`
    * (standard bloom sizing: -n·ln p / ln²2), clamped to [64,
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits`] —
    * `BloomFilterAggregate` itself silently `min`s against that conf
    * (default 67,108,864 bits = 8 MiB), so clamping any higher here
    * would just misreport the bloom actually built. Callers sizing
    * for dims beyond ~4M items must ALSO raise
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumItems` (same
    * silent clamp on the estimate), or the realized fpp quietly
    * exceeds the requested one.
    */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0,1)")
    val confMax = org.apache.spark.sql.internal.SQLConf.get
      .getConfString("spark.sql.optimizer.runtime.bloomFilter.maxNumBits",
        "67108864").toLong
    val bits = math.ceil(-n.toDouble * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    math.max(64L, math.min(bits, confMax))
  }

  /** Serialized bloom filter over `key` of `build` (one aggregation
    * job; partial blooms merge associatively on the executors). Null
    * build keys are excluded — under inner/semi semantics they never
    * match, and inserting them would only burn bits (xxhash64(NULL)
    * degenerates to the seed).
    */
  def keyBloom(build: DataFrame, key: Column,
               expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Shim.expression(key))),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp))).toAggregateExpression()
    val row = build.filter(key.isNotNull).select(Shim.column(agg)).head()
    // an empty build side yields a null bloom: represent as empty bytes
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))` as a Column. NB this alone
    * does NOT filter null keys: `xxhash64(NULL)` evaluates to the hash
    * seed, not NULL, so a null key probes a constant bit pattern and
    * may pass — [[prefilter]] adds the explicit `isNotNull` guard.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Shim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(Shim.expression(key)))))

  /** `fact` reduced to rows whose key might match `buildKeys`' bloom:
    * a superset of the join-relevant rows (false positives only, never
    * negatives). Null fact keys are dropped explicitly (inner/semi
    * semantics — and the bloom probe alone can't drop them, see
    * [[mightContain]]). An empty build side prunes everything.
    */
  def prefilter(fact: DataFrame, factKey: Column,
                build: DataFrame, buildKey: Column,
                expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = keyBloom(build, buildKey, expectedItems, fpp)
    if (bloom.isEmpty) fact.limit(0)
    else fact.filter(factKey.isNotNull && mightContain(bloom, factKey))
  }

  /** The exact inner join, with the fact side bloom-pruned before its
    * shuffle. Result is bit-identical to `fact.join(dim, cond)` —
    * the join clears the bloom's false positives.
    */
  def bloomJoin(fact: DataFrame, factKey: Column,
                dim: DataFrame, dimKey: Column,
                expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val pruned = prefilter(fact, factKey, dim, dimKey, expectedItems, fpp)
    pruned.join(dim, factKey === dimKey)
  }
}
