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
    * (standard bloom sizing: -n·ln p / ln²2), clamped to [64, 2^26·8]
    * so a mis-estimated `n` can neither degenerate to a handful of
    * bits nor balloon past 64 MiB of broadcast.
    */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, "fpp must be in (0,1)")
    val bits = math.ceil(-n.toDouble * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    math.max(64L, math.min(bits, 64L * 1024 * 1024 * 8))
  }

  /** Serialized bloom filter over `key` of `build` (one aggregation
    * job; partial blooms merge associatively on the executors).
    */
  def keyBloom(build: DataFrame, key: Column,
               expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Shim.expression(key))),
      Literal(expectedItems),
      Literal(optimalNumBits(expectedItems, fpp))).toAggregateExpression()
    val row = build.select(Shim.column(agg)).head()
    // an empty build side yields a null bloom: represent as empty bytes
    if (row.isNullAt(0)) Array.emptyByteArray else row.getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))` as a Column; null keys
    * probe to null, i.e. are filtered — consistent with inner/semi
    * join semantics where null keys never match.
    */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    Shim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(Shim.expression(key)))))

  /** `fact` reduced to rows whose key might match `buildKeys`' bloom:
    * a superset of the join-relevant rows (false positives only, never
    * negatives). An empty build side prunes everything.
    */
  def prefilter(fact: DataFrame, factKey: Column,
                build: DataFrame, buildKey: Column,
                expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bloom = keyBloom(build, buildKey, expectedItems, fpp)
    if (bloom.isEmpty) fact.limit(0)
    else fact.filter(mightContain(bloom, factKey))
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
