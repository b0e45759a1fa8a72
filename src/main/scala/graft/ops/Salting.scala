package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic key salting for skewed equi-joins. When one join key
  * carries a disproportionate share of the fact rows (the classic
  * "null bucket" / celebrity-user problem), a plain hash join sends
  * the whole hot key to ONE reducer — at 100 TB that task runs for
  * hours while the rest of the cluster idles. Salting splits each hot
  * key into `salts` sub-keys: the fact side appends a deterministic
  * salt in [0, salts), the dim side is replicated once per salt value,
  * and the join runs on (key, salt) — the hot key now spreads over
  * `salts` reducers. Result set is IDENTICAL to the unsalted join
  * (each fact row still meets each matching dim row exactly once).
  *
  * AQE's skew-join split handles sort-merge skew adaptively at
  * runtime; explicit salting remains the portable answer when the
  * skew is known ahead (and the only one for stateful/streaming
  * joins, where AQE does not apply).
  */
object Salting {

  /** Skew-safe inner equi-join of `fact` and `dim` on `key`.
    *
    * The salt must be deterministic for oracle replay, so it hashes
    * the full fact row (`saltCols` — pass a unique id when one
    * exists, stable across retries) rather than using `rand()`.
    *
    * @param fact     large, skewed side; all columns survive
    * @param dim      small-ish side; all its non-key columns survive
    * @param key      equi-join column name (present both sides)
    * @param salts    fan-out per key (≈ max observed skew multiple)
    * @param saltCols fact columns whose hash spreads the hot key
    */
  def skewJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
               saltCols: Seq[Column]): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = fact.withColumn("__salt", pmod(hash(saltCols: _*), lit(salts)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
