package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

class ShardingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val assigned = Sharding.assign(
    Tables.documents(spark, SparkTestSession.Sf),
    col("doc_id"), col("n_chars"), nShards = 16, strata = 8).cache()

  test("every document gets exactly one shard in [0, n)") {
    val n = Tables.documents(spark, SparkTestSession.Sf).count()
    assert(assigned.count() == n)
    assert(assigned.select("id").distinct().count() == n)
    val range = assigned.agg(min("shard"), max("shard")).head()
    assert(range.getLong(0) >= 0 && range.getLong(1) < 16)
  }

  test("the deal is exact: per-shard doc counts within a stratum differ by <= 1") {
    // THE round-robin guarantee itself — not an expected-value bound:
    // consecutive docs (in weight order) go to consecutive shards, so
    // within each stratum no shard can hold 2 more docs than another
    val counts = assigned.groupBy("bucket", "shard").count()
      .groupBy("bucket")
      .agg((max("count") - min("count")).as("spread"), count(lit(1)).as("nsh"))
      .select("spread").as[Long].collect()
    assert(counts.forall(_ <= 1), counts.toSeq.toString)
  }

  test("shard token mass is balanced (deterministic deal bound)") {
    val mass = assigned.groupBy("shard").agg(sum("weight").as("m"))
      .select("m").as[Long].collect()
    assert(mass.length == 16)
    val mean = mass.sum.toDouble / mass.length
    // sort-and-deal: worst shard within the summed per-stratum weight
    // spreads of the mean — empirically < 10% at 500 docs / 16 shards
    // (plain hash-mod on this corpus exceeds 35%)
    assert(mass.forall(m => math.abs(m - mean) / mean < 0.10),
      s"imbalance: ${mass.sorted.toSeq} mean=$mean")
  }

  test("assignment is deterministic and layout-independent") {
    val again = Sharding.assign(
      Tables.documents(spark, SparkTestSession.Sf).repartition(13),
      col("doc_id"), col("n_chars"), nShards = 16, strata = 8)
    assert(assigned.select("id", "shard").except(
      again.select("id", "shard")).isEmpty)
  }

  test("out-of-range ids fail loudly, never silently skew") {
    // the Knuth scramble's documented precondition (id < 2^31) is
    // ENFORCED: past it, Spark's non-ANSI wraparound and the oracle's
    // exact arithmetic diverge, so the job must die, not drift
    val bad = Seq((1L, 10L), ((1L << 31) + 5L, 20L)).toDF("doc_id", "n_chars")
    val ex = intercept[Exception] {
      Sharding.assign(bad, col("doc_id"), col("n_chars"),
        nShards = 4, strata = 2, numRanges = 2).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    assert(messages(ex).exists(_.contains("id must be in [0, 2^31)")),
      s"unexpected failure: $ex")
    val neg = Seq((-3L, 10L), (1L, 20L)).toDF("doc_id", "n_chars")
    val ex2 = intercept[Exception] {
      Sharding.assign(neg, col("doc_id"), col("n_chars"),
        nShards = 4, strata = 2, numRanges = 2).collect()
    }
    assert(messages(ex2).exists(_.contains("id must be in [0, 2^31)")))
  }

  test("strata are equi-depth (each holds ~n/k docs)") {
    val per = assigned.groupBy("bucket").count()
      .select("count").as[Long].collect()
    assert(per.length == 8)
    assert(per.max - per.min <= per.sum / 8 / 2, per.sorted.toSeq.toString)
  }
}
