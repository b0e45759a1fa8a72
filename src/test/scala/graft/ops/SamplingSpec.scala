package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Deterministic sampling/mixing: layout-independence (the property
  * rand() lacks), rate accuracy, quota math.
  */
class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf
  import spark.implicits._

  private def ids(n: Int) = (0L until n.toLong).toDF("id")

  test("uniform sample is layout-independent: same rows at any partitioning") {
    val base = ids(5000)
    val a = Sampling.uniform(base, col("id"), 0.2)
      .as[Long].collect().sorted.toSeq
    val b = Sampling.uniform(base.repartition(17), col("id"), 0.2)
      .as[Long].collect().sorted.toSeq
    val c = Sampling.uniform(base.coalesce(1), col("id"), 0.2)
      .as[Long].collect().sorted.toSeq
    assert(a == b && b == c)
  }

  test("boundary id 2^31 - 1 is valid; 2^31 is not") {
    val edge = Seq((1L << 31) - 1, 0L).toDF("id")
    // must not raise: the precondition is id < 2^31, inclusive below
    assert(Sampling.uniform(edge, col("id"), 1.0).count() == 2)
    val over = Seq(1L << 31).toDF("id")
    intercept[Exception](Sampling.uniform(over, col("id"), 1.0).collect())
  }

  test("NULL ids propagate a NULL bucket (row dropped), never a messageless error") {
    val df = Seq(Some(1L), None, Some(5L)).toDF("id")
    // the NULL row falls out of the < filter — the pre-guard behavior,
    // not a raise_error with a NULL message
    assert(Sampling.uniform(df, col("id"), 1.0).count() == 2)
    val buckets = df.select(Sampling.hashBucket(col("id"), 10).as("b"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(buckets.count(_.isEmpty) == 1 && buckets.count(_.isDefined) == 2)
  }

  test("out-of-range ids fail loudly (the scramble's 2^31 precondition)") {
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ messages(e.getCause))
    val bad = Seq(1L, (1L << 31) + 7L).toDF("id")
    val ex = intercept[Exception](Sampling.uniform(bad, col("id"), 0.5).collect())
    assert(messages(ex).exists(_.contains("id must be in [0, 2^31)")), s"$ex")
    val neg = Seq(-1L, 2L).toDF("id")
    val ex2 = intercept[Exception](Sampling.uniformK(neg, col("id"), 1).collect())
    assert(messages(ex2).exists(_.contains("id must be in [0, 2^31)")), s"$ex2")
  }

  test("uniform rate is accurate on sequential ids") {
    val n = 20000
    val got = Sampling.uniform(ids(n), col("id"), 0.1).count().toDouble
    assert(math.abs(got / n - 0.1) < 0.02, s"rate ${got / n}")
  }

  test("uniform sample is not a prefix/suffix (the scramble decorrelates)") {
    val kept = Sampling.uniform(ids(1000), col("id"), 0.1)
      .as[Long].collect().toSet
    // ids from every quartile survive
    assert(Seq(0L, 250L, 500L, 750L).forall(q => kept.exists(id => id >= q && id < q + 250)))
  }

  test("stratified rates hold per stratum") {
    val docs = Tables.documents(spark, dir)
    val out = Sampling.stratified(docs, col("lang"), col("doc_id"),
      Map("en" -> 5000), defaultBp = 0)
    val langs = out.select("lang").distinct().as[String].collect().toSet
    assert(langs == Set("en")) // zero-rate strata fully excluded
    val en = docs.filter(col("lang") === "en").count().toDouble
    val got = out.count().toDouble
    assert(math.abs(got / en - 0.5) < 0.15, s"en rate ${got / en}")
  }

  test("uniformK returns exactly k stable rows") {
    val a = Sampling.uniformK(ids(5000), col("id"), 37).as[Long].collect().toSet
    val b = Sampling.uniformK(ids(5000).repartition(11), col("id"), 37)
      .as[Long].collect().toSet
    assert(a.size == 37 && a == b)
  }

  test("mixByQuota keeps top-priority rows per source, quota-capped") {
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
      ("b", 4L, 5.0), ("b", 5L, 1.0)).toDF("src", "id", "prio")
    val out = Sampling.mixByQuota(df, col("src"), col("id"),
      Map("a" -> 2L), defaultQuota = 1L, priority = col("prio"))
      .select("id").as[Long].collect().toSet
    assert(out == Set(2L, 3L, 4L)) // a: top-2 by prio; b: top-1
  }

  test("temperatureQuotas: T=1 proportional, T->inf flattens, caps at size") {
    val counts = Map("big" -> 900L, "small" -> 100L)
    val t1 = Sampling.temperatureQuotas(counts, 1.0, 100)
    assert(t1("big") == 90L && t1("small") == 10L)
    val flat = Sampling.temperatureQuotas(counts, 1e9, 100)
    assert(math.abs(flat("big") - flat("small")) <= 1)
    // budget above corpus size: quotas cap at each source's count
    val capped = Sampling.temperatureQuotas(counts, 1.0, 5000)
    assert(capped("big") <= 900L && capped("small") <= 100L)
    assert(capped.values.sum == 1000L)
    // quotas always sum to min(budget, corpus)
    assert(t1.values.sum == 100L)
  }

  test("temperatureQuotas: 0<T<1 sharpens toward big sources") {
    val counts = Map("big" -> 900L, "small" -> 100L)
    val sharp = Sampling.temperatureQuotas(counts, 0.5, 100)
    assert(sharp("big") > 90L && sharp("small") < 10L)
  }

  test("topFractionPerGroup keeps floor(n*bp/10000) best rows per group") {
    // group a: 10 rows scored by id; group b: 3 rows
    val df = ((0L until 10L).map(i => ("a", i, i.toDouble)) ++
      Seq(("b", 100L, 5.0), ("b", 101L, 1.0), ("b", 102L, 9.0)))
      .toDF("src", "id", "score")
    val out = Sampling.topFractionPerGroup(df, col("src"), col("score"),
      col("id"), keepBp = 7000)
    val byGroup = out.collect().groupBy(_.getString(0))
    // a: floor(10*0.7)=7 best scores = ids 3..9; b: floor(3*0.7)=2 -> 102,100
    assert(byGroup("a").map(_.getLong(1)).sorted.toSeq == (3L to 9L))
    assert(byGroup("b").map(_.getLong(1)).sorted.toSeq == Seq(100L, 102L))
  }

  test("topFractionPerGroup: ties cut deterministically by id; 0 and 10000 bp") {
    val ties = Seq(("s", 1L, 5.0), ("s", 2L, 5.0), ("s", 3L, 5.0),
      ("s", 4L, 5.0)).toDF("src", "id", "score")
    val kept = Sampling.topFractionPerGroup(ties, col("src"), col("score"),
      col("id"), keepBp = 5000).select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(1L, 2L)) // smallest ids win equal scores
    assert(Sampling.topFractionPerGroup(ties, col("src"), col("score"),
      col("id"), 0).count() == 0)
    assert(Sampling.topFractionPerGroup(ties, col("src"), col("score"),
      col("id"), 10000).count() == 4)
  }

  test("topFractionPerGroup plans ONE exchange for both windows") {
    val df = (0L until 100L).map(i => (s"s${i % 3}", i, i * 1.5))
      .toDF("src", "id", "score")
    val plan = Sampling.topFractionPerGroup(df, col("src"), col("score"),
      col("id"), 7000).queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges <= 1, s"rank+count windows should share one shuffle:\n$plan")
  }

  test("leakageSafeSplit: clusters never straddle the boundary; singletons split at the row rate") {
    val rows = ids(4000)
    // chain clusters of 4: (0,1),(1,2),(2,3), (4,5),(5,6),(6,7), ... over
    // the first 2000 ids; ids 2000+ are singletons
    val pairs = (0L until 2000L).filter(i => i % 4 != 3)
      .map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Sampling.leakageSafeSplit(rows, col("id"), pairs, valBp = 2000)
      .as[(Long, Long, String)].collect().toSeq
    assert(got.length == 4000)
    // every member of a cluster carries the cluster min and ONE split
    val byGroup = got.groupBy(_._2)
    byGroup.foreach { case (g, ms) =>
      assert(ms.map(_._3).distinct.length == 1, s"cluster $g straddles")
    }
    for (i <- 0L until 2000L)
      assert(got.find(_._1 == i).get._2 == (i / 4) * 4, s"id $i group")
    // singletons are their own group and split like uniform(p)
    val single = got.filter(_._1 >= 2000L)
    assert(single.forall(r => r._2 == r._1))
    val valFrac = single.count(_._3 == "val").toDouble / single.length
    assert(valFrac > 0.15 && valFrac < 0.25, s"singleton val rate $valFrac")
    // a duplicated pair's two sides agree even when the hash of their
    // OWN ids would disagree (the leak the op exists to prevent)
    val leaky = (0L until 2000L).exists { i =>
      val r = got.find(_._1 == i).get
      val own = (i * Sampling.KnuthC) % 10000 < 2000
      (r._3 == "val") != own
    }
    assert(leaky, "fixture too weak: no row where cluster split != row split")
    // the cacheKey path routes through the session-shared cluster
    // artifact and answers identically (the q_leakage_split sharing)
    val shared = Sampling.leakageSafeSplit(rows, col("id"), pairs,
        valBp = 2000, cacheKey = Some("lss_spec"))
      .as[(Long, Long, String)].collect().toSeq
    assert(shared.sorted == got.sorted)
  }
}
