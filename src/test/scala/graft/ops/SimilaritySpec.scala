package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** E2: dot/cosine kernels, brute-force top-k, LSH ANN recall. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dot product matches manual computation (float arrays)") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b"))).as[Double].collect()(0)
    assert(got == (4.0 + 10.0 + 18.0))
  }
  test("cosine of identical vectors is 1.0") {
    val df = Seq((Array(0.5f, -0.25f), Array(0.5f, -0.25f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()(0)
    assert(math.abs(got - 1.0) < 1e-12)
  }
  test("brute-force top-k: k rows, descending, query row excluded") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val rows = Similarity.topKByCosine(e, 0L, 10).collect()
    assert(rows.length == 10)
    assert(!rows.map(_.getLong(0)).contains(0L))
    val scores = rows.map(_.getDouble(1)).toSeq
    assert(scores == scores.sorted.reverse)
  }
  test("ANN LSH recalls a planted near-identical vector") {
    // LSH recall is a function of similarity: near-identical vectors
    // collide in (essentially) every band. Plant a slightly-perturbed
    // copy of the query vector and require ANN to surface it first.
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val q = e.filter(col("vec_id") === 0L)
      .select(col("embedding")).as[Seq[Float]].collect()(0)
    val planted = q.zipWithIndex.map { case (v, i) =>
      v + (if (i % 7 == 0) 0.001f else -0.001f)
    }
    val withPlant = e.unionByName(
      Seq((999999L, planted, 0)).toDF("vec_id", "embedding", "label"))
    val ann = Similarity.annTopK(withPlant, 0L, 5).collect()
    assert(ann.head.getLong(0) == 999999L)
    assert(ann.head.getDouble(1) > 0.99)
  }
  test("near-dup pairs are id_a < id_b and above threshold") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val rows = Similarity.nearDupPairs(e, col("label"), 0.30).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall(_.getDouble(2) >= 0.30))
  }
  test("sharedNearDupPairs: equal corpus plans alias, results match the plain join") {
    // one blocked self-join per (session, corpus, threshold): the
    // q_embed_neardup / q_dup_clusters / q_incr_clusters /
    // q_leakage_split sharing, and the artifact equals the uncached
    // operator
    def e = Tables.embeddings(spark, SparkTestSession.Sf)
    val r1 = Similarity.sharedNearDupPairs(e, col("label"), 0.30,
      cacheKey = Some("sndp_spec"))
    val r2 = Similarity.sharedNearDupPairs(e, col("label"), 0.30,
      cacheKey = Some("sndp_spec"))
    assert(r1 eq r2, "equal corpus plans must read one cached artifact")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
    assert(pairs(r1) == pairs(Similarity.nearDupPairs(e, col("label"), 0.30)))
    // a different threshold under the same key never aliases
    val other = Similarity.sharedNearDupPairs(e, col("label"), 0.50,
      cacheKey = Some("sndp_spec"))
    assert(!(other eq r1), "different params must never alias")
  }
  test("saveNearDupPairs/loadNearDupPairs round-trips; policy reads the loaded artifact") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val pairs = Similarity.nearDupPairs(e, col("label"), 0.30)
    val dir = java.nio.file.Files.createTempDirectory("ndp_art").toString
    Similarity.saveNearDupPairs(pairs, threshold = 0.30, roundTo = 6, dir)
    val (loaded, thr, rnd) = Similarity.loadNearDupPairs(spark, dir)
    assert(thr == 0.30 && rnd == 6)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("id_a", "id_b").as[(Long, Long, Double)].collect().toSeq
    assert(rows(loaded) == rows(pairs))
    // a fresh session's policy layer runs off the loaded artifact: the
    // cluster closure over the persisted table equals the one over the
    // freshly derived pairs — no re-derivation pass
    def comps(p: org.apache.spark.sql.DataFrame) =
      ConnectedComponents.components(p, "id_a", "id_b")
        .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(comps(loaded) == comps(pairs))
    // a manifest missing the geometry fails loudly
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "params.json"),
      """{"threshold":0.3}""".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      Similarity.loadNearDupPairs(spark, dir)
    }
  }
  test("IVF cell kernel matches the unrolled cosine-argmax form") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val cents = Similarity.ivfCentroids(e, 16)
    // reference semantics: array_position of the max cosine, first wins
    val scores = array(cents.map(c =>
      Similarity.cosine(col("embedding"), typedLit(c.toSeq))): _*)
    val unrolled = (array_position(scores, array_max(scores)) - 1).cast("int")
    val diff = e.select(
      Similarity.ivfCell(col("embedding"), cents).as("fast"), unrolled.as("slow"))
      .filter(col("fast") =!= col("slow")).count()
    assert(diff == 0)
  }
  test("probe-cells kernel: nProbe cells, best cell first") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val cents = Similarity.ivfCentroids(e, 16)
    val rows = e.limit(50).select(
      Similarity.ivfCell(col("embedding"), cents).as("cell"),
      Similarity.ivfProbeCells(col("embedding"), cents, 4).as("probes"))
      .collect()
    rows.foreach { r =>
      val probes = r.getSeq[Int](1)
      assert(probes.length == 4 && probes.distinct.length == 4)
      assert(probes.head == r.getInt(0)) // argmax == first probe
    }
  }
  test("batch ANN (LSH): per-query k rows, rank ordered, self excluded") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val queries = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val rows = Similarity.annTopKBatch(e, queries, k = 5)
      .orderBy(col("query_id"), col("rank")).collect()
    val byQuery = rows.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L))
    byQuery.values.foreach { rs =>
      assert(rs.length <= 5)
      assert(rs.map(_.getLong(3)).toSeq == (1L to rs.length.toLong))
      val scores = rs.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse)
      assert(!rs.exists(r => r.getLong(1) == r.getLong(0))) // no self-match
    }
  }
  test("batch ANN (IVF) agrees with single-query ivfTopK on its top hit") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val queries = e.filter(col("vec_id") === 0L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val batch = Similarity.ivfTopKBatch(e, queries, k = 5)
      .orderBy(col("rank")).collect()
    val single = Similarity.ivfTopK(e, 0L, 5).collect()
    assert(batch.head.getLong(1) == single.head.getLong(0))
    assert(batch.head.getDouble(2) == single.head.getDouble(1))
  }
  test("kmeans centroids: trained shapes, bounded driver rows, recall holds") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val trained = Similarity.kmeansCentroids(e, nCentroids = 8, iterations = 2)
    assert(trained.length == 8)
    assert(trained.forall(c => c.length == trained.head.length &&
      c.forall(v => !v.isNaN && !v.isInfinite)))
    // training moved at least one centroid off its sampled seed
    val seeded = Similarity.ivfCentroids(e, 8)
    assert(trained.zip(seeded).exists { case (t, s) => !t.sameElements(s) })
    // ANN over trained centroids still finds the brute-force top hit
    val exact = Similarity.topKByCosine(e, 3L, 5).collect().map(_.getLong(0)).toSet
    val ann = Similarity.ivfTopK(e, 3L, 5, nCentroids = 8, nProbe = 4,
      trainIterations = 2).collect().map(_.getLong(0)).toSet
    assert(ann.size == 5)
    assert(ann.intersect(exact).nonEmpty, s"no overlap: ann=$ann exact=$exact")
  }

  test("semanticContamination: flags an exact copy, excludes the self-match, bench-bounded") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val bench = e.filter(col("vec_id") % 10 === 0)
    // plant an exact copy of bench vector 0 under a fresh corpus id
    val copy = e.filter(col("vec_id") === 0)
      .withColumn("vec_id", lit(999999L))
    val flagged = Similarity.semanticContamination(
      e.unionByName(copy), bench, threshold = 0.99)
      .as[(Long, Long, Double)].collect()
    assert(flagged.exists(r => r._1 == 999999L && r._2 == 0L && r._3 >= 0.99),
      s"planted copy not flagged: ${flagged.toSeq}")
    // no self-matches, and every bench_id is from the benchmark set
    assert(!flagged.exists(r => r._1 == r._2))
    assert(flagged.forall(_._2 % 10 == 0))
  }

  test("extendSemIndex: a new eval suite is probe-able; geometry fixed; equals rebuild") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val bench1 = e.filter(col("vec_id") % 25 === 0)
    val bench2 = e.filter(col("vec_id") % 25 === 7) // a later eval suite
    val idx0 = Similarity.buildSemIndex(e, bench1)
    val idx1 = Similarity.extendSemIndex(idx0, bench2)
    def hits(ix: Similarity.SemIndex) =
      Similarity.probeSemIndex(ix, e, threshold = 0.30)
        .as[(Long, Long, Double)].collect().toSet
    // extended == a from-scratch build over BOTH suites (the corpus
    // geometry is the same either way: cents derive from the corpus)
    val rebuilt = Similarity.buildSemIndex(e, bench1.unionByName(bench2))
    assert(hits(idx1) == hits(rebuilt))
    // the new suite contributes flags the old index couldn't see
    assert(hits(idx1).exists(_._2 % 25 == 7))
    // the old snapshot is untouched
    assert(hits(idx0).forall(_._2 % 25 == 0))
    // geometry is shared, not retrained: same centroid arrays
    assert(idx1.cents eq idx0.cents)
  }

  test("save/load SemIndex: centroids round-trip bit-exactly; probes identical") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val idx = Similarity.buildSemIndex(e, e.filter(col("vec_id") % 25 === 0))
    val path = java.nio.file.Files.createTempDirectory("semidx").toString
    Similarity.saveSemIndex(idx, path)
    val loaded = Similarity.loadSemIndex(spark, path)
    // Double.toString round-trips: the geometry is BIT-identical, so
    // every cell assignment (and therefore every probe) matches
    assert(loaded.cents.length == idx.cents.length)
    loaded.cents.zip(idx.cents).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
    def hits(ix: Similarity.SemIndex) =
      Similarity.probeSemIndex(ix, e, threshold = 0.30)
        .as[(Long, Long, Double)].collect().toSet
    assert(hits(loaded) == hits(idx))
    assert(hits(loaded).nonEmpty)
  }

  test("semanticContamination agrees with the brute-force gate on probed cells") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf).limit(200).cache()
    val bench = e.filter(col("vec_id") % 25 === 0)
    val got = Similarity.semanticContamination(e, bench, threshold = 0.30)
      .select("vec_id", "bench_id").as[(Long, Long)].collect().toSet
    // brute: every (corpus, bench) pair over threshold — the IVF probe
    // may miss pairs outside the probed cells (recall < 1 by design)
    // but must never INVENT a pair or misscore one
    val brute = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .crossJoin(bench.select(col("vec_id").as("b"), col("embedding").as("eb")))
      .filter(col("a") =!= col("b"))
      .withColumn("s", round(Similarity.cosine(col("ea"), col("eb")), 6))
      .filter(col("s") >= 0.30)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got.subsetOf(brute), s"invented pairs: ${got -- brute}")
    assert(got.nonEmpty)
    e.unpersist()
  }

  test("semanticContamination: empty benchmark flags nothing, never crashes") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf)
    val out = Similarity.semanticContamination(
      e, e.filter(col("vec_id") < 0), threshold = 0.0)
    assert(out.count() == 0L)
  }

  test("hardNegatives: k per anchor, labels all differ, agrees with brute force") {
    val e = Tables.embeddings(spark, SparkTestSession.Sf).cache()
    val anchors = e.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"), col("label"))
    val got = Similarity.hardNegatives(e, anchors, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3), r.getLong(4)))
    val anchorLabels = anchors.select("query_id", "label")
      .as[(Long, Int)].collect().toMap
    // k rows per anchor, every negative's label differs from its anchor's
    got.groupBy(_._1).foreach { case (qid, rows) =>
      assert(rows.length == 5, s"anchor $qid")
      assert(rows.forall(_._3 != anchorLabels(qid)), s"same-label row for $qid")
      val scores = rows.sortBy(_._5).map(_._4).toSeq
      assert(scores == scores.sorted.reverse, s"rank order broken for $qid")
    }
    // brute-force agreement for anchor 0
    val a0 = e.filter(col("vec_id") === 0).select("embedding", "label")
      .as[(Array[Float], Int)].head()
    val brute = e.filter(col("vec_id") =!= 0 && col("label") =!= a0._2)
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding"),
          typedLit(a0._1.toSeq)), 6).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(5)
      .select("vec_id").as[Long].collect().toSeq
    assert(got.filter(_._1 == 0L).sortBy(_._5).map(_._2).toSeq == brute)
    e.unpersist()
  }

  test("jaccardSorted kernel equals declarative intersect/union form") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("a")),
      (Seq("a"), Seq("b")),
      (Seq[String](), Seq[String]())).toDF("a", "b")
    val rows = df.select(
      graft.functions.ArrayExprs.jaccardSorted(col("a"), col("b")).as("fast"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        size(array_distinct(concat(col("a"), col("b")))).cast("double")).as("slow"))
      .collect()
    assert(rows(0).getDouble(0) == 0.5 && rows(0).getDouble(1) == 0.5)
    assert(rows(1).getDouble(0) == 1.0)
    assert(rows(2).getDouble(0) == 0.0)
    assert(rows(3).getDouble(0) == 0.0) // 0/0 defined as 0, vs NaN declaratively
  }
}
