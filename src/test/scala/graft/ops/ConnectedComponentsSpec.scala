package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Min-label propagation: each node's component label must be the
  * minimum id reachable through the undirected edge set.
  */
class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def run(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.components(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  test("two disjoint components each labeled by their minimum id") {
    val got = run(Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("a chain converges to one component (worst-case diameter)") {
    val chain = (0L until 9L).map(i => (i, i + 1))
    val got = run(chain)
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to 9L).toSet)
  }

  test("edge direction does not matter") {
    assert(run(Seq((5L, 1L), (1L, 3L))) == Map(1L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("a triangle with a bridge merges into one component") {
    val got = run(Seq((2L, 3L), (3L, 4L), (4L, 2L), (4L, 9L), (9L, 8L)))
    assert(got.values.toSet == Set(2L))
  }

  test("pointer jumping converges in O(log diameter) rounds on a 512-node path") {
    // A path graph is the worst case for plain label propagation
    // (O(diameter) rounds). Pointer jumping halves the remaining
    // distance per round, so a diameter-511 path must converge in
    // ceil(log2(511)) + 2 = 11 rounds — the property the 100 TB-scale
    // claim rests on. Plain propagation would need 511 rounds and
    // trip the default maxIter long before finishing.
    val d = 511
    val path = (0L until d.toLong).map(i => (i, i + 1))
    val (labels, rounds) = ConnectedComponents.componentsWithRounds(
      path.toDF("a", "b"), "a", "b", maxIter = 40)
    val bound = math.ceil(math.log(d.toDouble) / math.log(2.0)).toInt + 2
    assert(rounds <= bound, s"took $rounds rounds; log-diameter bound is $bound")
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(0L))
    assert(got.keySet == (0L to d.toLong).toSet)
  }

  private def labelsOf(idx: ConnectedComponents.ClusterIndex): Map[Long, Long] =
    idx.labels.as[(Long, Long)].collect().toMap

  test("ClusterIndex.extendIndex == components over all pairs at two split points") {
    // evidence stream with every merge shape: internal no-op pairs,
    // a bridging pair joining two standing components, novel ids
    // joining a component, a novel id BELOW the standing minimum
    // (the label itself must move), and a fresh novel component
    val all = Seq(
      (10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), // wave 0
      (10L, 12L),                                      // internal no-op
      (12L, 20L),                                      // bridge {10..12}+{20,21}
      (21L, 40L),                                      // novel joins
      (5L, 30L),                                       // novel NEW MIN for {30,31}
      (50L, 51L))                                      // fresh novel component
    def df(s: Seq[(Long, Long)]) = s.toDF("id_a", "id_b")
    val truth = ConnectedComponents.components(df(all), "id_a", "id_b")
      .as[(Long, Long)].collect().toMap
    for (cut <- Seq(4, 6)) {
      val idx0 = ConnectedComponents.train(df(all.take(cut)), "id_a", "id_b")
      val ext = ConnectedComponents.extendIndex(idx0, df(all.drop(cut)),
        "id_a", "id_b")
      assert(labelsOf(ext) == truth, s"cut $cut diverged from full propagation")
    }
    // no disjointness precondition: RE-FOLDING already-seen evidence
    // (the re-crawled-duplicate case that corrupts the other indexes)
    // resolves to self-edges and merges nothing
    val idx = ConnectedComponents.train(df(all), "id_a", "id_b")
    val refold = ConnectedComponents.extendIndex(idx, df(all), "id_a", "id_b")
    assert(labelsOf(refold) == truth, "re-folded evidence must be a no-op")
    // and an empty batch leaves the table unchanged
    assert(labelsOf(ConnectedComponents.extendIndex(idx,
      df(Seq.empty), "id_a", "id_b")) == truth)
  }

  test("extendIndex == union-find truth over random graphs at random split points (seeded sweep)") {
    // the hand-built split-point spec above pins the five merge
    // shapes; this sweep pins the CONTRACT on arbitrary topology —
    // random multigraphs (duplicate edges, both orientations, dense
    // and sparse), a uniformly random standing/batch cut (including
    // empty standing: train on nothing, fold everything), truth from
    // an independent driver-side union-find, and a re-fold
    // idempotence check per trial
    val rnd = new scala.util.Random(20260817L)
    def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(x => x -> find(x)).toMap
    }
    for (trial <- 1 to 6) {
      val nNodes = 6 + rnd.nextInt(30)
      val pairs = Seq.fill(1 + rnd.nextInt(40))(
        (rnd.nextInt(nNodes).toLong, rnd.nextInt(nNodes).toLong))
        .filter { case (a, b) => a != b }
      if (pairs.nonEmpty) {
        val truth = unionFind(pairs)
        val cut = rnd.nextInt(pairs.size + 1)
        val (standing, batch) = pairs.splitAt(cut)
        val idx = ConnectedComponents.train(
          standing.toDF("id_a", "id_b"), "id_a", "id_b")
        val ext = ConnectedComponents.extendIndex(idx,
          batch.toDF("id_a", "id_b"), "id_a", "id_b")
        assert(labelsOf(ext) == truth,
          s"trial $trial (cut $cut of ${pairs.size}) diverged from union-find")
        val refold = ConnectedComponents.extendIndex(ext,
          batch.toDF("id_a", "id_b"), "id_a", "id_b")
        assert(labelsOf(refold) == truth, s"trial $trial re-fold not a no-op")
      }
    }
  }

  test("saveComponents/loadComponents round-trips; a fresh session's extend continues the artifact") {
    val w0 = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val w1 = Seq((12L, 20L), (5L, 10L)).toDF("id_a", "id_b")
    val idx = ConnectedComponents.train(w0, "id_a", "id_b")
    val dir = java.nio.file.Files.createTempDirectory("cc_index_art").toString
    ConnectedComponents.saveComponents(idx, dir)
    val loaded = ConnectedComponents.loadComponents(spark, dir)
    assert(loaded.maxIter == idx.maxIter)
    assert(labelsOf(loaded) == labelsOf(idx))
    // the persisted artifact serves the next crawl wave — extend on
    // the LOADED table equals the full propagation over everything
    val truth = ConnectedComponents.components(w0.unionByName(w1),
      "id_a", "id_b").as[(Long, Long)].collect().toMap
    assert(labelsOf(ConnectedComponents.extendIndex(loaded, w1,
      "id_a", "id_b")) == truth)
    // manifest hygiene: a manifest missing its bound refuses to load
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "params.json"), """{}""")
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.loadComponents(spark, dir) }
    assert(e.getMessage.contains("params.json missing maxIter"))
  }

  test("sharedComponents: same pair plan aliases, a different pair table never does") {
    // the session-shared cluster artifact: two callers handing in
    // semantically equal pair plans read ONE propagation result
    // (object-identical cached frame), while a different pair table
    // under the same cacheKey gets its own clusters — the plan-hash
    // keying that makes sharing safe
    def pairsA = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val r1 = ConnectedComponents.sharedComponents(pairsA, "id_a", "id_b",
      cacheKey = Some("cc_spec"))
    val r2 = ConnectedComponents.sharedComponents(pairsA, "id_a", "id_b",
      cacheKey = Some("cc_spec"))
    assert(r1 eq r2, "equal pair plans must read one cached artifact")
    assert(r1.as[(Long, Long)].collect().toMap ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    val other = ConnectedComponents.sharedComponents(
      Seq((5L, 6L)).toDF("id_a", "id_b"), "id_a", "id_b",
      cacheKey = Some("cc_spec"))
    assert(!(other eq r1), "different pair tables must never alias")
    assert(other.as[(Long, Long)].collect().toMap == Map(5L -> 5L, 6L -> 5L))
    // and the no-key path stays a plain compute
    val plain = ConnectedComponents.sharedComponents(pairsA, "id_a", "id_b")
    assert(plain.as[(Long, Long)].collect().toMap ==
      r1.as[(Long, Long)].collect().toMap)
  }
}
