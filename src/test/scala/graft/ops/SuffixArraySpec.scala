package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** E1 depth: distributed suffix ranking by prefix doubling, checked
  * against brute-force suffix sorts (the strongest possible check —
  * the op's whole output, not single properties).
  */
class SuffixArraySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Brute-force dense suffix ranks capped at `cap` chars. */
  private def bruteRanks(docs: Seq[(Long, String)], cap: Int): Seq[(Long, Long, Long)] = {
    val sufs = for ((id, t) <- docs; p <- 0 until t.length)
      yield (id, p.toLong, t.substring(p).take(cap))
    val rank = sufs.map(_._3).distinct.sorted.zipWithIndex.toMap
    sufs.map { case (id, p, s) => (id, p, rank(s) + 1L) }
      .sortBy(x => (x._1, x._2))
  }

  test("suffixRanks: equals a brute-force suffix sort (hand corpus)") {
    val docs = Seq((1L, "banana"), (2L, "ana"), (3L, "bandana"))
    val got = SuffixArray.suffixRanks(docs.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .orderBy("doc_id", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(got == bruteRanks(docs, Int.MaxValue))
    // dense semantics: doc 2's "ana" suffixes tie doc 1's exactly
    val r = got.map { case (d, p, rk) => (d, p) -> rk }.toMap
    assert(r((2L, 0L)) == r((1L, 3L)), "identical suffixes share a rank")
    assert(r((2L, 2L)) < r((1L, 1L)), "'a' sorts before 'anana' (prefix first)")
  }

  test("suffixRanks: full corpus equals brute force at sf0.001") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    val docs = docsDf.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val got = SuffixArray.suffixRanks(docsDf, col("doc_id"), col("text"),
        maxDepth = 64)
      .orderBy("doc_id", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(got == bruteRanks(docs, 64))
  }

  test("suffixRanks: partitioning-independent") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    val a = SuffixArray.suffixRanks(docsDf, col("doc_id"), col("text"),
        maxDepth = 16)
      .orderBy("doc_id", "pos").as[(Long, Long, Long)].collect().toSeq
    val b = SuffixArray.suffixRanks(docsDf.repartition(7), col("doc_id"),
        col("text"), maxDepth = 16)
      .orderBy("doc_id", "pos").as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("suffixRanks: empty and all-NULL corpora return empty, not NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SuffixArray.suffixRanks(empty, col("doc_id"), col("text"))
      .collect().isEmpty)
    val nulls = Seq((1L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(SuffixArray.suffixRanks(nulls, col("doc_id"), col("text"))
      .collect().isEmpty)
  }

  test("repeatGroups: exact cross-doc classes with canonical labels") {
    val shared = "the quick brown fox jumps over a dam" // 36 chars
    val docs = Seq(
      (1L, s"xx$shared tail one"),
      (2L, s"$shared tail two"),
      (3L, s"unrelated $shared"),
      // internal repeat only (same doc twice) must NOT qualify
      (4L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz qq " +
        "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")
    ).toDF("doc_id", "text")
    val got = SuffixArray.repeatGroups(docs, col("doc_id"), col("text"),
        minLen = 32)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // the three planted copies of `shared` (positions 2, 0, 10) are in
    // one class labeled by its minimum (doc, pos) = (1, 2)
    val planted = got.filter { case (_, _, gd, gp) => gd == 1L && gp == 2L }
    assert(planted.map(t => (t._1, t._2)).toSet
      .intersect(Set((1L, 2L), (2L, 0L), (3L, 10L))) ==
      Set((1L, 2L), (2L, 0L), (3L, 10L)))
    assert(!got.exists(_._1 == 4L),
      "within-doc-only repeats are excluded (n_docs >= 2)")
    // every class label is a member of its own class
    val byGrp = got.groupBy(t => (t._3, t._4))
    byGrp.foreach { case ((gd, gp), ms) =>
      assert(ms.exists(m => m._1 == gd && m._2 == gp))
      assert(ms.map(_._1).distinct.size >= 2)
    }
  }

  test("scrubRepeats: equals an independent brute-force scrub at sf0.001") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    val docs = docsDf.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    // independent path: brute 32-gram classes -> union of non-canonical
    // covers -> strip
    val elig = for ((id, t) <- docs; p <- 0 to t.length - 32)
      yield (id, p, t.substring(p, p + 32))
    val covered = elig.groupBy(_._3).values
      .filter(g => g.size >= 2 && g.map(_._1).distinct.size >= 2)
      .flatMap { g =>
        val canon = g.minBy(x => (x._1, x._2))
        g.filterNot(_ == canon).flatMap(m => (m._2 until m._2 + 32).map((m._1, _)))
      }.toSet
    val expected = docs.sortBy(_._1).map { case (id, t) =>
      val keptChars = t.zipWithIndex.collect {
        case (c, i) if !covered((id, i)) => c
      }.mkString
      (id, keptChars, (t.length - keptChars.length).toLong)
    }
    val got = SuffixArray.scrubRepeats(docsDf, col("doc_id"), col("text"),
        minLen = 32)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(got == expected)
    // accounting: n_dropped is exactly the character delta, per doc
    got.foreach { case (id, t, d) =>
      val orig = docs.find(_._1 == id).get._2
      assert(d == orig.length - t.length, s"doc $id accounting")
    }
    assert(got.exists(_._3 > 0), "fixture must actually scrub something")
  }

  test("sharedRepeatGroups: session cache never aliases across corpora") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    val a = SuffixArray.sharedRepeatGroups(docsDf, col("doc_id"),
      col("text"), 32, Some("specA")).count()
    val b = SuffixArray.sharedRepeatGroups(docsDf, col("doc_id"),
      col("text"), 32, Some("specA")).count()
    assert(a == b, "same corpus + key must reuse the artifact")
    val half = docsDf.filter(col("doc_id") % 2 === 0)
    val c = SuffixArray.sharedRepeatGroups(half, col("doc_id"),
      col("text"), 32, Some("specA")).count()
    assert(c != a, "a different corpus under the same key must rebuild")
  }

  test("repeatGroups: equals brute-force 32-gram grouping at sf0.001") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    val docs = docsDf.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
    val elig = for ((id, t) <- docs; p <- 0 to t.length - 32)
      yield (id, p.toLong, t.substring(p, p + 32))
    val expected = elig.groupBy(_._3).values
      .filter(g => g.size >= 2 && g.map(_._1).distinct.size >= 2)
      .flatMap { g =>
        val (gd, gp, _) = g.minBy(x => (x._1, x._2))
        g.map(m => (m._1, m._2, gd, gp))
      }.toSeq.sortBy(x => (x._1, x._2))
    val got = SuffixArray.repeatGroups(docsDf, col("doc_id"), col("text"),
        minLen = 32)
      .orderBy("doc_id", "pos").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected)
  }

  test("repeatGroups fails loudly on ids outside the packing range") {
    val docs = Seq((1L << 31, "a" * 64), (3L, "a" * 64)).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      SuffixArray.repeatGroups(docs, col("doc_id"), col("text"), minLen = 32)
    }
    assert(e.getMessage.contains("2^31"))
  }

  test("gramHashes: rolling fingerprints agree with direct per-gram hashes") {
    // equal grams MUST collide (the completion pass's necessary
    // condition); on this fixture distinct grams must not
    val t = "abcabcabcXabcabcabcY𝕏abc𝕏abc𝕏ab"
    val hs = SuffixArray.gramHashes(t, 4).zipWithIndex
      .map { case (h, p) => (p, h) }.toMap
    val cps = t.codePoints.toArray
    def gram(p: Int) = new String(cps, p, 4)
    val byGram = hs.groupBy { case (p, _) => gram(p) }
    byGram.foreach { case (g, m) =>
      assert(m.values.toSet.size == 1, s"equal grams '$g' hashed apart") }
    assert(byGram.map(_._2.values.head).toSet.size == byGram.size,
      "distinct grams collided on the fixture")
    assert(hs.size == cps.length - 3, "one fingerprint per eligible position")
    assert(SuffixArray.gramHashes(null, 4).isEmpty)
    assert(SuffixArray.gramHashes("abc", 4).isEmpty)
  }

  test("shardedRepeatGroups: shard-count independent and equal to the global miner") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    val global = SuffixArray.repeatGroups(docsDf, col("doc_id"), col("text"),
        minLen = 32)
      .orderBy("doc_id", "pos").as[(Long, Long, Long, Long)].collect().toSeq
    for (n <- Seq(1, 3, 7)) {
      val sharded = SuffixArray.shardedRepeatGroups(docsDf, col("doc_id"),
          col("text"), minLen = 32, nShards = n)
        .orderBy("doc_id", "pos").as[(Long, Long, Long, Long)].collect().toSeq
      assert(sharded == global, s"nShards=$n diverged from the global miner")
    }
  }

  test("shardedRepeatGroups finds classes sharding splits (cross-shard 1+1)") {
    val shared = "the quick brown fox jumps over a dam" // 36 chars
    // ids 0 and 1 land in DIFFERENT shards at nShards=2; each shard
    // sees ONE occurrence, so per-shard mining alone can never find
    // the class — only the completion pass can
    val docs = Seq(
      (0L, s"$shared padding zero"),
      (1L, s"xx$shared padding one")).toDF("doc_id", "text")
    val got = SuffixArray.shardedRepeatGroups(docs, col("doc_id"),
        col("text"), minLen = 32, nShards = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.nonEmpty, "cross-shard class missed")
    val labels = got.map(t => (t._3, t._4)).toSet
    assert(labels.forall(_._1 == 0L), s"canonical labels not global mins: $labels")
    assert(got.exists(m => m._1 == 0L && m._2 == 0L) &&
      got.exists(m => m._1 == 1L && m._2 == 2L))
  }

  test("completion pass handles a repeat-heavy book-length doc (block-bounded candidate buffers)") {
    // doc 0: a 64-char sentence repeated 400 times (25,600 chars);
    // doc 1 (other shard at nShards=2) carries ONE copy, so every
    // sentence 32-gram is a cross-shard spanning fingerprint and doc
    // 0 contributes ~13k candidate positions — the exact shape that
    // used to land in ONE collect_list buffer and now lands in
    // pos-div-4096 blocks. The block split must be invisible: the
    // sharded answer still equals the global miner's.
    val sentence = "the rain in spain stays mainly on the plain, so they say 01234. "
    assert(sentence.length == 64)
    val docs = Seq(
      (0L, sentence * 400),
      (1L, "yy" + sentence + "trailing padding text")).toDF("doc_id", "text")
    val global = SuffixArray.repeatGroups(docs, col("doc_id"), col("text"),
        minLen = 32)
      .orderBy("doc_id", "pos").as[(Long, Long, Long, Long)].collect().toSeq
    val sharded = SuffixArray.shardedRepeatGroups(docs, col("doc_id"),
        col("text"), minLen = 32, nShards = 2)
      .orderBy("doc_id", "pos").as[(Long, Long, Long, Long)].collect().toSeq
    assert(sharded == global)
    // the fixture really exercised multi-block candidates: doc 0's
    // member positions span several 4096-char blocks
    val blocks = sharded.filter(_._1 == 0L).map(_._2 / 4096L).distinct
    assert(blocks.size >= 4, s"expected multi-block candidates, got $blocks")
  }

  test("shardedScrub == scrubRepeats; interval reassembly == a per-character reference scrub") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    val direct = SuffixArray.scrubRepeats(docsDf, col("doc_id"), col("text"),
        minLen = 32)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    val sharded = SuffixArray.shardedScrub(docsDf, col("doc_id"), col("text"),
        minLen = 32, nShards = 3)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    assert(sharded == direct)
    // the interval slicing must agree with a brute-force per-character
    // scrub on a long planted doc whose dropped spans overlap, abut,
    // and cover the document head (the merge edge cases)
    val longDoc = ("abcdefgh" * 300) + ("x" * 40) // 2440 chars, repeats inside
    val texts = Seq(1L -> longDoc, 2L -> ("prefix " + longDoc.substring(0, 64)))
    val docs2 = texts.toDF("doc_id", "text")
    val members = SuffixArray.repeatGroups(docs2, col("doc_id"), col("text"),
      minLen = 32)
    val got = SuffixArray.scrubFromMembers(docs2, col("doc_id"), col("text"),
        32, members)
      .orderBy("doc_id").as[(Long, String, Long)].collect().toSeq
    val mem = members.as[(Long, Long, Long, Long)].collect().toSeq
    val expected = texts.map { case (id, t) =>
      val covered = mem
        .filter(m => m._1 == id && !(m._1 == m._3 && m._2 == m._4))
        .flatMap(m => m._2 until (m._2 + 32L)).toSet
      val clean = t.zipWithIndex
        .collect { case (ch, i) if !covered(i.toLong) => ch }.mkString
      (id, clean, (t.length - clean.length).toLong)
    }
    assert(got == expected, "interval reassembly diverged from the reference")
    assert(got.exists(_._3 > 0), "fixture must actually scrub something")
  }

  test("shardedRepeatGroups: concurrency width never changes the answer (P in {1,2,4} at nShards 7)") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    val seq = SuffixArray.shardedRepeatGroups(docsDf, col("doc_id"),
        col("text"), minLen = 32, nShards = 7)
      .orderBy("doc_id", "pos").as[(Long, Long, Long, Long)].collect().toSeq
    for (p <- Seq(2, 4)) {
      val par = SuffixArray.shardedRepeatGroups(docsDf, col("doc_id"),
          col("text"), minLen = 32, nShards = 7, maxConcurrentShards = p)
        .orderBy("doc_id", "pos").as[(Long, Long, Long, Long)].collect().toSeq
      assert(par == seq, s"maxConcurrentShards=$p diverged from width 1")
    }
  }

  private def inventoryRows(inv: SuffixArray.RepeatInventory) =
    inv.members.orderBy("doc_id", "pos")
      .as[(Long, Long, Long, Long)].collect().toSeq

  test("extendRepeatGroups == re-mine on the union, at two split points") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    val full = SuffixArray.repeatGroups(docsDf, col("doc_id"), col("text"),
        minLen = 32)
      .orderBy("doc_id", "pos").as[(Long, Long, Long, Long)].collect().toSeq
    for (split <- Seq(col("doc_id") % 2 === 0, col("doc_id") % 3 === 0)) {
      val standingDocs = docsDf.filter(split)
      val batch = docsDf.filter(!split)
      val standing = SuffixArray.trainRepeatGroups(standingDocs,
        col("doc_id"), col("text"), minLen = 32)
      val extended = SuffixArray.extendRepeatGroups(standing, standingDocs,
        batch, col("doc_id"), col("text"))
      assert(inventoryRows(extended) == full, s"extend != re-mine at $split")
      // the fps artifact folded additively: one row per gram position
      // of the union
      val nGrams = docsDf.select(col("doc_id"),
          greatest(length(col("text")) - 31, lit(0)).cast("long").as("n"))
        .agg(sum("n")).as[Long].collect().head
      assert(extended.fps.count() == nGrams)
    }
  }

  test("extendRepeatGroups finds the class only the bipartite completion can (1 standing + 1 batch occurrence)") {
    val shared = "the quick brown fox jumps over a dam" // 36 chars
    val standingDocs = Seq((0L, s"$shared padding zero"),
      (2L, "nothing shared here at all, completely different text"))
      .toDF("doc_id", "text")
    val batch = Seq((1L, s"xx$shared padding one")).toDF("doc_id", "text")
    val standing = SuffixArray.trainRepeatGroups(standingDocs,
      col("doc_id"), col("text"), minLen = 32)
    // neither side alone has a class: standing has ONE occurrence,
    // the batch has ONE — only the cross-boundary probe can pair them
    assert(inventoryRows(standing).isEmpty)
    val extended = SuffixArray.extendRepeatGroups(standing, standingDocs,
      batch, col("doc_id"), col("text"))
    val got = inventoryRows(extended)
    assert(got.nonEmpty, "cross-boundary class missed")
    // the shared run yields one class per overlapping 32-gram, all
    // canonically labeled in the standing doc (the global min side)
    val labels = got.map(t => (t._3, t._4)).toSet
    assert(labels.forall(_._1 == 0L), s"canonical labels not global mins: $labels")
    assert(labels.contains((0L, 0L)))
    assert(got.exists(m => m._1 == 0L && m._2 == 0L) &&
      got.exists(m => m._1 == 1L && m._2 == 2L))
  }

  test("saveRepeatGroups/loadRepeatGroups round-trips bitwise; the loaded inventory extends identically") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    val standingDocs = docsDf.filter(col("doc_id") % 2 === 0)
    val batch = docsDf.filter(col("doc_id") % 2 === 1)
    val standing = SuffixArray.trainRepeatGroups(standingDocs,
      col("doc_id"), col("text"), minLen = 32)
    val dir = java.nio.file.Files.createTempDirectory("sa_inv").toString
    try {
      SuffixArray.saveRepeatGroups(standing, dir)
      val loaded = SuffixArray.loadRepeatGroups(spark, dir)
      assert(loaded.minLen == 32)
      assert(inventoryRows(loaded) == inventoryRows(standing))
      assert(loaded.fps.orderBy("doc_id", "pos")
        .as[(Long, Long, Long)].collect().toSeq ==
        standing.fps.orderBy("doc_id", "pos")
          .as[(Long, Long, Long)].collect().toSeq)
      // extending the LOADED inventory equals extending the live one
      val a = inventoryRows(SuffixArray.extendRepeatGroups(loaded,
        standingDocs, batch, col("doc_id"), col("text")))
      val b = inventoryRows(SuffixArray.extendRepeatGroups(standing,
        standingDocs, batch, col("doc_id"), col("text")))
      assert(a == b)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(dir)).deleteRecursively()
    }
  }

  test("sharedRepeatInventory == trainRepeatGroups; the two cache slots serve repeat reads") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
      .filter(col("doc_id") % 2 === 0)
    val trained = SuffixArray.trainRepeatGroups(docsDf, col("doc_id"),
      col("text"), minLen = 32)
    val shared = SuffixArray.sharedRepeatInventory(docsDf, col("doc_id"),
      col("text"), minLen = 32, Some("spec:even"))
    assert(inventoryRows(shared) == inventoryRows(trained))
    assert(shared.fps.count() == trained.fps.count())
    // second call reads the session artifacts (same contents)
    val again = SuffixArray.sharedRepeatInventory(docsDf, col("doc_id"),
      col("text"), minLen = 32, Some("spec:even"))
    assert(inventoryRows(again) == inventoryRows(trained))
  }

  test("extendRepeatGroups: an empty batch is a no-op") {
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    val standing = SuffixArray.trainRepeatGroups(docsDf, col("doc_id"),
      col("text"), minLen = 32)
    val extended = SuffixArray.extendRepeatGroups(standing, docsDf,
      docsDf.filter(lit(false)), col("doc_id"), col("text"))
    assert(inventoryRows(extended) == inventoryRows(standing))
  }

  test("winnowedPositions: rightmost window minima, every window covered, content-local") {
    val rnd = new scala.util.Random(7)
    val hs = Array.fill(200)(rnd.nextLong(1000)) // small range forces ties
    val w = 9
    val sel = SuffixArray.winnowedPositions(hs, w)
    assert(sel.toSeq == sel.toSeq.sorted && sel.distinct.length == sel.length)
    // every window [i, i+w) contains its rightmost-min selection
    for (i <- 0 to hs.length - w) {
      val win = (i until i + w)
      val m = win.map(hs).min
      val rm = win.filter(hs(_) == m).max
      assert(sel.contains(rm), s"window $i rightmost-min $rm unselected")
    }
    // content-locality: a window's selection depends only on its own
    // hashes — identical hash runs at different offsets select the
    // same RELATIVE position (the winnowing guarantee's engine)
    val run = Array.fill(40)(rnd.nextLong(1000))
    val a = SuffixArray.winnowedPositions(run ++ Array.fill(13)(rnd.nextLong(1000)), w)
    val b0 = Array.fill(21)(rnd.nextLong(1000))
    val b = SuffixArray.winnowedPositions(b0 ++ run, w)
    // DEEP-interior positions — those whose every containing window
    // [i−w+1, i], i ∈ [p, p+w−1], lies fully inside the shared run —
    // have content-determined selection: relative offsets in
    // [w−1, |run|−w]. The selection sets restricted there must be
    // EQUAL across the two copies (not merely overlap — a misaligned
    // interior selection would break the same-relative-offset
    // guarantee the sampled probes build on); positions nearer an
    // edge may differ (straddling windows see surrounding content)
    val deep = (w - 1) to (40 - w)
    val aDeep = a.filter(deep.contains).toSet
    val bDeep = b.filter(p => deep.contains(p - 21)).map(_ - 21).toSet
    assert(aDeep == bDeep, s"deep-interior selections diverge: $aDeep vs $bDeep")
    assert(aDeep.nonEmpty, "fixture too short to have deep-interior selections")
    // and on a second offset pair (regression against off-by-ones)
    val c = SuffixArray.winnowedPositions(
      Array.fill(5)(rnd.nextLong(1000)) ++ run, w)
    val cDeep = c.filter(p => deep.contains(p - 5)).map(_ - 5).toSet
    assert(cDeep == aDeep)
    // empty and short-array guards
    assert(SuffixArray.winnowedPositions(Array.empty[Long], w).isEmpty)
    assert(SuffixArray.winnowedPositions(Array(1L, 2L), 3).isEmpty)
  }

  test("repeatGroupsFp == repeatGroups (the fingerprint miner is exact)") {
    // the inventory family mines on the Rabin–Karp candidate +
    // literal-verify path; the doubling miner is its ground truth
    val docsDf = Tables.documents(spark, SparkTestSession.Sf)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id", "pos")
        .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows(SuffixArray.repeatGroupsFp(docsDf, col("doc_id"),
        col("text"), minLen = 32)) ==
      rows(SuffixArray.repeatGroups(docsDf, col("doc_id"),
        col("text"), minLen = 32)))
    // hand fixture: cross-doc class found, same-doc-only repeat
    // rejected, canonical labels are global mins — on both miners
    val shared = "the quick brown fox jumps over a dam" // 36 chars
    val hand = Seq(
      (1L, s"xx$shared tail one"),
      (2L, s"$shared tail two"),
      (4L, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz qq " +
        "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz")
    ).toDF("doc_id", "text")
    assert(rows(SuffixArray.repeatGroupsFp(hand, col("doc_id"),
        col("text"), minLen = 32)) ==
      rows(SuffixArray.repeatGroups(hand, col("doc_id"),
        col("text"), minLen = 32)))
    // and free of the power-of-two restriction: minLen 33 mines the
    // same class via brute substring truth
    val got33 = rows(SuffixArray.repeatGroupsFp(hand, col("doc_id"),
      col("text"), minLen = 33))
    assert(got33.nonEmpty && got33.forall(m => Seq(1L, 2L).contains(m._1)))
  }
}
