package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import graft.ops._

/** Property-based invariants (SURVEY §5.3). Runs under sbt's native
  * ScalaCheck support alongside the ScalaTest suites.
  */
object GraftProps extends Properties("graft") {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---- flexTsEpoch round-trips ----

  private val epochGen = Gen.choose(0L, 4102444800L) // 1970..2100

  property("ts: epoch-seconds string round-trips") = forAll(epochGen) { e =>
    val got = Seq(e.toString).toDF("v")
      .select(Timestamps.flexTsEpoch(col("v"))).as[Long].head()
    got == e
  }

  property("ts: epoch-millis string round-trips (heuristic)") =
    forAll(Gen.choose(1100000000000L, 4102444800000L)) { ms =>
      val got = Seq(ms.toString).toDF("v")
        .select(Timestamps.flexTsEpoch(col("v"))).as[Long].head()
      got == ms / 1000
    }

  property("ts: ISO-Z rendering round-trips") = forAll(epochGen) { e =>
    val iso = java.time.Instant.ofEpochSecond(e).toString // ...Z
    val got = Seq(iso).toDF("v")
      .select(Timestamps.flexTsEpoch(col("v"))).as[Long].head()
    got == e
  }

  // ---- loosenJson never breaks valid (compact, benign-string) JSON ----

  private val safeStr = Gen.alphaNumStr.map(_.take(12))
  private val scalarGen: Gen[String] = Gen.oneOf(
    Gen.choose(-1000000, 1000000).map(_.toString),
    safeStr.map("\"" + _ + "\""),
    Gen.oneOf("true", "false", "null"))
  // Array elements exclude bare numbers ON PURPOSE: the reference's
  // thousands-separator repair (parse.py:139-168, mirrored by
  // loosenJson) deliberately rewrites `...1,230...` to `...1230...`,
  // so a VALID array like [5,200] is not a fixpoint — by the
  // reference's own semantics. Identity holds on every shape where a
  // comma is never digit-adjacent on both sides.
  private val arrayElemGen: Gen[String] = Gen.oneOf(
    safeStr.map("\"" + _ + "\""),
    Gen.oneOf("true", "false", "null"))
  private val jsonGen: Gen[String] = for {
    n <- Gen.choose(0, 5)
    keys <- Gen.listOfN(n, safeStr)
    vals <- Gen.listOfN(n, Gen.oneOf(scalarGen,
      Gen.listOf(arrayElemGen).map(_.take(4).mkString("[", ",", "]"))))
  } yield keys.distinct.zip(vals)
    .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  property("loosenJson is identity on already-valid compact JSON") =
    forAll(jsonGen) { j =>
      val got = Seq(j).toDF("v").select(Parse.loosenJson(col("v")))
        .as[String].head()
      got == j
    }

  // ---- dedup idempotence + first-wins ----

  // generate only url choices; derive unique ids inside the property so
  // scalacheck shrinking cannot leave the generator's domain
  private val rowsGen = Gen.nonEmptyListOf(Gen.choose(0, 4))

  property("dedup is idempotent and keeps min order key per url") =
    forAll(rowsGen) { picks =>
      val urls = Array("a", "b", "c", "d", "e")
      val rows = picks.take(30).zipWithIndex
        .map { case (u, i) => ((i + 1).toLong, urls(math.abs(u) % 5)) }
      val df = rows.toDF("id", "url")
      val once = Dedup.dedupItems(df, col("id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val twice = Dedup.dedupItems(Dedup.dedupItems(df, col("id")), col("id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val expected = rows.groupBy(_._2)
        .map { case (u, rs) => (rs.map(_._1).min, u) }.toSet
      once == twice && once == expected
    }

  // ---- watermark monotonicity ----

  property("watermark: re-filter at advanced mark yields empty") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 100000L))) { ts =>
      val df = ts.toDF("t")
      val mark = Watermark.advance(df, col("t"))
      Watermark.filterNew(df, col("t"), mark).count() == 0
    }

  // ---- similarity invariants ----

  private val vecGen = Gen.listOfN(8, Gen.choose(-100, 100).map(_ / 10.0f))

  property("jaccard within [0,1], symmetric") =
    forAll(Gen.listOf(safeStr).map(_.take(8)), Gen.listOf(safeStr).map(_.take(8))) {
      (a, b) =>
        val row = Seq((a.distinct, b.distinct)).toDF("x", "y").select(
          TextStats.jaccard(col("x"), col("y")),
          TextStats.jaccard(col("y"), col("x"))).collect()(0)
        if (row.isNullAt(0) || row.isNullAt(1))
          row.isNullAt(0) && row.isNullAt(1) // 0/0 on empty union, both sides
        else {
          val (j1, j2) = (row.getDouble(0), row.getDouble(1))
          j1 == j2 && j1 >= 0.0 && j1 <= 1.0
        }
    }

  property("simhash self-distance is 0; cosine(v,v) ≈ 1") =
    forAll(vecGen, Gen.nonEmptyListOf(safeStr).map(_.take(10))) { (v, words) =>
      val df = Seq((words, v.toArray, v.toArray)).toDF("w", "a", "b")
      val row = df.select(
        SimHash.hamming(SimHash.simhash(col("w")), SimHash.simhash(col("w"))),
        Similarity.cosine(col("a"), col("b"))).collect()(0)
      val normOk = v.forall(_ == 0.0f) || math.abs(row.getDouble(1) - 1.0) < 1e-9
      row.getLong(0) == 0L && normOk
    }

  // ---- round-4 ops ----

  /** Text with no @, no digit runs ≥ 3 grouped like PII — i.e. nothing
    * the scrub patterns can match.
    */
  private val cleanTextGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaStr.map(_.take(8)), Gen.const("x1y")))
      .map(_.mkString(" ").take(120))

  property("redactPii is identity on PII-free text") =
    forAll(cleanTextGen) { t =>
      val row = Seq(t).toDF("t").select(
        ops.Redact.redactPii(col("t")),
        ops.Redact.emailCount(col("t")) + ops.Redact.ipCount(col("t")) +
          ops.Redact.phoneCount(col("t"))).collect()(0)
      row.getString(0) == t && row.getLong(1) == 0L
    }

  property("contamination of a doc against itself is 1; bounds hold") =
    forAll(Gen.nonEmptyListOf(safeStr).map(_.take(12).mkString(" "))) { t =>
      val d = Seq((1L, t)).toDF("doc_id", "text")
      val row = ops.Decontaminate.contamination(
        d, d, col("doc_id"), col("text"), n = 3).collect()(0)
      val c = row.getAs[Double]("contamination")
      c == 1.0 && row.getAs[Long]("n_hits") == row.getAs[Long]("n_grams")
    }

  property("chunking loses no token: stride-stitch rebuilds the doc") =
    forAll(Gen.nonEmptyListOf(safeStr).map(_.take(60).mkString(" ")),
      Gen.choose(2, 12), Gen.choose(0, 1)) { (text, size, halfOverlap) =>
      val overlap = (size / 2) * halfOverlap // 0 or size/2 (< size)
      val stride = size - overlap
      val chunks = ops.Chunking.chunks(Seq((1L, text)).toDF("id", "t"),
        col("id"), col("t"), size, overlap)
        .orderBy("chunk_idx")
        .select("chunk_text").as[String].collect()
      val rebuilt = chunks.zipWithIndex.flatMap { case (c, i) =>
        val ts = c.split(" ", -1)
        if (i == 0) ts else ts.drop(overlap)
      }
      // split(text,' ') convention: every doc has >= 1 (possibly empty)
      // token, so reassembly equals the original token stream exactly
      rebuilt.mkString(" ") == text &&
        chunks.forall(_.split(" ", -1).length <= size) &&
        // overlap stitching: consecutive chunks agree on the shared run
        chunks.sliding(2).forall {
          case Array(a, b) =>
            val at = a.split(" ", -1); val bt = b.split(" ", -1)
            at.length < size || at.drop(stride).sameElements(
              bt.take(at.length - stride))
          case _ => true
        }
    }

  property("repetition signals stay in [0,1]; single-token docs define both") =
    forAll(Gen.nonEmptyListOf(safeStr).map(_.take(15).mkString(" "))) { t =>
      val d = Seq((1L, t)).toDF("doc_id", "text")
      val row = ops.TextStats.repetitionSignals(d, col("doc_id"), col("text"))
        .collect()(0)
      val dup = row.getAs[Double]("dup_token_frac")
      val top = row.getAs[Double]("top_gram_frac")
      dup >= 0.0 && dup < 1.0 && top > 0.0 && top <= 1.0
    }

  // ---- SetSim prefix filter never loses a qualifying pair ----

  // small vocab + short docs => dense overlap, the adversarial regime
  // for a candidate-pruning bug (the answer set is large relative to
  // the corpus, so a lost pair is likely to be detected)
  private val tinyDoc: Gen[String] =
    Gen.listOfN(8, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))

  property("setsim: prefix-filtered join == brute force at several taus") =
    forAll(Gen.listOfN(6, tinyDoc), Gen.oneOf((1, 2), (7, 10), (1, 3))) {
      (texts, tau) =>
        val (tn, td) = tau
        val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text")
        val got = SetSim.jaccardJoin(docs, col("doc_id"), col("text"),
          shingleN = 3, tauNum = tn, tauDen = td)
          .select("id_a", "id_b", "inter", "uni")
          .as[(Long, Long, Long, Long)].collect().toSet
        def sh(t: String): Set[String] = {
          val w = t.split(" ", -1)
          if (w.length < 3) Set(w.mkString(" "))
          else w.sliding(3).map(_.mkString(" ")).toSet
        }
        val sets = texts.zipWithIndex.map { case (t, i) => (i.toLong, sh(t)) }
        val want = (for {
          (a, sa) <- sets; (b, sb) <- sets if a < b
          inter = (sa intersect sb).size.toLong
          uni = (sa union sb).size.toLong
          if inter * td >= uni * tn
        } yield (a, b, inter, uni)).toSet
        got == want
    }

  // ---- codecs: arbitrary bytes decode or reject, never crash ----
  // ("corrupt media must not kill a 100 TB job": every decoder either
  // returns a value or throws IllegalArgumentException — nothing else
  // may escape, because only IAE-family errors map to the NULL row)

  private val bytesGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 256)
    b <- Gen.listOfN(n, Gen.choose(Byte.MinValue, Byte.MaxValue))
  } yield b.toArray

  // mutated valid headers probe deeper than pure noise (noise dies at
  // the magic check); prefix real containers with random tails
  private val headedGen: Gen[Array[Byte]] = for {
    head <- Gen.oneOf("BM", "P6\n", "RIFF????WAVE", "qoif")
    tail <- bytesGen
  } yield head.getBytes("ISO-8859-1") ++ tail

  private def decodesOrRejects(f: Array[Byte] => Any): Array[Byte] => Boolean =
    bytes =>
      try { f(bytes); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }

  property("decodeBmp on arbitrary/mutated bytes: value or IAE, never a crash") =
    forAll(Gen.oneOf(bytesGen, headedGen))(decodesOrRejects(graft.multimodal.Codecs.decodeBmp))
  property("decodePpm on arbitrary/mutated bytes: value or IAE, never a crash") =
    forAll(Gen.oneOf(bytesGen, headedGen))(decodesOrRejects(graft.multimodal.Codecs.decodePpm))
  property("decodeWav on arbitrary/mutated bytes: value or IAE, never a crash") =
    forAll(Gen.oneOf(bytesGen, headedGen))(decodesOrRejects(graft.multimodal.Codecs.decodeWav))
  property("decodeQoi on arbitrary/mutated bytes: value or IAE, never a crash") =
    forAll(Gen.oneOf(bytesGen, headedGen))(decodesOrRejects(graft.multimodal.Codecs.decodeQoi))
  property("decodeAniQoiFrame on arbitrary/mutated bytes: value or IAE, never a crash") =
    forAll(Gen.oneOf(bytesGen, headedGen), Gen.choose(0, 4)) { (bytes, f) =>
      try { graft.multimodal.Codecs.decodeAniQoiFrame(bytes, f); true }
      catch {
        case _: IllegalArgumentException => true
        case _: Throwable => false
      }
    }

  // ---- perceptual hashes: scale invariance + codec independence ----

  private val imageGen: Gen[graft.multimodal.Codecs.Image] = for {
    w <- Gen.choose(1, 24)
    h <- Gen.choose(1, 16)
    px <- Gen.listOfN(w * h, Gen.choose(0, 0xffffff))
  } yield graft.multimodal.Codecs.Image(w, h, px.toArray)

  property("ahash64/dhash64 are invariant under integer pixel-doubling") =
    forAll(imageGen) { img =>
      // nearest-resample through the floor map makes the doubled image
      // land on the same 8x8/9x8 grids — scale must not change the hash
      val big = {
        val px = new Array[Int](img.width * 2 * img.height * 2)
        var y = 0
        while (y < img.height * 2) {
          var x = 0
          while (x < img.width * 2) {
            px(y * img.width * 2 + x) = img.pixels((y / 2) * img.width + (x / 2))
            x += 1
          }
          y += 1
        }
        graft.multimodal.Codecs.Image(img.width * 2, img.height * 2, px)
      }
      import graft.multimodal.PerceptualHash._
      ahash64(big) == ahash64(img) && dhash64(big) == dhash64(img)
    }

  property("perceptual hashes are container-independent (BMP == PPM == QOI)") =
    forAll(imageGen) { img =>
      import graft.multimodal.{Codecs, PerceptualHash}
      val viaBmp = Codecs.decodeBmp(Codecs.encodeBmp(img))
      val viaPpm = Codecs.decodePpm(Codecs.encodePpm(img))
      val viaQoi = Codecs.decodeQoi(Codecs.encodeQoi(img))
      Seq(viaBmp, viaPpm, viaQoi).forall(d =>
        PerceptualHash.ahash64(d) == PerceptualHash.ahash64(img) &&
        PerceptualHash.dhash64(d) == PerceptualHash.dhash64(img))
    }

  property("audioHash64 is container-independent (WAV round-trip) on random PCM") =
    forAll(Gen.choose(1, 400), Gen.choose(Long.MinValue, Long.MaxValue)) { (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val s = Array.fill[Short](n)(rnd.nextInt(65536).toShort)
      import graft.multimodal.{Codecs, PerceptualHash}
      val a = Codecs.Audio(8000, 1, s)
      PerceptualHash.audioHash64(Codecs.decodeWav(Codecs.encodeWav(a))) ==
        PerceptualHash.audioHash64(a)
    }

  // ---- ilog2fp: the LM family's logprob currency ----

  private val posLongGen = Gen.choose(1L, Long.MaxValue)

  property("ilog2fp: within 2^-14 bits of log2 and exact on powers of 2") =
    forAll(posLongGen) { x =>
      val fp = graft.functions.kernels.ilog2fp(x)
      val err = math.abs(fp / 65536.0 - math.log(x.toDouble) / math.log(2.0))
      err < 6.2e-5 && (!isPow2(x) || fp == 65536L * java.lang.Long.numberOfTrailingZeros(x))
    }

  private def isPow2(x: Long) = (x & (x - 1)) == 0

  property("dsirBuckets kernel == hashing the joined pair strings") =
    forAll(Gen.listOf(Gen.alphaNumStr.map(_.take(8)))) { toks =>
      import org.apache.spark.unsafe.types.UTF8String
      val k = graft.functions.kernels
      val (mult, seed, b) = (31L, graft.ops.Lm.HashSeed, graft.ops.Lm.Buckets)
      def h(s: String) = k.polyHash(UTF8String.fromString(s), mult, seed)
      val expected =
        toks.map(h(_) % b) ++
          toks.sliding(2).collect { case Seq(a, c) => h(a + " " + c) % b }
      val got = k.dsirBuckets(
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          toks.map(UTF8String.fromString).toArray[Any]),
        mult, seed, b).toLongArray().toSeq
      got == expected
    }

  property("ilog2fp: monotone, and differences approximate the ratio log") =
    forAll(posLongGen, posLongGen) { (a, b) =>
      val (lo, hi) = if (a <= b) (a, b) else (b, a)
      val k = graft.functions.kernels
      val dFp = k.ilog2fp(hi) - k.ilog2fp(lo)
      // monotone (the sign contract of the logprob currency), AND the
      // difference IS the ratio log within twice the per-value bound —
      // the identity log2fp(a/b) = ilog2fp(a) − ilog2fp(b) the LM
      // scorer and DSIR weights are built on
      val ratioErr = math.abs(dFp / 65536.0 -
        (math.log(hi.toDouble) - math.log(lo.toDouble)) / math.log(2.0))
      dFp >= 0L && ratioErr < 1.3e-4
    }

  // ---- standing df stats: extend == retrain for ANY split ----

  private val docGen: Gen[String] = Gen.listOf(
      Gen.oneOf("alpha", "beta", "gamma", "delta", "x1", "y2"))
    .map(_.take(6).mkString(" "))

  property("dfStats: extend == retrain on every corpus split") =
    forAll(Gen.listOf(docGen).map(_.take(8)),
           Gen.choose(0, 8)) { (texts, cut) =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val (a, b) = docs.splitAt(math.min(cut, docs.size))
      val aDf = a.toDF("doc_id", "text")
      val bDf = b.toDF("doc_id", "text")
      val folded = Tfidf.extendDfStats(
        Tfidf.trainDfStats(aDf, col("doc_id"), col("text")),
        bDf, col("doc_id"), col("text"))
      val retrained = Tfidf.trainDfStats(aDf.unionByName(bDf),
        col("doc_id"), col("text"))
      def rows(m: Tfidf.DfStats) =
        m.df.orderBy("term").as[(String, Long)].collect().toSeq
      folded.nDocs == retrained.nDocs && rows(folded) == rows(retrained)
    }
}
