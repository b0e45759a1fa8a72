package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** E4+E1: perceptual image hashes and Hamming-banded near-dup pairs. */
class PerceptualHashSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def flat(color: Int, w: Int = 8, h: Int = 8): Codecs.Image =
    Codecs.Image(w, h, Array.fill(w * h)(color))

  test("ahash64: flat image is all-zero (no cell exceeds the mean)") {
    assert(PerceptualHash.ahash64(flat(0x808080)) == 0L)
    assert(PerceptualHash.dhash64(flat(0x123456)) == 0L)
  }

  test("ahash64: half-bright image sets exactly the bright half's bits") {
    // left 4 columns black, right 4 columns white: mean is midway,
    // white cells (x >= 4) exceed it
    val px = Array.tabulate(64)(i => if (i % 8 >= 4) 0xffffff else 0x000000)
    val h = PerceptualHash.ahash64(Codecs.Image(8, 8, px))
    (0 until 64).foreach { i =>
      val expected = i % 8 >= 4
      assert((((h >>> i) & 1L) == 1L) == expected, s"bit $i")
    }
  }

  test("dhash64: single rising edge sets one bit per row") {
    // gradient only at x=3 -> bit (y*8+3) set via the 9-wide grid on
    // an exactly-9-wide image (identity resample)
    val px = Array.tabulate(9 * 8)(i => if (i % 9 >= 4) 0xffffff else 0)
    val h = PerceptualHash.dhash64(Codecs.Image(9, 8, px))
    (0 until 8).foreach { y =>
      (0 until 8).foreach { x =>
        assert((((h >>> (y * 8 + x)) & 1L) == 1L) == (x == 3), s"bit ($x,$y)")
      }
    }
  }

  test("hashes survive the codec round-trip (encode->decode->hash == direct)") {
    val img = Multimodal.genImage(42L)
    val direct = (PerceptualHash.ahash64(img), PerceptualHash.dhash64(img))
    for (enc <- Seq[(Codecs.Image => Array[Byte], Array[Byte] => Codecs.Image)](
      (Codecs.encodeBmp, Codecs.decodeBmp),
      (Codecs.encodePpm, Codecs.decodePpm),
      (Codecs.encodeQoi, Codecs.decodeQoi))) {
      val rt = enc._2(enc._1(img))
      assert((PerceptualHash.ahash64(rt), PerceptualHash.dhash64(rt)) == direct)
    }
  }

  test("imageHashes: audio rows and corrupt payloads drop, never fail the job") {
    val media = Multimodal.realMedia(
      Tables.documents(spark, SparkTestSession.Sf).limit(40))
    val corrupt = media.withColumn("content",
      when(col("media_id") === 1L, lit(Array[Byte](1, 2, 3)))
        .otherwise(col("content")))
    val out = PerceptualHash.imageHashes(corrupt)
    val formats = out.select("format").distinct().as[String].collect().toSet
    assert(formats.subsetOf(Set("bmp", "ppm", "qoi")))
    // id 1 (ppm position) was corrupted -> dropped; id 2 is wav -> dropped
    val ids = out.select("media_id").as[Long].collect().toSet
    assert(!ids.contains(1L) && !ids.contains(2L))
    assert(ids.contains(0L))
  }

  test("nearDupPairs: resized copy of an image is found at distance 0") {
    // same picture at two sizes: perceptual hash ignores scale by
    // construction (both resample to the same 8x8 grid when the
    // upscale is an integer pixel-doubling)
    val img = Multimodal.genImage(8L) // 8x6... use exact doubling
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
      Codecs.Image(img.width * 2, img.height * 2, px)
    }
    val rows = Seq(
      (1L, Codecs.encodeBmp(img), "bmp"),
      (2L, Codecs.encodeBmp(big), "bmp"),
      (3L, Codecs.encodePpm(Multimodal.genImage(3L)), "ppm"))
      .toDF("media_id", "content", "format")
      .select(col("media_id"), col("content"),
        struct(col("format"), lit(16).as("width"), lit(12).as("height"),
          lit(1).as("n_frames")).as("meta"))
    val pairs = PerceptualHash.nearDupPairs(rows, maxDist = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L, 0L)), s"got $pairs")
  }

  test("nearDupPairs: pigeonhole completeness at maxDist<=3 vs brute force") {
    val media = Multimodal.realMedia(
      Tables.documents(spark, SparkTestSession.Sf).limit(120))
    val banded = PerceptualHash.nearDupPairs(media, maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    val hs = PerceptualHash.imageHashes(media)
      .select("media_id", "ahash").as[(Long, Long)].collect()
    val brute = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(banded == brute,
      s"banded ${banded.size} vs brute ${brute.size}")
  }

  test("audioHash64: silent audio hashes to 0; a loud half sets its frames") {
    assert(PerceptualHash.audioHash64(
      Codecs.Audio(8000, 1, Array.fill[Short](128)(0))) == 0L)
    // first 64 samples loud, rest silent: with n=128 exactly two
    // samples land in each frame, so frames 0..31 are loud
    val s = Array.tabulate[Short](128)(i => if (i < 64) 1000 else 0)
    val h = PerceptualHash.audioHash64(Codecs.Audio(8000, 1, s))
    (0 until 64).foreach { f =>
      assert((((h >>> f) & 1L) == 1L) == (f < 32), s"frame $f")
    }
  }

  test("audioHash64 survives the WAV round-trip; level-identical copies collide") {
    val a = Multimodal.genAudio(42L)
    val direct = PerceptualHash.audioHash64(a)
    assert(PerceptualHash.audioHash64(Codecs.decodeWav(Codecs.encodeWav(a))) == direct)
  }

  test("audioNearDupPairs: an exact copy is found at distance 0; images drop") {
    val a = Multimodal.genAudio(6L)
    val rows = Seq(
      (1L, Codecs.encodeWav(a), "wav"),
      (2L, Codecs.encodeWav(a), "wav"),
      (3L, Codecs.encodeBmp(Multimodal.genImage(3L)), "bmp"))
      .toDF("media_id", "content", "format")
      .select(col("media_id"), col("content"),
        struct(col("format"), lit(0).as("width"), lit(0).as("height"),
          lit(1).as("n_frames")).as("meta"))
    val pairs = PerceptualHash.audioNearDupPairs(rows, maxDist = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L, 0L)))
  }

  test("cross-codec: every companded twin pairs with its PCM sibling at dist <= 3") {
    val docs = Tables.documents(spark, SparkTestSession.Sf).limit(60)
    val corpus = Multimodal.realMedia(docs)
      .unionByName(Multimodal.mulawMedia(docs))
      .unionByName(Multimodal.alawMedia(docs))
    val pairs = PerceptualHash.audioNearDupPairs(corpus, maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    val wavIds = docs.filter(col("doc_id") % 4 === 2)
      .select("doc_id").as[Long].collect()
    assert(wavIds.nonEmpty)
    wavIds.foreach { id =>
      assert(pairs.exists(p => p._1 == id && p._2 == id + Multimodal.MulawIdOffset),
        s"mu-law twin of $id not caught")
      assert(pairs.exists(p => p._1 == id && p._2 == id + Multimodal.AlawIdOffset),
        s"A-law twin of $id not caught")
    }
  }

  test("AQV1 container: frame count + selective decode round-trip") {
    val frames = (0 until 4).map(f => Multimodal.genVideoFrame(7L, f))
    val bytes = Codecs.encodeAniQoi(frames)
    assert(Codecs.aniQoiFrameCount(bytes) == 4)
    // each frame decodes independently and exactly
    (0 until 4).foreach { f =>
      val img = Codecs.decodeAniQoiFrame(bytes, f)
      assert(img.pixels.toSeq == frames(f).pixels.toSeq, s"frame $f")
    }
    intercept[IllegalArgumentException](Codecs.decodeAniQoiFrame(bytes, 4))
    // a truncated stream throws, never reads out of bounds
    intercept[Exception](
      Codecs.decodeAniQoiFrame(bytes.take(bytes.length / 2), 3))
  }

  test("videoFrameHashes: only sampled frames appear; hashes match direct computation") {
    val media = Multimodal.videoMedia(
      Tables.documents(spark, SparkTestSession.Sf).limit(20))
    val got = PerceptualHash.videoFrameHashes(media, everyN = 2)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    got.foreach { case (id, frames) =>
      val nf = Multimodal.videoFrameCount(id)
      assert(frames.keySet == (0 until nf by 2).map(_.toLong).toSet, s"clip $id")
      frames.foreach { case (f, h) =>
        assert(h == PerceptualHash.ahash64(
          Multimodal.genVideoFrame(id, f.toInt)), s"clip $id frame $f")
      }
    }
  }

  test("videoNearDupPairs: a re-cut sharing two frames matches; one frame does not") {
    def clip(id: Long, frames: Seq[Codecs.Image]) =
      (id, Codecs.encodeAniQoi(frames))
    // ids 13/15: all six involved frame hashes are pairwise distinct
    // (the synthetic gradients make some id pairs collide — e.g.
    // genVideoFrame(100,0) and (200,0) hash identically)
    val fA = (0 until 4).map(f => Multimodal.genVideoFrame(13L, f))
    val fB = (0 until 4).map(f => Multimodal.genVideoFrame(15L, f))
    // clip 2 re-cuts clip 1: its SAMPLED frames (0,2) are clip 1's
    // sampled frames (2,0) reordered — position-independent match;
    // clip 3 shares only one sampled frame; clip 4 is unrelated
    val rows = Seq(
      clip(1L, fA),
      clip(2L, Seq(fA(2), fB(1), fA(0), fB(3))),
      clip(3L, Seq(fA(0), fB(0), fB(2))),
      clip(4L, fB))
      .toDF("media_id", "content")
      .select(col("media_id"), col("content"),
        struct(lit("aqoi").as("format"), lit(0).as("width"),
          lit(0).as("height"), lit(4).as("n_frames")).as("meta"))
    val pairs = PerceptualHash.videoNearDupPairs(rows, everyN = 2, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 2L), s"got $pairs")
    assert(!pairs.exists(p => p._1 == 1L && p._2 == 3L), s"got $pairs")
    assert(!pairs.exists(p => p._2 == 4L && p._1 == 1L), s"got $pairs")
  }

  test("hammingPairs maxDist=0 finds exactly the equal-hash pairs, each once") {
    // three identical images + one distinct: exactly the 3 pairs among
    // the identical trio, every pair emitted ONCE (the first-matching-
    // band dedup must not duplicate a pair that collides on all bands)
    val rows = Seq(
      (1L, Codecs.encodeBmp(Multimodal.genImage(9L))),
      (2L, Codecs.encodeBmp(Multimodal.genImage(9L))),
      (3L, Codecs.encodeBmp(Multimodal.genImage(9L))),
      (4L, Codecs.encodeBmp(Multimodal.genImage(10L))))
      .toDF("media_id", "content")
      .select(col("media_id"), col("content"),
        struct(lit("bmp").as("format"), lit(0).as("width"), lit(0).as("height"),
          lit(1).as("n_frames")).as("meta"))
    val pairs = PerceptualHash.nearDupPairs(rows, maxDist = 0)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs.length == pairs.distinct.length, s"duplicated pairs: $pairs")
    assert(pairs.toSet == Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)),
      s"got $pairs")
  }

  test("videoFrameHashes everyN=1 decodes every frame") {
    val media = Multimodal.videoMedia(
      Tables.documents(spark, SparkTestSession.Sf).limit(12))
    val counts = PerceptualHash.videoFrameHashes(media, everyN = 1)
      .groupBy("media_id").count()
      .as[(Long, Long)].collect().toMap
    counts.foreach { case (id, n) =>
      assert(n == Multimodal.videoFrameCount(id), s"clip $id")
    }
  }

  private def mk(b3: Long, b2: Long, b1: Long, b0: Long): Long =
    (b3 << 48) | (b2 << 32) | (b1 << 16) | b0

  // the ADVICE-r8 scenario: the pair's FIRST matching band (band 0)
  // sits in a capped hot bucket, a later matching band (band 2)
  // survives — the pair must surface exactly once via the survivor,
  // not vanish because "earlier bands are equal"
  private def hotFirstBandFixture = {
    val h1 = mk(0x3333, 0x2222, 0x1111, 0xAAAA)
    val h2 = mk(0x3333, 0x2222, 0x1117, 0xAAAA) // bands 0,2,3 equal; dist 2
    val fillers = Seq(0x00FFL, 0x0FF0L, 0xFF00L, 0xF0F0L, 0x0F0FL).zipWithIndex
      .map { case (v, i) => (10L + i, mk(v, v, v, 0xAAAA)) } // heat band 0 only
    (h1, h2, Seq((1L, h1), (2L, h2)) ++ fillers)
  }

  test("hammingPairs: pair with a HOT first matching band survives via a later band") {
    val (_, _, rows) = hotFirstBandFixture
    val hashes = rows.toDF("media_id", "ahash")
    // bucket (0, 0xAAAA) holds all 7 hashes > cap 3 -> capped; the
    // pair's bands 2 and 3 survive; emitted ONCE (band 3's copy must
    // still dedup against band 2's)
    val pairs = PerceptualHash.hammingPairs(hashes, col("media_id"),
      col("ahash"), maxDist = 2, maxBucket = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 2L)), s"got $pairs")
  }

  test("probeHashes: hot-at-build first matching band still matches via a survivor") {
    val (h1, _, rows) = hotFirstBandFixture
    val corpus = rows.filter(_._1 != 1L).toDF("pid", "ph")
    val cidx = PerceptualHash.buildHashIndex(corpus, maxBucket = 3)
    // the audit surface: the capped bucket is visible, not silent
    val hot = cidx.hot.as[(Int, Long, Long)].collect().toSet
    assert(hot == Set((0, 0xAAAAL, 6L)), s"got $hot")
    val out = PerceptualHash.probeHashes(cidx,
      Seq((1L, h1)).toDF("batch_id", "bh"), maxDist = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L, 2L)), s"got $out")
  }

  test("bandCapAudit reports exactly the over-cap buckets with their size") {
    val (_, _, rows) = hotFirstBandFixture
    val audit = PerceptualHash.bandCapAudit(rows.toDF("media_id", "ahash"),
      col("media_id"), col("ahash"), maxBucket = 3)
      .as[(Int, Long, Long)].collect().toSet
    assert(audit == Set((0, 0xAAAAL, 7L)), s"got $audit")
    assert(PerceptualHash.bandCapAudit(rows.toDF("media_id", "ahash"),
      col("media_id"), col("ahash"), maxBucket = 10).count() == 0)
  }

  test("frameOverlapPairs: a hot frame hash is dropped; the pair needs survivors") {
    // clips 1/2 share hashes 7 and 8; hash 99 is corpus-wide (5 clips)
    val rows = (Seq((1L, 7L), (1L, 8L), (2L, 7L), (2L, 8L)) ++
      (1L to 5L).map(c => (c, 99L))).toDF("media_id", "ahash")
    val withHot = PerceptualHash.frameOverlapPairs(rows, minShared = 2,
      maxBucket = 3).as[(Long, Long, Long)].collect().toSet
    // hash 99's bucket (5 > 3) is dropped: (1,2) still shares 7,8
    assert(withHot == Set((1L, 2L, 2L)), s"got $withHot")
    val uncapped = PerceptualHash.frameOverlapPairs(rows, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L, 3L)), s"got $uncapped")
  }

  test("videoCapAudit surfaces corpus-wide frame hashes") {
    // three clips all containing frame A (sampled position 0)
    val shared = Multimodal.genVideoFrame(13L, 0)
    val rows = (1L to 3L).map { id =>
      (id, Codecs.encodeAniQoi(Seq(shared, Multimodal.genVideoFrame(id + 20, 1))))
    }.toDF("media_id", "content")
      .select(col("media_id"), col("content"),
        struct(lit("aqoi").as("format"), lit(0).as("width"),
          lit(0).as("height"), lit(2).as("n_frames")).as("meta"))
    val audit = PerceptualHash.videoCapAudit(rows, everyN = 2, maxBucket = 2)
      .as[(Long, Long)].collect().toSet
    assert(audit == Set((PerceptualHash.ahash64(shared), 3L)), s"got $audit")
  }

  test("png payloads hash exactly like their native-container siblings (dist-0 dups)") {
    val docs = Tables.documents(spark, SparkTestSession.Sf).limit(60)
    val ids = docs.select("doc_id").as[Long].collect().toSeq
    val both = Multimodal.realMedia(docs).unionByName(Multimodal.pngMedia(docs))
    val h = PerceptualHash.imageHashes(both)
    val png = h.filter(col("format") === "png")
      .select("media_id", "ahash", "dhash").as[(Long, Long, Long)].collect()
    assert(png.length == ids.size) // EVERY doc got a png (wav ids too)
    png.foreach { case (id, a, d) =>
      val img = Multimodal.genImage(id - Multimodal.PngIdOffset)
      assert(a == PerceptualHash.ahash64(img) && d == PerceptualHash.dhash64(img),
        s"png hash drifted for $id")
    }
    // each re-encoded copy is a dist-0 near-dup of its sibling
    val pairs = PerceptualHash.nearDupPairs(both, maxDist = 0)
      .as[(Long, Long, Long)].collect().toSet
    ids.filter(_ % 4 != 2).foreach { i =>
      assert(pairs.contains((i, i + Multimodal.PngIdOffset, 0L)), s"doc $i")
    }
  }

  test("gif payloads hash exactly like their native-container siblings (dist-0 dups)") {
    val docs = Tables.documents(spark, SparkTestSession.Sf).limit(60)
    val ids = docs.select("doc_id").as[Long].collect().toSeq
    val both = Multimodal.realMedia(docs).unionByName(Multimodal.gifMedia(docs))
    val h = PerceptualHash.imageHashes(both)
    val gif = h.filter(col("format") === "gif")
      .select("media_id", "ahash", "dhash").as[(Long, Long, Long)].collect()
    // every doc outside the >256-pixel exclusion (doc_id % 20 == 19)
    assert(gif.length == ids.count(_ % 20 != 19))
    gif.foreach { case (id, a, d) =>
      val img = Multimodal.genImage(id - Multimodal.GifIdOffset)
      assert(a == PerceptualHash.ahash64(img) && d == PerceptualHash.dhash64(img),
        s"gif hash drifted for $id")
    }
    // each palette-exact copy is a dist-0 near-dup of its sibling
    val pairs = PerceptualHash.nearDupPairs(both, maxDist = 0)
      .as[(Long, Long, Long)].collect().toSet
    ids.filter(i => i % 4 != 2 && i % 20 != 19).foreach { i =>
      assert(pairs.contains((i, i + Multimodal.GifIdOffset, 0L)), s"doc $i")
    }
  }

  test("extendHashIndex: batch folds in; cap crossings mask old rows; equals rebuild") {
    val A = 0x0001000200030004L
    val B = 0x000A000B000C000DL
    val corpus = Seq((1L, A), (2L, A), (3L, B)).toDF("pid", "ph")
    val idx0 = PerceptualHash.buildHashIndex(corpus, maxBucket = 2)
    // id 10 pushes every A-band bucket over the cap (3 > 2); id 20 is
    // a dist-1 near-dup of corpus id 3, indexed normally
    val batch = Seq((10L, A), (20L, B ^ 1L)).toDF("pid", "ph")
    val idx1 = PerceptualHash.extendHashIndex(idx0, batch)
    val probes = Seq((100L, A), (101L, B)).toDF("batch_id", "bh")
    def hits(ix: PerceptualHash.HashIndex) =
      PerceptualHash.probeHashes(ix, probes, maxDist = 3)
        .as[(Long, Long, Long)].collect().toSet
    // extended == from-scratch rebuild over corpus + batch
    val rebuilt = PerceptualHash.buildHashIndex(
      corpus.unionByName(batch), maxBucket = 2)
    assert(hits(idx1) == hits(rebuilt), s"${hits(idx1)} vs ${hits(rebuilt)}")
    // A's buckets turned hot: the old A rows are masked, no A hits
    assert(!hits(idx1).exists(_._1 == 100L), s"${hits(idx1)}")
    assert(idx1.hot.filter(col("n") === 3).count() == 4) // 4 A-bands
    // B's bucket stayed under the cap: dist-0 and the NEW dist-1 hit
    assert(hits(idx1).contains((101L, 3L, 0L)))
    assert(hits(idx1).contains((101L, 20L, 1L)))
    // the input snapshot is untouched (parquet-append semantics)
    assert(hits(idx0).contains((100L, 1L, 0L)))
    assert(hits(idx0).contains((100L, 2L, 0L)))
  }

  test("extendVideoIndex: an accepted clip is probe-able by the next batch; equals rebuild") {
    def clipRow(id: Long, src: Long) =
      Seq((id, Codecs.encodeAniQoi((0 until Multimodal.videoFrameCount(src))
        .map(f => Multimodal.genVideoFrame(src, f)))))
        .toDF("media_id", "content")
        .select(col("media_id"), col("content"),
          struct(lit("aqoi").as("format"), lit(0).as("width"),
            lit(0).as("height"), lit(2).as("n_frames")).as("meta"))
    val docs = Tables.documents(spark, SparkTestSession.Sf).limit(40)
    val video = Multimodal.videoMedia(docs)
    val corpus = video.filter(col("media_id") % 5 === 0)
    // a clip with >= 3 frames and distinct sampled hashes, NOT in corpus
    val src = video.filter(col("media_id") % 5 =!= 0)
      .filter(col("media_id") % 4 >= 1)
      .select("media_id").as[Long].collect()
      .find { id =>
        PerceptualHash.ahash64(Multimodal.genVideoFrame(id, 0)) !=
          PerceptualHash.ahash64(Multimodal.genVideoFrame(id, 2))
      }.get
    val fidx0 = PerceptualHash.buildVideoIndex(corpus, everyN = 2)
    val batch = clipRow(5000000L + src, src)
    val probe = clipRow(6000000L + src, src) // a later re-encode of the same clip
    // before extension: the probe matches nothing
    assert(PerceptualHash.probeVideo(fidx0, probe, everyN = 2, minShared = 2)
      .collect().isEmpty)
    val fidx1 = PerceptualHash.extendVideoIndex(fidx0, batch, everyN = 2)
    def hits(ix: PerceptualHash.FrameIndex) =
      PerceptualHash.probeVideo(ix, probe, everyN = 2, minShared = 2)
        .as[(Long, Long, Long)].collect().toSet
    assert(hits(fidx1).exists(p => p._2 == 5000000L + src && p._3 >= 2L),
      s"accepted clip not probe-able: ${hits(fidx1)}")
    val rebuilt = PerceptualHash.buildVideoIndex(
      corpus.unionByName(batch), everyN = 2)
    assert(hits(fidx1) == hits(rebuilt))
  }

  test("save/load: persisted hash and frame indexes probe identically") {
    val docs = Tables.documents(spark, SparkTestSession.Sf).limit(40)
    // image index
    val media = Multimodal.realMedia(docs)
    val corpus = media.filter(col("media_id") % 5 === 0)
    val probeSet = media.filter(col("media_id") % 5 === 1).limit(30)
    val hidx = PerceptualHash.buildImageIndex(corpus)
    val hPath = java.nio.file.Files.createTempDirectory("hidx").toString
    PerceptualHash.saveHashIndex(hidx, hPath)
    val hLoaded = PerceptualHash.loadHashIndex(spark, hPath)
    assert(hLoaded.maxBucket == hidx.maxBucket)
    def iHits(ix: PerceptualHash.HashIndex) =
      PerceptualHash.probeImages(ix, probeSet, maxDist = 3)
        .as[(Long, Long, Long)].collect().toSet
    assert(iHits(hLoaded) == iHits(hidx))
    // video index
    val video = Multimodal.videoMedia(docs)
    val vCorpus = video.filter(col("media_id") % 5 === 0)
    val vProbe = video.filter(col("media_id") % 5 === 1).limit(20)
    val fidx = PerceptualHash.buildVideoIndex(vCorpus, everyN = 2)
    val vPath = java.nio.file.Files.createTempDirectory("vidx").toString
    PerceptualHash.saveVideoIndex(fidx, vPath)
    val fLoaded = PerceptualHash.loadVideoIndex(spark, vPath)
    def vHits(ix: PerceptualHash.FrameIndex) =
      PerceptualHash.probeVideo(ix, vProbe, everyN = 2, minShared = 1)
        .as[(Long, Long, Long)].collect().toSet
    assert(vHits(fLoaded) == vHits(fidx))
    // a loaded index keeps extending
    val ext = PerceptualHash.extendHashIndex(hLoaded,
      PerceptualHash.imageHashes(probeSet)
        .select(col("media_id").as("pid"), col("ahash").as("ph")))
    assert(ext.hashes.count() == hLoaded.hashes.count() +
      PerceptualHash.imageHashes(probeSet).count())
  }

  test("sharedImageHashes: one build per frame+key, no cross-frame aliasing, bytes identical") {
    val docsA = Tables.documents(spark, SparkTestSession.Sf).limit(24)
    val docsB = Tables.documents(spark, SparkTestSession.Sf).limit(12)
    val key = Some("phash-cache-spec")
    // same frame + key: the SAME DataFrame instance (one decode pass)
    val a1 = PerceptualHash.sharedImageHashes(Multimodal.realMedia(docsA), key)
    val a2 = PerceptualHash.sharedImageHashes(Multimodal.realMedia(docsA), key)
    assert(a1 eq a2)
    // the artifact's rows are byte-identical to the uncached pass
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, String, Long, Long)].collect().toSet
    assert(rows(a1) == rows(PerceptualHash.imageHashes(Multimodal.realMedia(docsA))))
    // a DIFFERENT frame under the SAME key must not be served A's table
    val b = PerceptualHash.sharedImageHashes(Multimodal.realMedia(docsB), key)
    assert(rows(b) == rows(PerceptualHash.imageHashes(Multimodal.realMedia(docsB))))
    assert(rows(b) != rows(a1))
  }

  test("jpeg arm: decoded, deterministic in-JVM, near the lossless hash") {
    val img = Multimodal.genImage(5L)
    val rows = Seq((1L, Codecs.encodeJpeg(img)))
      .toDF("media_id", "content")
      .select(col("media_id"), col("content"),
        struct(lit("jpeg").as("format"), lit(img.width).as("width"),
          lit(img.height).as("height"), lit(1).as("n_frames")).as("meta"))
    def run() = PerceptualHash.imageHashes(rows)
      .select("media_id", "format", "ahash", "dhash")
      .as[(Long, String, Long, Long)].collect().toSeq
    val out = run()
    assert(out.length == 1 && out.head._2 == "jpeg")
    // lossy decode: the hash may drift a few bits but must stay NEAR
    // the lossless hash (same picture), and be stable across decodes
    val drift = java.lang.Long.bitCount(out.head._3 ^ PerceptualHash.ahash64(img))
    assert(drift <= 16, s"jpeg ahash drifted $drift bits")
    assert(run() == out, "jpeg decode must be deterministic within a JVM")
  }

  test("jpeg re-encode of a real-size image is CAUGHT by the banded near-dup join") {
    // the crawl case the jpeg arm exists for: the same picture stored
    // once as a lossless container and once as a jpeg re-encode. At
    // realistic dimensions the 8x8 aHash absorbs the block artifacts,
    // so the pair lands within the banded join's dist<=3 completeness
    val px = Array.tabulate(64 * 48) { i =>
      val x = i % 64; val y = i / 64
      val v = ((x * 255) / 63 + (y * 200) / 47) / 2
      (v << 16) | (v << 8) | v
    }
    val img = Codecs.Image(64, 48, px)
    // the control must differ STRUCTURALLY, not just in values — two
    // smooth gradients share an aHash by construction (half-bright
    // split), which is correct aHash behavior, not a join bug
    val other = Codecs.Image(64, 48, Array.tabulate(64 * 48) { i =>
      if ((i % 64) / 8 % 2 == 0) 0xffffff else 0x000000 // vertical bars
    })
    assert(PerceptualHash.ahash64(other) != PerceptualHash.ahash64(img))
    val rows = Seq(
      (1L, Codecs.encodeBmp(img), "bmp"),
      (2L, Codecs.encodeJpeg(img), "jpeg"),
      (3L, Codecs.encodePpm(other), "ppm"))
      .toDF("media_id", "content", "format")
      .select(col("media_id"), col("content"),
        struct(col("format"), lit(64).as("width"), lit(48).as("height"),
          lit(1).as("n_frames")).as("meta"))
    val pairs = PerceptualHash.nearDupPairs(rows, maxDist = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 <= 3L),
      s"jpeg twin not caught: $pairs")
    assert(!pairs.exists(p => p._2 == 3L), s"unrelated image matched: $pairs")
  }

  test("nearDupPairs: maxBucket drops hot buckets deterministically") {
    // 10 identical flat images: every band bucket holds all 10, so a
    // cap of 5 drops everything
    val rows = (1L to 10L).map(i => (i, Codecs.encodeBmp(flat(0x404040))))
      .toDF("media_id", "content")
      .select(col("media_id"), col("content"),
        struct(lit("bmp").as("format"), lit(8).as("width"), lit(8).as("height"),
          lit(1).as("n_frames")).as("meta"))
    assert(PerceptualHash.nearDupPairs(rows, maxDist = 0, maxBucket = 5).count() == 0L)
    assert(PerceptualHash.nearDupPairs(rows, maxDist = 0).count() == 45L)
  }
}
