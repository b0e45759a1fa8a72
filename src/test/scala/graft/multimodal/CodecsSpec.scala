package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Golden-file and round-trip tests for the pure-JVM codecs. The
  * golden byte arrays are hand-assembled from the public format specs
  * (BMP: BITMAPFILEHEADER+BITMAPINFOHEADER; PPM: netpbm P6; WAV:
  * RIFF/fmt/data), so a decoder that merely inverts its own encoder's
  * mistakes still fails here.
  */
class CodecsSpec extends AnyFunSuite {

  // ---- golden BMP: 2x2, 24bpp, bottom-up, rows padded to 4 bytes ----
  // pixels (top-down): (255,0,0) (0,255,0) / (0,0,255) (255,255,255)
  private val goldenBmp: Array[Byte] = {
    val header = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0, 2, 0, 0, 0, 2, 0, 0, 0, 1, 0, 24, 0, // DIB: 2x2, 24bpp
      0, 0, 0, 0, 16, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0)
    // bottom row first, BGR order, 2 pad bytes per row (2*3=6 -> 8)
    val pix = Array[Int](
      255, 0, 0, /*blue*/ 255, 255, 255, /*white*/ 0, 0,
      0, 0, 255, /*red*/ 0, 255, 0, /*green*/ 0, 0)
    (header ++ pix).map(_.toByte)
  }

  test("golden BMP decodes: dims, channel order, bottom-up, padding") {
    val img = Codecs.decodeBmp(goldenBmp)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq ==
      Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
  }

  test("golden PPM decodes (header parse incl. whitespace)") {
    val header = "P6\n2 2\n255\n".getBytes("US-ASCII")
    val pix = Array[Int](255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
      .map(_.toByte)
    val img = Codecs.decodePpm(header ++ pix)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq ==
      Seq(0xff0000, 0x00ff00, 0x0000ff, 0xffffff))
  }

  test("PPM comment lines in the header are skipped") {
    val header = "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII")
    val pix = Array[Int](1, 2, 3, 4, 5, 6).map(_.toByte)
    val img = Codecs.decodePpm(header ++ pix)
    assert(img.width == 2 && img.height == 1)
    assert(img.pixels.toSeq == Seq(0x010203, 0x040506))
  }

  // ---- golden WAV: 8000 Hz mono PCM16, 4 samples ----
  private val goldenWav: Array[Byte] = {
    val b = java.nio.ByteBuffer.allocate(52)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put("RIFF".getBytes).putInt(44).put("WAVE".getBytes)
    b.put("fmt ".getBytes).putInt(16)
    b.putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2)
    b.putShort(16)
    b.put("data".getBytes).putInt(8)
    Seq(0, 1000, -1000, 32767).foreach(s => b.putShort(s.toShort))
    b.array()
  }

  test("golden WAV decodes: rate, channels, LE samples") {
    val a = Codecs.decodeWav(goldenWav)
    assert(a.sampleRate == 8000 && a.channels == 1)
    assert(a.samples.toSeq == Seq[Short](0, 1000, -1000, 32767))
  }

  test("WAV decoder skips unknown chunks between fmt and data") {
    // splice a 6-byte "LIST" chunk (word-aligned) before data
    val b = java.nio.ByteBuffer.allocate(52 + 14)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put(goldenWav, 0, 36)               // RIFF..fmt chunk end
    b.put("LIST".getBytes).putInt(5).put(Array[Byte](1, 2, 3, 4, 5, 0))
    b.put(goldenWav, 36, 16)              // data chunk
    val a = Codecs.decodeWav(b.array())
    assert(a.samples.toSeq == Seq[Short](0, 1000, -1000, 32767))
  }

  test("encode/decode round-trips are identity (BMP incl. odd widths)") {
    // width 3 exercises row padding (9 bytes -> 12)
    for (w <- Seq(1, 3, 7, 16); h <- Seq(1, 2, 5)) {
      val px = Array.tabulate(w * h)(i => (i * 2654435761L & 0xffffff).toInt)
      val img = Codecs.Image(w, h, px)
      assert(Codecs.decodeBmp(Codecs.encodeBmp(img)).pixels.toSeq == px.toSeq,
        s"bmp $w x $h")
      assert(Codecs.decodePpm(Codecs.encodePpm(img)).pixels.toSeq == px.toSeq,
        s"ppm $w x $h")
    }
    val a = Codecs.Audio(44100, 2,
      Array.tabulate(777)(i => ((i * 31) % 65536 - 32768).toShort))
    val back = Codecs.decodeWav(Codecs.encodeWav(a))
    assert(back.sampleRate == 44100 && back.channels == 2)
    assert(back.samples.toSeq == a.samples.toSeq)
  }

  test("corrupt inputs are rejected, not misread") {
    intercept[IllegalArgumentException](Codecs.decodeBmp("nope".getBytes))
    intercept[IllegalArgumentException](
      Codecs.decodeBmp(goldenBmp.take(40))) // truncated
    intercept[IllegalArgumentException](Codecs.decodePpm("P5\n".getBytes))
    intercept[IllegalArgumentException](Codecs.decodeWav(goldenWav.take(20)))
  }

  // ---- golden QOI: 2x2, RGB — hand-assembled chunk stream ----
  // pixels: red, red (RUN), (254,255,254) (DIFF with wraparound),
  // red again (INDEX, hash(255,0,0,255) = 50)
  private val goldenQoi: Array[Byte] = {
    val header = Array[Int]('q', 'o', 'i', 'f', 0, 0, 0, 2, 0, 0, 0, 2, 3, 0)
    val chunks = Array[Int](
      0xfe, 255, 0, 0, // QOI_OP_RGB red
      0xc0,            // QOI_OP_RUN 1
      0x54,            // QOI_OP_DIFF dr=-1 dg=-1 db=-2 (mod-256 wrap)
      50)              // QOI_OP_INDEX -> red
    val end = Array[Int](0, 0, 0, 0, 0, 0, 0, 1)
    (header ++ chunks ++ end).map(_.toByte)
  }

  test("golden QOI decodes: RGB, run, wraparound diff, index chunks") {
    val img = Codecs.decodeQoi(goldenQoi)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq ==
      Seq(0xff0000, 0xff0000, 0xfefffe, 0xff0000))
  }

  test("QOI round-trips images that exercise every op family") {
    // gradient rows (DIFF/LUMA/RGB) + repeated rows (RUN/INDEX)
    val w = 13; val h = 9
    val px = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (y % 3 == 2) 0x336699 // constant rows -> runs + index hits
      else (((x * 37 + y * 3) % 256) << 16) | (((x + y * 91) % 256) << 8) |
        ((x * 2 + y) % 256)
    }
    val img = Codecs.Image(w, h, px)
    val enc = Codecs.encodeQoi(img)
    val back = Codecs.decodeQoi(enc)
    assert(back.width == w && back.height == h)
    assert(back.pixels.toSeq == px.toSeq)
    assert(enc.length < 14 + w * h * 3 + 8) // actually compressed
  }

  test("corrupt QOI bitstreams are rejected, not misread") {
    intercept[IllegalArgumentException](Codecs.decodeQoi("qoif".getBytes))
    // chunk stream ends with 3 of 4 pixels still undecoded
    val starved = (Array[Int]('q', 'o', 'i', 'f', 0, 0, 0, 2, 0, 0, 0, 2, 3, 0,
      0xfe, 255, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)).map(_.toByte)
    intercept[IllegalArgumentException](Codecs.decodeQoi(starved))
    // a run chunk overrunning the declared pixel count (RUN 62 at px 2/4)
    val overrun = goldenQoi.clone()
    overrun(18) = 0xfd.toByte
    intercept[IllegalArgumentException](Codecs.decodeQoi(overrun))
    val badMagic = goldenQoi.clone(); badMagic(0) = 'x'.toByte
    intercept[IllegalArgumentException](Codecs.decodeQoi(badMagic))
  }

  test("AQV1 fuzz: every truncation point and corrupt length fails cleanly") {
    val frames = (0 until 3).map(f => Multimodal.genVideoFrame(5L, f))
    val bytes = Codecs.encodeAniQoi(frames)
    // every prefix either decodes frame 0 fully (prefix covers it) or
    // throws — never reads past the buffer or loops
    (0 until bytes.length).foreach { cut =>
      try { Codecs.decodeAniQoiFrame(bytes.take(cut), 2); () }
      catch { case _: IllegalArgumentException | _: IndexOutOfBoundsException => () }
    }
    // adversarial frame lengths: negative and overflowing
    val negLen = bytes.clone()
    java.nio.ByteBuffer.wrap(negLen).putInt(8, -5)
    intercept[IllegalArgumentException](Codecs.decodeAniQoiFrame(negLen, 1))
    val hugeLen = bytes.clone()
    java.nio.ByteBuffer.wrap(hugeLen).putInt(8, Int.MaxValue)
    intercept[IllegalArgumentException](Codecs.decodeAniQoiFrame(hugeLen, 1))
    val negCount = bytes.clone()
    java.nio.ByteBuffer.wrap(negCount).putInt(4, -1)
    intercept[IllegalArgumentException](Codecs.aniQoiFrameCount(negCount))
  }

  test("adversarial headers fail with require, never index out of bounds") {
    // negative pixel-data offset passes a naive truncation check
    // (negative + positive <= length) and then indexes negatively
    val negOffset = goldenBmp.clone()
    val nb = java.nio.ByteBuffer.wrap(negOffset)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    nb.putInt(10, -8)
    intercept[IllegalArgumentException](Codecs.decodeBmp(negOffset))
    // fmt chunk shorter than the 16 bytes the decoder reads from it
    val shortFmt = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    shortFmt.put("RIFF".getBytes("US-ASCII")).putInt(36)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(8).putInt(1).putInt(44100)
      .put("data".getBytes("US-ASCII")).putInt(8).putInt(0).putInt(0)
    intercept[IllegalArgumentException](Codecs.decodeWav(shortFmt.array()))
  }

  test("gif: palette-exact round-trip; >256 distinct colors rejected") {
    // 256 distinct colors on a 16x16 grid — the palette boundary
    val full = Codecs.Image(16, 16,
      Array.tabulate(256)(i => (i << 16) | ((255 - i) << 8) | (i * 7 % 256)))
    val back = Codecs.decodeImageIO(Codecs.encodeGif(full))
    assert(back.width == 16 && back.height == 16)
    assert(back.pixels.toSeq == full.pixels.toSeq)
    // the generator images round-trip bit-exactly too
    Seq(0L, 3L, 7L, 18L).foreach { id =>
      val img = Multimodal.genImage(id)
      val rt = Codecs.decodeImageIO(Codecs.encodeGif(img))
      assert(rt.pixels.toSeq == img.pixels.toSeq, s"gif drift for id $id")
    }
    // 257 distinct colors cannot be paletted — rejected, not quantized
    val over = Codecs.Image(257, 1, Array.tabulate(257)(i => i))
    intercept[IllegalArgumentException](Codecs.encodeGif(over))
    // every tiny size round-trips: the JDK writer's default interlace
    // mode silently corrupted heights < 5 (blank row, dropped row) —
    // encodeGif disables it explicitly
    for (w <- 1 to 8; h <- 1 to 8) {
      val px = Array.tabulate(w * h)(i =>
        ((i * 41) % 200) << 16 | ((i * 13) % 200) << 8 | (i % 200))
      val rt = Codecs.decodeImageIO(Codecs.encodeGif(Codecs.Image(w, h, px)))
      assert(rt.pixels.toSeq == px.toSeq, s"gif drift at ${w}x$h")
    }
  }

  test("mu-law: compress/expand inverse-consistent; container round-trips") {
    // idempotence on the quantization lattice: expand(compress(x)) is
    // a fixed point of the round-trip (the defining G.711 property)
    (-32768 to 32767 by 37).foreach { s =>
      val once = Codecs.mulawExpand(Codecs.mulawCompress(s.toShort))
      val twice = Codecs.mulawExpand(Codecs.mulawCompress(once))
      assert(once == twice, s"not a fixed point at $s: $once vs $twice")
      // reconstruction stays within the segment's quantization step
      val m = math.min(math.abs(s), 32635) + 132
      val step = 1 << (math.max(8, 32 - Integer.numberOfLeadingZeros(m)) - 5)
      assert(math.abs(once - s) <= step, s"error at $s: $once (step $step)")
    }
    // known reference points: silence and the clip rails
    assert(Codecs.mulawCompress(0) == 0xff.toByte)
    assert(Codecs.mulawExpand(0xff.toByte) == 0)
    assert(Codecs.mulawExpand(Codecs.mulawCompress(32767)) == 32124)
    assert(Codecs.mulawExpand(Codecs.mulawCompress(-32768)) == -32124)
    // container: a mu-law WAV decodes to the expanded samples
    val a = Codecs.Audio(8000, 1,
      Array.tabulate(128)(i => ((i * 517) % 2048 - 1024).toShort))
    val back = Codecs.decodeWav(Codecs.encodeWavMulaw(a))
    assert(back.sampleRate == 8000 && back.channels == 1)
    assert(back.samples.toSeq ==
      a.samples.map(s => Codecs.mulawExpand(Codecs.mulawCompress(s))).toSeq)
  }

  test("A-law: compress/expand inverse-consistent; container round-trips") {
    (-32768 to 32767 by 37).foreach { s =>
      val once = Codecs.alawExpand(Codecs.alawCompress(s.toShort))
      val twice = Codecs.alawExpand(Codecs.alawCompress(once))
      assert(once == twice, s"not a fixed point at $s: $once vs $twice")
      // segment 0 is linear (step 16); segment k quantizes at 2^(k+3)
      val m = math.min(math.abs(s), 32767)
      val step = if (m < 256) 16 else 1 << (32 - Integer.numberOfLeadingZeros(m) - 4)
      assert(math.abs(once - s) <= step, s"error at $s: $once (step $step)")
    }
    // segment-0 midpoints: 0 -> +8 (A-law has no signed zero code)
    assert(Codecs.alawExpand(Codecs.alawCompress(0)) == 8)
    assert(Codecs.alawExpand(Codecs.alawCompress(32767)) == 32256)
    val a = Codecs.Audio(8000, 1,
      Array.tabulate(128)(i => ((i * 517) % 2048 - 1024).toShort))
    val back = Codecs.decodeWav(Codecs.encodeWavAlaw(a))
    assert(back.samples.toSeq ==
      a.samples.map(s => Codecs.alawExpand(Codecs.alawCompress(s))).toSeq)
  }

  test("nearest resize: exact on integer scale, dims on fractional") {
    val img = Codecs.Image(2, 2, Array(1, 2, 3, 4))
    val up = Codecs.resizeNearest(img, 4, 4)
    assert(up.pixels.toSeq ==
      Seq(1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
    val down = Codecs.resizeNearest(up, 2, 2)
    assert(down.pixels.toSeq == img.pixels.toSeq)
    val odd = Codecs.resizeNearest(img, 3, 1)
    assert(odd.width == 3 && odd.height == 1)
  }

  test("linear resample: exact midpoints on 2x upsample, identity on same rate") {
    val a = Codecs.Audio(8000, 1, Array[Short](0, 100, -50, 7))
    val up = Codecs.resampleLinear(a, 16000)
    // positions 0, 1/2, 1, 3/2, 2, 5/2, 3 — exact midpoint averages
    // with TRUNCATING division: (100-50)/2 -> 25, (-50+7)/2 trunc -> -22
    assert(up.sampleRate == 16000)
    assert(up.samples.toSeq == Seq[Short](0, 50, 100, 25, -50, -22, 7))
    val same = Codecs.resampleLinear(a, 8000)
    assert(same.samples.toSeq == a.samples.toSeq)
  }

  test("linear resample: downsample hits exact rational positions") {
    // 8000 -> 5000: j*8/5 positions; n=5 -> m = 4*5000/8000 + 1 = 3
    val a = Codecs.Audio(8000, 1, Array[Short](0, 10, 20, 30, 40))
    val d = Codecs.resampleLinear(a, 5000)
    // j=0 -> pos 0 -> 0; j=1 -> 8/5 = 1 rem 3000/5000 -> 10 + 10*3000/5000 = 16
    // j=2 -> 16/5 = 3 rem 1000/5000 -> 30 + 10*1000/5000 = 32
    assert(d.samples.toSeq == Seq[Short](0, 16, 32))
  }

  test("linear resample: interleaved stereo resamples per channel; end clamps") {
    val a = Codecs.Audio(8000, 2, Array[Short](0, 1000, 100, -1000, 200, 1000))
    val up = Codecs.resampleLinear(a, 16000)
    // frames (0,1000) (100,-1000) (200,1000): midpoints per channel
    assert(up.samples.toSeq ==
      Seq[Short](0, 1000, 50, 0, 100, -1000, 150, 0, 200, 1000))
    // last output frame lands exactly on the last input frame (rem 0)
    assert(up.samples.takeRight(2).toSeq == Seq[Short](200, 1000))
  }

  test("linear resample matches a reference double interpolation within truncation") {
    val a = Codecs.Audio(8000, 1,
      Array.tabulate(96)(i => ((i * 517 + 31) % 2048 - 1024).toShort))
    val d = Codecs.resampleLinear(a, 5000)
    assert(d.samples.length == (95L * 5000 / 8000).toInt + 1)
    d.samples.zipWithIndex.foreach { case (v, j) =>
      val pos = j * 8000.0 / 5000.0
      val i = math.min(pos.toInt, 94)
      val ref = a.samples(i) + (a.samples(math.min(i + 1, 95)) - a.samples(i)) * (pos - i)
      assert(math.abs(v - ref) <= 1.0, s"j=$j got $v ref $ref")
    }
  }
}
