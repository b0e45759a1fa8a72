package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM codecs for the multimodal column family (E4): 24-bit
  * uncompressed BMP, binary PPM (P6), compressed QOI, and PCM16 WAV.
  * No external libraries — these are the formats simple enough to
  * en/decode correctly from their public specs, which makes the decode
  * path of the media pipeline end-to-end real instead of a stub.
  *
  * Decoders are strict on the envelope they support and throw
  * `IllegalArgumentException` on anything else; callers surface that
  * as a NULL feature row (corrupt media must not kill a 100 TB job).
  */
object Codecs {

  /** Packed 0xRRGGBB per pixel, row-major top-down. */
  final case class Image(width: Int, height: Int, pixels: Array[Int]) {
    require(pixels.length == width * height, "pixel count != w*h")
  }

  /** Mono/interleaved PCM16 samples. */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  // ---- BMP (Windows BITMAPINFOHEADER, 24 bpp, BI_RGB) -------------------

  def encodeBmp(img: Image): Array[Byte] = {
    val rowBytes = img.width * 3
    val pad = (4 - rowBytes % 4) % 4
    val dataSize = (rowBytes + pad) * img.height
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize).putInt(0).putInt(54)
    buf.putInt(40).putInt(img.width).putInt(img.height) // +h = bottom-up
    buf.putShort(1).putShort(24).putInt(0).putInt(dataSize)
    buf.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = img.height - 1 // bottom row first
    while (y >= 0) {
      var x = 0
      while (x < img.width) {
        val p = img.pixels(y * img.width + x)
        buf.put((p & 0xff).toByte)         // B
        buf.put(((p >> 8) & 0xff).toByte)  // G
        buf.put(((p >> 16) & 0xff).toByte) // R
        x += 1
      }
      var i = 0
      while (i < pad) { buf.put(0.toByte); i += 1 }
      y -= 1
    }
    buf.array()
  }

  def decodeBmp(bytes: Array[Byte]): Image = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val dataOffset = buf.getInt(10)
    val headerSize = buf.getInt(14)
    require(headerSize >= 40, s"unsupported DIB header size $headerSize")
    val width = buf.getInt(18)
    val rawHeight = buf.getInt(22)
    val bpp = buf.getShort(28).toInt
    val compression = buf.getInt(30)
    require(bpp == 24 && compression == 0,
      s"only 24bpp BI_RGB supported (got bpp=$bpp comp=$compression)")
    val bottomUp = rawHeight > 0
    val height = math.abs(rawHeight)
    require(width > 0 && height > 0, "degenerate dimensions")
    // dataOffset is attacker-controlled: a negative value passes the
    // truncation check below (negative + positive <= length) and then
    // indexes at a negative base — reject it outright
    require(dataOffset >= 54 && dataOffset <= bytes.length,
      s"bad pixel data offset $dataOffset")
    val rowBytes = width * 3
    val stride = rowBytes + (4 - rowBytes % 4) % 4
    require(bytes.length >= dataOffset + stride.toLong * height,
      "truncated pixel data")
    val pixels = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (bottomUp) height - 1 - y else y
      var x = 0
      val base = dataOffset + srcRow * stride
      while (x < width) {
        val b = bytes(base + x * 3) & 0xff
        val g = bytes(base + x * 3 + 1) & 0xff
        val r = bytes(base + x * 3 + 2) & 0xff
        pixels(y * width + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Image(width, height, pixels)
  }

  // ---- PPM (P6 binary, maxval 255) --------------------------------------

  def encodePpm(img: Image): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.pixels.length * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < img.pixels.length) {
      val p = img.pixels(i)
      out(header.length + i * 3) = ((p >> 16) & 0xff).toByte
      out(header.length + i * 3 + 1) = ((p >> 8) & 0xff).toByte
      out(header.length + i * 3 + 2) = (p & 0xff).toByte
      i += 1
    }
    out
  }

  def decodePpm(bytes: Array[Byte]): Image = {
    // header: "P6" ws width ws height ws maxval single-ws, then binary
    var pos = 0
    def skipWs(): Unit = {
      var inComment = false
      while (pos < bytes.length &&
             (inComment || bytes(pos) == ' ' || bytes(pos) == '\n' ||
              bytes(pos) == '\r' || bytes(pos) == '\t' || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n') inComment = false
        pos += 1
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
      }
      require(any, "bad PPM header int")
      v
    }
    require(bytes.length > 2 && bytes(0) == 'P' && bytes(1) == '6', "not P6")
    pos = 2
    val width = readInt()
    val height = readInt()
    val maxval = readInt()
    require(maxval == 255, s"only maxval 255 supported (got $maxval)")
    pos += 1 // the single whitespace after maxval
    require(bytes.length - pos >= width.toLong * height * 3, "truncated PPM")
    val pixels = new Array[Int](width * height)
    var i = 0
    while (i < pixels.length) {
      val r = bytes(pos + i * 3) & 0xff
      val g = bytes(pos + i * 3 + 1) & 0xff
      val b = bytes(pos + i * 3 + 2) & 0xff
      pixels(i) = (r << 16) | (g << 8) | b
      i += 1
    }
    Image(width, height, pixels)
  }

  // ---- QOI (Quite OK Image, qoiformat.org 1-page public spec) -----------
  // The compressed container of the family: run-length, 64-slot seen-
  // pixel index, 2-bit diffs and luma diffs — so the corrupt-payload
  // NULL path gets exercised by real bitstream errors, not just bad
  // headers. RGB only (channels=3); decode accepts 3 or 4 channels and
  // drops alpha (it still participates in the index hash, per spec).

  private def qoiHash(r: Int, g: Int, b: Int, a: Int): Int =
    (r * 3 + g * 5 + b * 7 + a * 11) % 64

  def encodeQoi(img: Image): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(14 + img.pixels.length + 8)
    val hdr = ByteBuffer.allocate(14)
    hdr.put('q'.toByte).put('o'.toByte).put('i'.toByte).put('f'.toByte)
    hdr.putInt(img.width).putInt(img.height) // big-endian, spec order
    hdr.put(3.toByte).put(0.toByte)          // RGB, sRGB-linear-alpha flag 0
    out.write(hdr.array())
    val index = new Array[Int](64) // packed 0xAARRGGBB, zero-initialized
    var pr = 0; var pg = 0; var pb = 0 // previous pixel starts (0,0,0,255)
    var run = 0
    var i = 0
    while (i < img.pixels.length) {
      val p = img.pixels(i)
      val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff; val b = p & 0xff
      if (r == pr && g == pg && b == pb) {
        run += 1
        if (run == 62) { out.write(0xc0 | (run - 1)); run = 0 }
      } else {
        if (run > 0) { out.write(0xc0 | (run - 1)); run = 0 }
        val packed = (0xff << 24) | (r << 16) | (g << 8) | b
        val h = qoiHash(r, g, b, 255)
        if (index(h) == packed) out.write(h) // QOI_OP_INDEX
        else {
          index(h) = packed
          val dr = r - pr; val dg = g - pg; val db = b - pb
          if (dr >= -2 && dr <= 1 && dg >= -2 && dg <= 1 && db >= -2 && db <= 1) {
            out.write(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
          } else {
            val drdg = dr - dg; val dbdg = db - dg
            if (dg >= -32 && dg <= 31 && drdg >= -8 && drdg <= 7 &&
                dbdg >= -8 && dbdg <= 7) {
              out.write(0x80 | (dg + 32))
              out.write(((drdg + 8) << 4) | (dbdg + 8))
            } else {
              out.write(0xfe); out.write(r); out.write(g); out.write(b)
            }
          }
        }
        pr = r; pg = g; pb = b
      }
      i += 1
    }
    if (run > 0) out.write(0xc0 | (run - 1))
    out.write(Array[Byte](0, 0, 0, 0, 0, 0, 0, 1), 0, 8) // end marker
    out.toByteArray
  }

  def decodeQoi(bytes: Array[Byte]): Image = {
    require(bytes.length >= 22, "truncated QOI") // 14 header + 8 end marker
    require(bytes(0) == 'q' && bytes(1) == 'o' && bytes(2) == 'i' &&
      bytes(3) == 'f', "not a QOI")
    val buf = ByteBuffer.wrap(bytes) // big-endian by default, spec order
    val width = buf.getInt(4)
    val height = buf.getInt(8)
    val channels = bytes(12).toInt
    require(width > 0 && height > 0 &&
      width.toLong * height <= 64L * 1024 * 1024, "degenerate dimensions")
    require(channels == 3 || channels == 4, s"bad channel count $channels")
    val n = width * height
    val pixels = new Array[Int](n)
    val index = new Array[Int](64)
    var r = 0; var g = 0; var b = 0; var a = 255
    var pos = 14
    val end = bytes.length - 8 // chunks stop before the end marker
    var i = 0
    while (i < n) {
      require(pos < end, "truncated QOI chunk stream")
      val tag = bytes(pos) & 0xff
      pos += 1
      if (tag == 0xfe) { // QOI_OP_RGB
        require(pos + 3 <= end, "truncated RGB chunk")
        r = bytes(pos) & 0xff; g = bytes(pos + 1) & 0xff
        b = bytes(pos + 2) & 0xff; pos += 3
      } else if (tag == 0xff) { // QOI_OP_RGBA
        require(pos + 4 <= end, "truncated RGBA chunk")
        r = bytes(pos) & 0xff; g = bytes(pos + 1) & 0xff
        b = bytes(pos + 2) & 0xff; a = bytes(pos + 3) & 0xff; pos += 4
      } else (tag >> 6) match {
        case 0 => // QOI_OP_INDEX
          val v = index(tag & 0x3f)
          a = (v >>> 24) & 0xff; r = (v >> 16) & 0xff
          g = (v >> 8) & 0xff; b = v & 0xff
        case 1 => // QOI_OP_DIFF, bias 2
          r = (r + ((tag >> 4) & 3) - 2) & 0xff
          g = (g + ((tag >> 2) & 3) - 2) & 0xff
          b = (b + (tag & 3) - 2) & 0xff
        case 2 => // QOI_OP_LUMA, bias 32 / 8
          require(pos + 1 <= end, "truncated LUMA chunk")
          val dg = (tag & 0x3f) - 32
          val second = bytes(pos) & 0xff; pos += 1
          r = (r + dg + ((second >> 4) & 0xf) - 8) & 0xff
          g = (g + dg) & 0xff
          b = (b + dg + (second & 0xf) - 8) & 0xff
        case _ => // QOI_OP_RUN, bias -1 (0xfe/0xff handled above)
          val run = (tag & 0x3f) + 1
          require(i + run <= n, s"run overruns pixel count at $i")
          val px = (r << 16) | (g << 8) | b
          var k = 0
          while (k < run - 1) { pixels(i) = px; i += 1; k += 1 }
          // the run's last pixel falls through to the shared store below
      }
      val px = (r << 16) | (g << 8) | b
      index(qoiHash(r, g, b, a)) = (a << 24) | px
      pixels(i) = px
      i += 1
    }
    Image(width, height, pixels)
  }

  // ---- WAV (RIFF, PCM 16-bit) -------------------------------------------

  def encodeWav(a: Audio): Array[Byte] = {
    val dataSize = a.samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(a.channels.toShort)
    buf.putInt(a.sampleRate)
    buf.putInt(a.sampleRate * a.channels * 2) // byte rate
    buf.putShort((a.channels * 2).toShort)    // block align
    buf.putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    a.samples.foreach(buf.putShort)
    buf.array()
  }

  // ---- G.711 µ-law (public ITU-T spec; exact integer arithmetic) --------
  // The companded 8-bit telephony/crawl format. Compress→expand is a
  // deterministic integer round-trip, so a SQL oracle replays decoded
  // µ-law samples bit-for-bit from the generating formulas.

  /** Linear 16-bit → µ-law byte (CLIP 32635, BIAS 0x84). */
  def mulawCompress(s: Short): Byte = {
    var pcm = s.toInt
    val sign = if (pcm < 0) 0x80 else 0x00
    if (pcm < 0) pcm = -pcm
    if (pcm > 32635) pcm = 32635
    pcm += 0x84
    val e = 31 - Integer.numberOfLeadingZeros(pcm) - 7 // MSB in [7,14] → e in [0,7]
    val mant = (pcm >> (e + 3)) & 0x0f
    (~(sign | (e << 4) | mant) & 0xff).toByte
  }

  /** µ-law byte → linear 16-bit (segment-midpoint reconstruction). */
  def mulawExpand(b: Byte): Short = {
    val u = ~b & 0xff
    val e = (u >> 4) & 0x07
    val mag = (((u & 0x0f) << 3) + 0x84) << e
    val s = mag - 0x84
    (if ((u & 0x80) != 0) -s else s).toShort
  }

  /** Linear 16-bit → A-law byte (even-bit inversion 0x55; segment 0
    * is linear at 16-step resolution, segments 1-7 logarithmic).
    */
  def alawCompress(s: Short): Byte = {
    val neg = s < 0
    var m = if (neg) -s.toInt else s.toInt
    if (m > 32767) m = 32767
    val code =
      if (m < 256) m >> 4
      else {
        val e = 31 - Integer.numberOfLeadingZeros(m) - 7 // MSB in [8,14] → e in [1,7]
        (e << 4) | ((m >> (e + 3)) & 0x0f)
      }
    (((if (neg) 0x00 else 0x80) | code) ^ 0x55).toByte
  }

  /** A-law byte → linear 16-bit (segment-midpoint reconstruction). */
  def alawExpand(b: Byte): Short = {
    val u = (b ^ 0x55) & 0xff
    val e = (u >> 4) & 0x07
    val mant = u & 0x0f
    val mag = if (e == 0) (mant << 4) + 8
              else ((mant << 4) + 0x108) << (e - 1)
    (if ((u & 0x80) != 0) mag else -mag).toShort
  }

  /** WAV container with G.711 A-law payload (audioFormat 6, 8-bit). */
  def encodeWavAlaw(a: Audio): Array[Byte] = {
    val dataSize = a.samples.length
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(6) // G.711 A-law
    buf.putShort(a.channels.toShort)
    buf.putInt(a.sampleRate)
    buf.putInt(a.sampleRate * a.channels)
    buf.putShort(a.channels.toShort)
    buf.putShort(8)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    a.samples.foreach(s => buf.put(alawCompress(s)))
    buf.array()
  }

  /** WAV container with G.711 µ-law payload (audioFormat 7, 8-bit). */
  def encodeWavMulaw(a: Audio): Array[Byte] = {
    val dataSize = a.samples.length
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(7) // G.711 mu-law
    buf.putShort(a.channels.toShort)
    buf.putInt(a.sampleRate)
    buf.putInt(a.sampleRate * a.channels) // byte rate (1 byte/sample)
    buf.putShort(a.channels.toShort)      // block align
    buf.putShort(8)
    buf.put("data".getBytes("US-ASCII")).putInt(dataSize)
    a.samples.foreach(s => buf.put(mulawCompress(s)))
    buf.array()
  }

  /** Chunk-walking decoder: tolerates extra chunks (LIST, fact, ...)
    * between fmt and data, as real-world WAV files carry. Accepts
    * PCM16 (format 1) and G.711 µ-law (format 7, expanded to 16-bit).
    */
  def decodeWav(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44, "truncated WAV")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def fourcc(off: Int) = new String(bytes, off, 4, "US-ASCII")
    require(fourcc(0) == "RIFF" && fourcc(8) == "WAVE", "not a RIFF/WAVE")
    var pos = 12
    var sampleRate = -1
    var channels = -1
    var fmt = -1
    var dataOff = -1
    var dataSize = -1
    while (pos + 8 <= bytes.length && (sampleRate < 0 || dataOff < 0)) {
      val id = fourcc(pos)
      val size = buf.getInt(pos + 4)
      require(size >= 0 && pos + 8 + size <= bytes.length,
        s"bad chunk size $size at $pos")
      id match {
        case "fmt " =>
          // the fields read below extend 16 bytes into the chunk; a
          // shorter declared size at end-of-buffer would read past it
          require(size >= 16, s"fmt chunk too short ($size)")
          fmt = buf.getShort(pos + 8).toInt
          require(fmt == 1 || fmt == 6 || fmt == 7,
            s"unsupported audio format $fmt")
          channels = buf.getShort(pos + 10).toInt
          sampleRate = buf.getInt(pos + 12)
          val bits = buf.getShort(pos + 22).toInt
          require((fmt == 1 && bits == 16) || (fmt != 1 && bits == 8),
            s"format $fmt with $bits bits")
        case "data" =>
          dataOff = pos + 8
          dataSize = size
        case _ => () // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(sampleRate > 0 && dataOff >= 0, "missing fmt/data chunk")
    // decode the payload AFTER the walk: the data chunk may precede
    // fmt, and the sample width depends on the format
    val samples =
      if (fmt == 1) {
        val out = new Array[Short](dataSize / 2)
        var i = 0
        while (i < out.length) { out(i) = buf.getShort(dataOff + i * 2); i += 1 }
        out
      } else {
        val out = new Array[Short](dataSize)
        var i = 0
        while (i < out.length) {
          out(i) = if (fmt == 7) mulawExpand(bytes(dataOff + i))
                   else alawExpand(bytes(dataOff + i))
          i += 1
        }
        out
      }
    Audio(sampleRate, channels, samples)
  }

  // ---- PNG / JPEG via javax.imageio (JDK-bundled, zero new deps) --------
  // The formats a real crawl actually carries. PNG is lossless, so a
  // decode recovers the exact pixels (perceptual hashes stay exact
  // integers, oracle-matchable); JPEG decode is decoder-dependent
  // (spec-pinned only). Encoders exist to build test/ingest fixtures.

  def encodePng(img: Image): Array[Byte] = encodeImageIO(img, "png")

  def encodeJpeg(img: Image): Array[Byte] = encodeImageIO(img, "jpeg")

  /** Lossless GIF encode: the palette is built EXACTLY from the
    * image's distinct colors (first-appearance order) and the pixels
    * written as palette indexes, so GIF's LZW — lossless over the
    * index stream — round-trips every pixel bit-for-bit. Feeding the
    * GIF writer an RGB image instead would palettize through its own
    * quantizer (lossy above its heuristics); >256 distinct colors
    * cannot be paletted at all and are rejected, never approximated
    * (the perceptual-hash oracle depends on exact pixels).
    */
  def encodeGif(img: Image): Array[Byte] = {
    val palette = new java.util.LinkedHashMap[Integer, Integer]()
    var i = 0
    while (i < img.pixels.length) {
      val c = img.pixels(i) & 0xffffff
      if (!palette.containsKey(c)) palette.put(c, palette.size())
      i += 1
    }
    val n = palette.size()
    require(n <= 256, s"$n distinct colors: lossless GIF needs <= 256")
    val r = new Array[Byte](n); val g = new Array[Byte](n)
    val b = new Array[Byte](n)
    palette.forEach { (c, idx) =>
      r(idx) = ((c >> 16) & 0xff).toByte
      g(idx) = ((c >> 8) & 0xff).toByte
      b(idx) = (c & 0xff).toByte
    }
    val icm = new java.awt.image.IndexColorModel(8, n, r, g, b)
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    val raster = bi.getRaster
    var y = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        raster.setSample(x, y, 0,
          palette.get(img.pixels(y * img.width + x) & 0xffffff).intValue())
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
    require(writers.hasNext, "no ImageIO writer for gif")
    val writer = writers.next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      // interlace OFF, explicitly: the JDK writer's default
      // (MODE_COPY_FROM_METADATA) interlaces, and for images with
      // height < 5 the interlace pass structure writes fewer data rows
      // than the reader reconstructs — a blank row appears and the
      // round-trip silently stops being lossless (caught by the 4x3
      // resize twins; 16x16 fixtures never tripped it)
      val p = writer.getDefaultWriteParam
      p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    } finally {
      writer.dispose()
      ios.close()
    }
    out.toByteArray
  }

  private def encodeImageIO(img: Image, format: String): Array[Byte] = {
    val bi = new java.awt.image.BufferedImage(
      img.width, img.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    bi.setRGB(0, 0, img.width, img.height, img.pixels, 0, img.width)
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(bi, format, out),
      s"no ImageIO writer for $format")
    out.toByteArray
  }

  // ImageIO defaults to a temp-FILE-backed stream cache per decode —
  // one file create/delete per image is pure overhead (and /tmp churn)
  // for byte-array payloads that are already in memory
  locally { javax.imageio.ImageIO.setUseCache(false) }

  /** Decode any ImageIO-readable payload (png, jpeg) to packed-RGB
    * pixels. Throws on unreadable bytes like every other decoder here
    * (callers surface that as a NULL row).
    */
  def decodeImageIO(bytes: Array[Byte]): Image = {
    val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(bi != null, "no ImageIO reader matched the payload")
    val w = bi.getWidth
    val h = bi.getHeight
    require(w > 0 && h > 0 && w.toLong * h <= 64L * 1024 * 1024,
      "degenerate dimensions")
    val px = bi.getRGB(0, 0, w, h, null, 0, w)
    var i = 0
    while (i < px.length) { px(i) &= 0xffffff; i += 1 } // drop alpha
    Image(w, h, px)
  }

  // ---- transforms --------------------------------------------------------

  // ---- AQV1 animation container (QOI frame sequence) --------------------
  // The video stand-in the container lacks an external codec for: a
  // length-prefixed sequence of independently-decodable QOI frames.
  // Layout: magic "AQV1" | int32 BE frame count | per frame
  // (int32 BE payload length | QOI bytes). Independent frames make
  // SELECTIVE decode possible: frame k is reachable by walking k
  // length prefixes, never decompressing the frames a sampler skips —
  // at 100 TB you decode the sampled frames, not the clip.

  def encodeAniQoi(frames: Seq[Image]): Array[Byte] = {
    require(frames.nonEmpty, "empty animation")
    val payloads = frames.map(encodeQoi)
    val total = 8 + payloads.map(_.length + 4).sum
    val buf = ByteBuffer.allocate(total) // BIG_ENDIAN default
    buf.put('A'.toByte).put('Q'.toByte).put('V'.toByte).put('1'.toByte)
    buf.putInt(frames.length)
    payloads.foreach { p => buf.putInt(p.length); buf.put(p) }
    buf.array()
  }

  def aniQoiFrameCount(bytes: Array[Byte]): Int = {
    require(bytes.length >= 8 && bytes(0) == 'A' && bytes(1) == 'Q' &&
      bytes(2) == 'V' && bytes(3) == '1', "not an AQV1 stream")
    val n = ByteBuffer.wrap(bytes).getInt(4)
    require(n > 0, s"degenerate frame count $n")
    n
  }

  /** Decode ONLY frame `idx` (0-based): walk `idx` length prefixes,
    * QOI-decode one payload. Bounds-checked against truncation — a cut
    * stream throws (callers map to the NULL row, never a crash).
    */
  def decodeAniQoiFrame(bytes: Array[Byte], idx: Int): Image = {
    val n = aniQoiFrameCount(bytes)
    require(idx >= 0 && idx < n, s"frame $idx out of [0, $n)")
    val buf = ByteBuffer.wrap(bytes)
    var pos = 8
    var f = 0
    // length checks in LONG arithmetic: an adversarial len near
    // Int.MaxValue wraps pos + 4 + len negative and passes an int
    // comparison
    while (f < idx) {
      require(pos + 4 <= bytes.length, "truncated frame table")
      val len = buf.getInt(pos)
      require(len > 0 && pos.toLong + 4 + len <= bytes.length, "bad frame length")
      pos += 4 + len
      f += 1
    }
    require(pos + 4 <= bytes.length, "truncated frame table")
    val len = buf.getInt(pos)
    require(len > 0 && pos.toLong + 4 + len <= bytes.length, "bad frame length")
    decodeQoi(java.util.Arrays.copyOfRange(bytes, pos + 4, pos + 4 + len))
  }

  /** Nearest-neighbor resize — the real pixel operation behind the
    * resize API (no external imaging library needed).
    */
  def resizeNearest(img: Image, w: Int, h: Int): Image = {
    require(w > 0 && h > 0, "degenerate target")
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      val sy = (y.toLong * img.height / h).toInt
      var x = 0
      while (x < w) {
        val sx = (x.toLong * img.width / w).toInt
        out(y * w + x) = img.pixels(sy * img.width + sx)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }

  /** Linear-interpolation sample-rate conversion in EXACT integer
    * arithmetic (the audio twin of [[resizeNearest]]): output frame j
    * sits at source position j·srcRate/dstRate expressed as the exact
    * rational (idx = num / dstRate, rem = num % dstRate), and the
    * interpolated value s0 + (s1−s0)·rem/dstRate uses TRUNCATING
    * integer division — the same semantics as DuckDB's `//`, so a SQL
    * oracle replays every output sample bit-for-bit. Interleaved
    * multi-channel frames resample per channel; the final source frame
    * clamps (rem is 0 there by construction of the output length).
    */
  def resampleLinear(a: Audio, dstRate: Int): Audio = {
    require(dstRate > 0, "degenerate target rate")
    val ch = a.channels
    val n = a.samples.length / ch
    if (n == 0 || dstRate == a.sampleRate)
      return Audio(dstRate, ch, a.samples.clone())
    val m = ((n - 1).toLong * dstRate / a.sampleRate).toInt + 1
    val out = new Array[Short](m * ch)
    var j = 0
    while (j < m) {
      val num = j.toLong * a.sampleRate
      val i = (num / dstRate).toInt
      val rem = num % dstRate
      var c = 0
      while (c < ch) {
        val s0 = a.samples(i * ch + c)
        val s1 = if (i + 1 < n) a.samples((i + 1) * ch + c) else s0
        out(j * ch + c) = (s0 + (s1 - s0).toLong * rem / dstRate).toShort
        c += 1
      }
      j += 1
    }
    Audio(dstRate, ch, out)
  }
}
