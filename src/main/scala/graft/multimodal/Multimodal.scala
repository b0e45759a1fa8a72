package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (north-star operator E4, SURVEY.md §2.9):
  * image/audio/video payloads ride as opaque `BinaryType` columns with
  * a typed metadata struct; decode / feature-extract / resize /
  * frame-sample are per-partition transforms over the binary column.
  *
  * The decode path is REAL for three formats via the pure-JVM
  * [[Codecs]] (24bpp BMP, P6 PPM, PCM16 WAV): [[realMedia]] generates
  * actual encoded bytes, [[withMediaFeatures]] decodes pixels/samples
  * on the executors and emits exact integer features (so the DuckDB
  * oracle can recompute them from the generating formula — the codec
  * round-trip is oracle-verified end-to-end). Formats outside that
  * set (png/jpeg/mp4 need external libraries this container lacks)
  * fall back to the byte-level features of [[withDecodedFeatures]],
  * which also remains the schema-stable surface for opaque payloads.
  *
  * Scale: decode is per-row CPU work with no shuffle — embarrassingly
  * parallel across executors; corrupt bytes yield a NULL feature row
  * instead of failing the job.
  */
object Multimodal {

  /** media_id, content (binary), meta{format, width, height, n_frames} */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType))))))

  /** Synthetic media table derived from `documents` (text bytes stand
    * in for encoded frames — deterministic, schema-exact).
    */
  def syntheticMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        element_at(typedLit(Seq("png", "jpeg", "wav", "mp4")),
          (pmod(col("doc_id"), lit(4)) + 1).cast(IntegerType)).as("format"),
        (pmod(col("doc_id"), lit(8)) * 64 + 64).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(4)) * 64 + 64).cast(IntegerType).as("height"),
        (pmod(col("doc_id"), lit(30)) + 1).cast(IntegerType).as("n_frames")
      ).as("meta"))

  /** Byte-level features (length, portable content fingerprint, hash
    * histogram) — the container-agnostic path for formats [[Codecs]]
    * can't decode (png/jpeg/mp4 need external libraries). For
    * bmp/ppm/qoi/wav use [[withMediaFeatures]], which decodes actual
    * pixels/samples. The fingerprint is the engine-portable rolling
    * hash ([[graft.functions.kernels.polyHashUtf8Bytes]]) so an
    * independent engine verifies it from the source text — the DuckDB
    * oracle hash-matches this query.
    */
  def withDecodedFeatures(media: DataFrame): DataFrame =
    media
      .withColumn("byte_len", length(col("content")).cast(LongType))
      .withColumn("content_hash",
        graft.functions.ArrayExprs.polyHashBinary(col("content")))
      .withColumn("feat_histogram",
        transform(sequence(lit(0), lit(7)),
          i => pmod(xxhash64(col("content"), i), lit(256L))))

  /** Frame sampling: keep every `everyN`-th frame index as a metadata
    * operation (indices list; the binary slice happens at decode time
    * on the executor, never on the driver).
    */
  def sampleFrameIndices(media: DataFrame, everyN: Int): DataFrame =
    media.withColumn("sampled_frames",
      filter(sequence(lit(0), col("meta.n_frames") - 1),
        i => pmod(i, lit(everyN)) === 0))

  /** Resize request: pure metadata transform (target dims recorded;
    * see [[resizeImages]] for the real pixel operation).
    */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.format").as("format"),
        lit(w).as("width"), lit(h).as("height"),
        col("meta.n_frames").as("n_frames")))

  // ---- real codec path (BMP / PPM / WAV via Codecs) ---------------------

  /** Deterministic media generators: the pixel/sample values are simple
    * integer formulas of (media_id, x, y) / (media_id, i), chosen so an
    * SQL oracle can recompute the decoded-feature sums exactly without
    * being able to decode the container formats itself.
    */
  private[graft] def genImage(id: Long): Codecs.Image = {
    val w = (8 + (id % 4) * 4).toInt
    val h = (6 + (id % 5) * 2).toInt
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 7 + x * 3 + y * 5) % 256).toInt
        val g = ((id * 11 + x + y * 2) % 256).toInt
        val b = ((id * 13 + x * 2 + y) % 256).toInt
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Codecs.Image(w, h, px)
  }

  private[graft] def genAudio(id: Long): Codecs.Audio = {
    val n = (64 + (id % 16) * 16).toInt
    val s = Array.tabulate(n)(i => (((id * 31 + i * 17) % 2048) - 1024).toShort)
    Codecs.Audio(8000, 1, s)
  }

  private val encodeMediaUdf = udf((id: Long) => (id % 4) match {
    case 0 => Codecs.encodeBmp(genImage(id))
    case 1 => Codecs.encodePpm(genImage(id))
    case 2 => Codecs.encodeWav(genAudio(id))
    case _ => Codecs.encodeQoi(genImage(id))
  })

  /** Frame `f` of clip `id`: dims from the id (constant across the
    * clip, as video frames are), pixel formulas shifted per frame by
    * the 19/23/29 terms — deterministic, so the SQL oracle recomputes
    * any sampled frame's features without reading the container.
    */
  private[graft] def genVideoFrame(id: Long, f: Int): Codecs.Image = {
    val w = (8 + (id % 4) * 4).toInt
    val h = (6 + (id % 5) * 2).toInt
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 7 + f * 19 + x * 3 + y * 5) % 256).toInt
        val g = ((id * 11 + f * 23 + x + y * 2) % 256).toInt
        val b = ((id * 13 + f * 29 + x * 2 + y) % 256).toInt
        px(y * w + x) = (r << 16) | (g << 8) | b
        x += 1
      }
      y += 1
    }
    Codecs.Image(w, h, px)
  }

  /** Frames per clip: small (2..5) so the sampled set is 1..3. */
  private[graft] def videoFrameCount(id: Long): Int = (2 + id % 4).toInt

  private val encodeVideoUdf = udf((id: Long) =>
    Codecs.encodeAniQoi(
      (0 until videoFrameCount(id)).map(f => genVideoFrame(id, f))))

  /** Video table with REAL multi-frame payloads: every document gets
    * an AQV1 clip of [[videoFrameCount]] QOI frames generated by
    * [[genVideoFrame]]. meta.n_frames carries the true frame count.
    */
  def videoMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encodeVideoUdf(col("doc_id")).as("content"),
      struct(
        lit("aqoi").as("format"),
        (pmod(col("doc_id"), lit(4)) * 4 + 8).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(5)) * 2 + 6).cast(IntegerType).as("height"),
        (pmod(col("doc_id"), lit(4)) + 2).cast(IntegerType).as("n_frames")).as("meta"))

  /** Media table with REAL encoded payloads: BMP/PPM/QOI/WAV bytes
    * built by [[Codecs]] from deterministic pixel/sample formulas —
    * QOI adds a COMPRESSED container, so the decode path covers a real
    * bitstream (runs, diffs, index hits), not just fixed-layout pixels.
    */
  def realMedia(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      encodeMediaUdf(col("doc_id")).as("content"),
      struct(
        element_at(typedLit(Seq("bmp", "ppm", "wav", "qoi")),
          (pmod(col("doc_id"), lit(4)) + 1).cast(IntegerType)).as("format"),
        (pmod(col("doc_id"), lit(4)) * 4 + 8).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(5)) * 2 + 6).cast(IntegerType).as("height"),
        lit(1).as("n_frames")).as("meta"))

  private val encodePngUdf = udf((id: Long) => Codecs.encodePng(genImage(id)))

  /** PNG twin of [[realMedia]] — the same [[genImage]] pixels for every
    * document, re-encoded through javax.imageio's PNG writer with ids
    * offset by 10⁹. PNG is lossless, so each row is a RE-ENCODED COPY
    * of its realMedia sibling (same pixels, different container): the
    * crawl case perceptual dedup exists for, and since the pixels are
    * still the generating formulas, the DuckDB oracle keeps
    * hash-matching the hashes without reading a PNG.
    */
  val PngIdOffset = 1000000000L

  def pngMedia(documents: DataFrame): DataFrame =
    documents.select(
      (col("doc_id") + lit(PngIdOffset)).as("media_id"),
      encodePngUdf(col("doc_id")).as("content"),
      struct(
        lit("png").as("format"),
        (pmod(col("doc_id"), lit(4)) * 4 + 8).cast(IntegerType).as("width"),
        (pmod(col("doc_id"), lit(5)) * 2 + 6).cast(IntegerType).as("height"),
        lit(1).as("n_frames")).as("meta"))

  private val encodeGifUdf = udf((id: Long) => Codecs.encodeGif(genImage(id)))

  /** GIF twin of [[realMedia]] — [[genImage]] pixels through
    * [[Codecs.encodeGif]]'s palette-exact writer, ids offset by 2·10⁹.
    * A ≤256-color GIF decode is lossless, so each row is ANOTHER
    * re-encoded copy of its siblings (the third real crawl container
    * after png/jpeg), and the oracle keeps hash-matching from the
    * generating formulas. Restricted to documents whose image has
    * ≤ 256 PIXELS (w·h > 256 only at w=20, h=14, i.e.
    * doc_id ≡ 19 mod 20): distinct colors ≤ pixels guarantees the
    * exact palette exists — the subset predicate is deterministic, so
    * the oracle applies the same WHERE.
    */
  val GifIdOffset = 2000000000L

  def gifMedia(documents: DataFrame): DataFrame =
    documents
      .filter(pmod(col("doc_id"), lit(20)) =!= 19)
      .select(
        (col("doc_id") + lit(GifIdOffset)).as("media_id"),
        encodeGifUdf(col("doc_id")).as("content"),
        struct(
          lit("gif").as("format"),
          (pmod(col("doc_id"), lit(4)) * 4 + 8).cast(IntegerType).as("width"),
          (pmod(col("doc_id"), lit(5)) * 2 + 6).cast(IntegerType).as("height"),
          lit(1).as("n_frames")).as("meta"))

  private val encodeMulawUdf =
    udf((id: Long) => Codecs.encodeWavMulaw(genAudio(id)))

  /** G.711 µ-law twin of [[realMedia]]'s WAV slice — the same
    * [[genAudio]] samples companded through [[Codecs.mulawCompress]]
    * into an audioFormat-7 WAV container, ids offset by 3·10⁹. The
    * compress→expand round-trip is exact integer arithmetic, so the
    * DuckDB oracle recomputes the DECODED samples (and any feature of
    * them) from the generating formula plus the G.711 segment math —
    * the companded-telephony-crawl case, oracle-backed.
    */
  val MulawIdOffset = 3000000000L

  def mulawMedia(documents: DataFrame): DataFrame =
    documents
      .filter(pmod(col("doc_id"), lit(4)) === 2) // the wav slots
      .select(
        (col("doc_id") + lit(MulawIdOffset)).as("media_id"),
        encodeMulawUdf(col("doc_id")).as("content"),
        struct(
          lit("wav").as("format"),
          lit(0).as("width"),
          lit(0).as("height"),
          lit(1).as("n_frames")).as("meta"))

  private val encodeAlawUdf =
    udf((id: Long) => Codecs.encodeWavAlaw(genAudio(id)))

  /** G.711 A-law twin of the WAV slice (the [[mulawMedia]] shape for
    * the other telephony variant), ids offset by 4·10⁹ — segment 0 is
    * linear 16-step, segments 1-7 logarithmic; the round-trip is exact
    * integer arithmetic, oracle-replayable like µ-law's.
    */
  val AlawIdOffset = 4000000000L

  def alawMedia(documents: DataFrame): DataFrame =
    documents
      .filter(pmod(col("doc_id"), lit(4)) === 2)
      .select(
        (col("doc_id") + lit(AlawIdOffset)).as("media_id"),
        encodeAlawUdf(col("doc_id")).as("content"),
        struct(
          lit("wav").as("format"),
          lit(0).as("width"),
          lit(0).as("height"),
          lit(1).as("n_frames")).as("meta"))

  /** Exact integer features of a decoded payload. Image rows carry the
    * per-channel pixel sums; audio rows the PCM sample count, energy
    * (sum of squares) and peak amplitude. Integers, not means: bit-
    * exact across engines, so the oracle compare is strict equality.
    *
    * The UDF returns a plain tuple of Options — a nested case class
    * here compiled to a struct accessor Janino rejects, silently
    * dropping the whole stage to interpreted mode (caught via the
    * PerceptualHash twin of this UDF; same fix applied there).
    * Tuple slots: (width, height, sum_r, sum_g, sum_b, sample_rate,
    * n_samples, sum_sq, peak).
    */
  private val decodeUdf = udf((format: String, content: Array[Byte]) =>
    try {
      format match {
        case "bmp" | "ppm" | "qoi" | "png" | "gif" =>
          val img = format match {
            case "bmp" => Codecs.decodeBmp(content)
            case "ppm" => Codecs.decodePpm(content)
            case "qoi" => Codecs.decodeQoi(content)
            // lossless ImageIO arms — exact sums like the native
            // codecs'; jpeg stays NULL (lossy, decoder-dependent)
            case _     => Codecs.decodeImageIO(content)
          }
          var sr = 0L; var sg = 0L; var sb = 0L
          var i = 0
          while (i < img.pixels.length) {
            val p = img.pixels(i)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            i += 1
          }
          (Some(img.width), Some(img.height),
            Some(sr), Some(sg), Some(sb),
            Option.empty[Int], Option.empty[Int],
            Option.empty[Long], Option.empty[Long])
        case "wav" =>
          val a = Codecs.decodeWav(content)
          var sq = 0L; var peak = 0L
          var i = 0
          while (i < a.samples.length) {
            val s = a.samples(i).toLong
            sq += s * s
            if (math.abs(s) > peak) peak = math.abs(s)
            i += 1
          }
          (Option.empty[Int], Option.empty[Int],
            Option.empty[Long], Option.empty[Long], Option.empty[Long],
            Some(a.sampleRate), Some(a.samples.length), Some(sq), Some(peak))
        case _ => null // undecodable format: NULL feature row
      }
    } catch { case scala.util.control.NonFatal(_) => null })

  /** Decode every payload on the executors and emit the exact-integer
    * feature columns (NULLs for the other modality / corrupt bytes).
    */
  def withMediaFeatures(media: DataFrame): DataFrame =
    media
      .withColumn("f", decodeUdf(col("meta.format"), col("content")))
      .select(col("media_id"), col("meta.format").as("format"),
        col("f._1").as("width"), col("f._2").as("height"),
        col("f._3").as("sum_r"), col("f._4").as("sum_g"),
        col("f._5").as("sum_b"),
        col("f._6").as("sample_rate"),
        col("f._7").as("n_samples"),
        col("f._8").as("sum_sq"), col("f._9").as("peak"))

  private val resizeUdf = udf((format: String, content: Array[Byte], w: Int, h: Int) =>
    try {
      format match {
        case "bmp" => Codecs.encodeBmp(Codecs.resizeNearest(Codecs.decodeBmp(content), w, h))
        case "ppm" => Codecs.encodePpm(Codecs.resizeNearest(Codecs.decodePpm(content), w, h))
        case "qoi" => Codecs.encodeQoi(Codecs.resizeNearest(Codecs.decodeQoi(content), w, h))
        case "png" => Codecs.encodePng(Codecs.resizeNearest(Codecs.decodeImageIO(content), w, h))
        // nearest only re-samples EXISTING pixels, so a ≤256-color GIF
        // stays ≤256 colors and the palette-exact re-encode never fails
        case "gif" => Codecs.encodeGif(Codecs.resizeNearest(Codecs.decodeImageIO(content), w, h))
        case _     => content // non-image payloads pass through
      }
    } catch { case scala.util.control.NonFatal(_) => null })

  private val ResizableFormats = Seq("bmp", "ppm", "qoi", "png", "gif")

  // plain tuples, not a nested case class: Janino rejects struct
  // accessors on locally-declared case classes and silently falls back
  // to interpreted evaluation (see the q_media_phash postmortem).
  // ONE decode per clip — the UDF resamples to every target rate from
  // the same decoded buffer, and the explode comes AFTER (also keeping
  // the expensive UDF out of the Project above Generate, the
  // ExtractGenerator trap PlanHygieneSpec pins)
  private val resampleAllUdf = udf((content: Array[Byte], rates: Seq[Int]) => {
    val a = Codecs.decodeWav(content)
    rates.map { dr =>
      val r = Codecs.resampleLinear(a, dr)
      var ss = 0L
      var pk = 0L
      r.samples.foreach { s =>
        ss += s.toLong * s
        pk = math.max(pk, math.abs(s.toLong))
      }
      (dr, a.samples.length / a.channels, r.samples.length / r.channels, ss, pk)
    }
  })

  /** Sample-rate conversion features over the WAV subset of a media
    * table: each clip decoded ONCE, resampled to every target rate
    * with [[Codecs.resampleLinear]]'s exact-integer interpolation,
    * reduced to (n_src, n_dst, sum_sq, peak) — integers the oracle
    * recomputes from the generating sample formulas through the
    * identical rational-position math. One corpus pass, no shuffle
    * until the caller aggregates or sorts.
    */
  def resampleAudioFeatures(media: DataFrame, rates: Seq[Int]): DataFrame =
    media.filter(col("meta.format") === "wav")
      .select(col("media_id"),
        resampleAllUdf(col("content"), typedLit(rates)).as("fs"))
      .select(col("media_id"), explode(col("fs")).as("f"))
      .select(col("media_id"), col("f._1").as("dst_rate"),
        col("f._2").cast("long").as("n_src"),
        col("f._3").cast("long").as("n_dst"),
        col("f._4").as("sum_sq"), col("f._5").as("peak"))

  /** Real resize: decode -> nearest-neighbor resample -> re-encode in
    * the same container format, updating meta dims to match.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame =
    media
      .withColumn("content",
        resizeUdf(col("meta.format"), col("content"), lit(w), lit(h)))
      .withColumn("meta",
        struct(col("meta.format").as("format"),
          when(col("meta.format").isin(ResizableFormats: _*), lit(w))
            .otherwise(col("meta.width")).as("width"),
          when(col("meta.format").isin(ResizableFormats: _*), lit(h))
            .otherwise(col("meta.height")).as("height"),
          col("meta.n_frames").as("n_frames")))
}
