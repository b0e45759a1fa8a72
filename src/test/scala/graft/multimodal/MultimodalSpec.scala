package graft.multimodal

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** E4: binary-column plumbing (the decode itself is a marked stub). */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val media =
    Multimodal.syntheticMedia(Tables.documents(spark, SparkTestSession.Sf))

  test("synthetic media matches the declared schema") {
    val m = media.schema
    assert(m("content").dataType.typeName == "binary")
    assert(m("meta").dataType.typeName == "struct")
  }
  test("stub decode: features are deterministic and byte-accurate") {
    val a = Multimodal.withDecodedFeatures(media)
      .select("media_id", "byte_len", "content_hash").collect()
    val b = Multimodal.withDecodedFeatures(media)
      .select("media_id", "byte_len", "content_hash").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    // byte_len equals the UTF-8 length of the source text
    val doc = Tables.documents(spark, SparkTestSession.Sf)
      .select(col("doc_id"), length(encode(col("text"), "UTF-8")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.forall(r => doc(r.getLong(0)) == r.getLong(1)))
  }
  test("frame sampling keeps every Nth index within n_frames") {
    val s = Multimodal.sampleFrameIndices(media, 5)
      .select(col("meta.n_frames"), col("sampled_frames")).collect()
    s.foreach { r =>
      val n = r.getInt(0)
      val idx = r.getSeq[Int](1)
      assert(idx.forall(i => i >= 0 && i < n && i % 5 == 0))
    }
  }
  test("resize rewrites meta dims only") {
    val r = Multimodal.resizeMeta(media, 224, 224)
      .select(col("meta.width"), col("meta.height")).distinct().collect()
    assert(r.length == 1 && r(0).getInt(0) == 224 && r(0).getInt(1) == 224)
  }

  // ---- real codec path: bytes -> pixels/samples through Spark ----------

  private lazy val real =
    Multimodal.realMedia(Tables.documents(spark, SparkTestSession.Sf))

  test("real media decodes through Spark: pixel sums match the generators") {
    val rows = Multimodal.withMediaFeatures(real)
      .orderBy(col("media_id")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(r.fieldIndex("media_id"))
      r.getString(r.fieldIndex("format")) match {
        case "bmp" | "ppm" | "qoi" =>
          val img = Multimodal.genImage(id)
          val (er, eg, eb) = img.pixels.foldLeft((0L, 0L, 0L)) {
            case ((a, b, c), p) =>
              (a + ((p >> 16) & 0xff), b + ((p >> 8) & 0xff), c + (p & 0xff))
          }
          assert(r.getInt(r.fieldIndex("width")) == img.width)
          assert(r.getInt(r.fieldIndex("height")) == img.height)
          assert(r.getLong(r.fieldIndex("sum_r")) == er, s"id=$id sum_r")
          assert(r.getLong(r.fieldIndex("sum_g")) == eg, s"id=$id sum_g")
          assert(r.getLong(r.fieldIndex("sum_b")) == eb, s"id=$id sum_b")
          assert(r.isNullAt(r.fieldIndex("n_samples")))
        case "wav" =>
          val aud = Multimodal.genAudio(id)
          val esq = aud.samples.foldLeft(0L)((a, s) => a + s.toLong * s)
          assert(r.getInt(r.fieldIndex("sample_rate")) == 8000)
          assert(r.getInt(r.fieldIndex("n_samples")) == aud.samples.length)
          assert(r.getLong(r.fieldIndex("sum_sq")) == esq, s"id=$id sum_sq")
          assert(r.isNullAt(r.fieldIndex("sum_r")))
        case f => fail(s"unexpected format $f")
      }
    }
  }

  test("corrupt payloads yield NULL feature rows, not failures") {
    val corrupt = real.withColumn("content",
      expr("substring(content, 1, 10)")) // truncate every payload
    val rows = Multimodal.withMediaFeatures(corrupt).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r =>
      r.isNullAt(r.fieldIndex("sum_r")) && r.isNullAt(r.fieldIndex("sum_sq"))))
  }

  test("real resize re-encodes image payloads at the target dims") {
    val resized = Multimodal.resizeImages(real, 4, 3)
    val rows = Multimodal.withMediaFeatures(resized)
      .where(col("format").isin("bmp", "ppm", "qoi")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(r.fieldIndex("width")) == 4)
      assert(r.getInt(r.fieldIndex("height")) == 3)
    }
    // audio passes through untouched
    val wav = Multimodal.withMediaFeatures(resized)
      .where(col("format") === "wav").collect()
    assert(wav.forall(!_.isNullAt(wav.head.fieldIndex("n_samples"))))
  }

  test("resize: png/gif arms resample the same pixels as the native sibling") {
    import spark.implicits._
    val docs = Tables.documents(spark, SparkTestSession.Sf).limit(24)
    val twins = Multimodal.pngMedia(docs).unionByName(Multimodal.gifMedia(docs))
    val resized = Multimodal.resizeImages(twins, 6, 5)
    // dims rewritten, payload re-encoded in the SAME container
    val metas = resized.select(col("meta.format"), col("meta.width"),
      col("meta.height")).as[(String, Int, Int)].collect()
    assert(metas.nonEmpty && metas.forall(m => m._2 == 6 && m._3 == 5))
    assert(metas.map(_._1).toSet == Set("png", "gif"))
    // the resized twins hash exactly like the resized generator image
    val hashes = PerceptualHash.imageHashes(resized)
      .select("media_id", "ahash").as[(Long, Long)].collect()
    assert(hashes.length == metas.length) // every payload still decodes
    hashes.foreach { case (id, a) =>
      val src = if (id >= Multimodal.GifIdOffset) id - Multimodal.GifIdOffset
                else id - Multimodal.PngIdOffset
      val want = PerceptualHash.ahash64(
        Codecs.resizeNearest(Multimodal.genImage(src), 6, 5))
      assert(a == want, s"resized twin drifted for $id")
    }
  }
}
