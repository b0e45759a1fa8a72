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
}
