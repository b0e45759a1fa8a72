package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support (north-star operator E4, SURVEY.md §2.9):
  * image/audio/video payloads ride as opaque `BinaryType` columns with
  * a typed metadata struct; decode / feature-extract / resize /
  * frame-sample are per-partition transforms over the binary column.
  *
  * The Spark-side plumbing here — schema, partitioning, batch shape,
  * null handling — is real and tested. The actual codec step is a
  * clearly-marked STUB (this container has no image/audio libraries):
  * `decodeStub` derives deterministic fake features from the bytes so
  * tests are stable; production swaps `decodeStub` for a real codec
  * with the same signature.
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

  /** STUB decode: deterministic per-row "features" from the raw bytes
    * (length, xxhash64, a fake 8-bin byte histogram). Real
    * implementation would decode pixels/samples here; everything
    * around it (schema, codegen-friendly expressions, partition
    * independence) is the production shape.
    */
  def withDecodedFeatures(media: DataFrame): DataFrame =
    media
      .withColumn("byte_len", length(col("content")).cast(LongType))
      .withColumn("content_hash", xxhash64(col("content")))
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
    * the pixel work belongs to the decode stub's production swap-in).
    */
  def resizeMeta(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      struct(col("meta.format").as("format"),
        lit(w).as("width"), lit(h).as("height"),
        col("meta.n_frames").as("n_frames")))
}
