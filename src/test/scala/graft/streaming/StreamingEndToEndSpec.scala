package graft.streaming

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}
import graft.ops.{Payload, Watermark}

/** The reference's incremental loop (fetch → dedup → payload → JSONL
  * sink → advance watermark) as ONE Structured Streaming pipeline:
  * `readStream` replaces the cron re-scan, `dropDuplicatesWithinWatermark`
  * replaces the in-memory dedup set, and `foreachBatch` gives the
  * micro-batch a transactional hook for the JSONL sink + watermark
  * store — exactly-once per micro-batch via the checkpoint, which is
  * what the advisory JSON watermark file could never guarantee.
  */
class StreamingEndToEndSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("stream -> dedup -> payload -> foreachBatch JSONL sink advances the watermark") {
    val srcDir = Files.createTempDirectory("e2e_events").toString
    val outDir = Files.createTempDirectory("e2e_out").toString
    val wmPath = s"$outDir/watermark.json"
    // duplicate input files: the stream must emit each event once
    val ev = Tables.events(spark, SparkTestSession.Sf).limit(300).cache()
    ev.write.mode("overwrite").parquet(srcDir)
    ev.write.mode("append").parquet(srcDir)

    val raw = spark.readStream.schema(
      org.apache.spark.sql.types.StructType(
        StreamingIngest.EventsSchema.map(f =>
          if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.TimestampType)
          else f)))
      .parquet(srcDir)

    val deduped = StreamingIngest.dedupedStream(raw)

    @volatile var batches = 0
    val q = deduped.writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        // dense ids exist on events, so numbering is windowless
        val requests = Payload.requestsRanked(
          batch.withColumn("text", coalesce(col("props"), lit(""))),
          col("text"), Some(col("event_id")), col("event_id") + 1)
        val written = Payload.writeJsonl(requests, s"$outDir/batch_$id.jsonl")
        val maxTs = batch.agg(max(unix_timestamp(col("ts")))).collect()(0)
        if (!maxTs.isNullAt(0))
          Watermark.save(wmPath, Map("events" -> maxTs.getLong(0)))
        if (written > 0) batches += 1
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    assert(batches > 0, "no micro-batch produced requests")
    // every unique event written exactly once across all batch files
    // writeJsonl emits a Spark text directory (part files) per batch
    val lines = Files.walk(Paths.get(outDir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .toSeq
    assert(lines.size == 300, s"expected 300 deduped requests, got ${lines.size}")
    assert(lines.forall(_.contains("\"custom_id\"")))
    // watermark advanced to the max event time
    val expected = ev.agg(max(unix_timestamp(col("ts")))).collect()(0).getLong(0)
    assert(Watermark.load(wmPath).get("events").contains(expected))
    ev.unpersist()
  }
}
