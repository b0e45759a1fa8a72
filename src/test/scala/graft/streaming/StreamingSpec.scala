package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** Structured-Streaming twin of the ingest slice (SURVEY §7 step 4). */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def eventsDir = {
    // copy sf0.001 events into a dir (streaming sources read directories)
    val dir = java.nio.file.Files.createTempDirectory("stream_events").toString
    Tables.events(spark, SparkTestSession.Sf).write.mode("overwrite")
      .parquet(dir)
    dir
  }

  test("streaming dedup passes every unique event exactly once") {
    val dir = java.nio.file.Files.createTempDirectory("se").toString
    // write events twice -> duplicates across files
    val ev = Tables.events(spark, SparkTestSession.Sf).limit(200).cache()
    ev.write.mode("overwrite").parquet(dir)
    ev.write.mode("append").parquet(dir)
    val raw = spark.readStream.schema(
      org.apache.spark.sql.types.StructType(
        StreamingIngest.EventsSchema.map(f =>
          if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.TimestampType)
          else f)))
      .parquet(dir)
    val deduped = StreamingIngest.dedupedStream(raw)
    val out = StreamingIngest.runToMemory(spark, deduped, "dedup_out")
    assert(out.count() == 200)
    ev.unpersist()
  }

  test("windowed counts aggregate by event-time hour") {
    val dir = eventsDir
    val raw = spark.readStream.schema(
      org.apache.spark.sql.types.StructType(
        StreamingIngest.EventsSchema.map(f =>
          if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.TimestampType)
          else f)))
      .parquet(dir)
    val agg = StreamingIngest.windowedCounts(raw)
    val out = StreamingIngest.runToMemory(spark, agg, "win_out",
      outputMode = "append")
    // append mode emits only closed windows; with watermark 1h over a
    // 30-day batch, all but the last window close
    assert(out.count() > 0)
    val total = out.agg(sum("n")).collect()(0).getLong(0)
    assert(total > 0 && total <= 1000)
  }

  test("expression ops (scrub/token-count/quality) run unchanged on a stream") {
    // the round-4 corpus ops are pure expressions, so the SAME code
    // runs batch and streaming — results must be bit-equal
    import graft.ops.{Redact, TextStats}
    val batch = Tables.documents(spark, SparkTestSession.Sf)
    val dir = java.nio.file.Files.createTempDirectory("stream_docs").toString
    batch.write.mode("overwrite").parquet(dir)
    def score(df: org.apache.spark.sql.DataFrame) = df.select(
      col("doc_id"),
      Redact.redactPii(col("text")).as("clean"),
      TextStats.tokenCount(col("text")).as("n_tok"),
      TextStats.qualityScore(col("text")).as("quality"))
    val streamed = score(
      spark.readStream.schema(batch.schema).parquet(dir))
    val out = StreamingIngest.runToMemory(spark, streamed, "expr_out")
    assert(out.orderBy("doc_id").collect().toSeq ==
      score(batch).orderBy("doc_id").collect().toSeq)
  }

  test("stream-stream correlation joins request to response within the bound") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val reqS = MemoryStream[(Long, java.sql.Timestamp)]
    val respS = MemoryStream[(Long, java.sql.Timestamp)]
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // requests at 10:00/10:01/10:02; responses: id 1 in-bound (+5 min),
    // id 2 LATE (+2 h, outside the 1 h bound), id 3 never answered
    reqS.addData((1L, ts(0)), (2L, ts(1)), (3L, ts(2)))
    respS.addData((1L, ts(5)),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 12:01:00")))
    val joined = StreamingIngest.correlatedStream(
      reqS.toDS().toDF("custom_id", "ts"),
      respS.toDS().toDF("custom_id", "r_ts"),
      "custom_id")
    val out = StreamingIngest.runToMemory(spark, joined, "corr_out")
    val ids = out.select("custom_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L), s"only the in-bound response should match: $ids")
  }

  test("stream-static join enriches every event from the broadcast dim") {
    val dir = eventsDir
    val raw = spark.readStream.schema(
      org.apache.spark.sql.types.StructType(
        StreamingIngest.EventsSchema.map(f =>
          if (f.name == "ts") f.copy(dataType = org.apache.spark.sql.types.TimestampType)
          else f)))
      .parquet(dir)
    import spark.implicits._
    val dim = Seq(("click", 1.0), ("view", 0.1), ("purchase", 10.0))
      .toDF("event_type", "weight")
    val enriched = StreamingIngest.enrichedStream(raw, dim, "event_type")
      .select(col("event_id"), col("event_type"), col("weight"))
    val out = StreamingIngest.runToMemory(spark, enriched, "enrich_out")
    val n = Tables.events(spark, SparkTestSession.Sf).count()
    assert(out.count() == n) // left join: no event dropped
    // every known type got its weight; unknown types stay null
    val matched = out.filter(col("weight").isNotNull).count()
    val known = Tables.events(spark, SparkTestSession.Sf)
      .filter(col("event_type").isin("click", "view", "purchase")).count()
    assert(matched == known)
  }
}
