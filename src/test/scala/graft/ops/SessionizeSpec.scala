package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("batch: gap > threshold starts a new session per user") {
    val e = Seq(
      (1L, 100L, 1L), (1L, 200L, 2L), (1L, 5000L, 3L),  // user 1: 2 sessions
      (2L, 100L, 4L))                                     // user 2: 1 session
      .toDF("user_id", "ts_epoch", "event_id")
    val got = Sessionize.sessions(e, col("user_id"), col("ts_epoch"), 3600L,
      col("event_id"))
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("streaming: sessions close on gap and emit counts") {
    import Sessionize._
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    Seq(Ev(1L, 100L, 1L), Ev(1L, 200L, 2L), Ev(1L, 9000L, 3L),
      Ev(2L, 50L, 4L), Ev(2L, 99000L, 5L))
      .toDF().write.mode("overwrite").parquet(dir)
    val src = spark.readStream
      .schema("user_id LONG, ts_epoch LONG, event_id LONG")
      .parquet(dir)
      .withColumn("ts", timestamp_seconds(col("ts_epoch")))
      .withWatermark("ts", "0 seconds")
      .as[Ev]
    val q = streamingSessions(src, gapSeconds = 3600L)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("sess_out")
      .select("user_id", "session_start", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    // closed sessions: user1 (100-200, 2 events) closed by the 9000 gap;
    // user2 (50, 1 event) closed by the 99000 gap
    assert(out.contains((1L, 100L, 2L)))
    assert(out.contains((2L, 50L, 1L)))
  }

  test("streaming: a late cross-batch event extends the span, never regresses it") {
    import Sessionize._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[Ev]
    val stream = src.toDS()
      .withColumn("ts", timestamp_seconds(col("ts_epoch")))
      .withWatermark("ts", "1 hour")
      .as[Ev]
    val q = streamingSessions(stream, gapSeconds = 3600L)
      .writeStream.format("memory").queryName("sess_late")
      .outputMode("append").start()
    try {
      src.addData(Ev(1L, 1000L, 1L))          // batch 1: state (1000,1000)
      q.processAllAvailable()
      src.addData(Ev(1L, 500L, 2L))           // batch 2: LATE event
      q.processAllAvailable()
      src.addData(Ev(1L, 999999L, 3L))        // far future: closes session
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sess_late")
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    // the closed session must span [500, 1000] with 2 events — the old
    // code emitted end=500 < start=1000
    assert(out.contains((1L, 500L, 1000L, 2L)), out.toString)
  }
}
