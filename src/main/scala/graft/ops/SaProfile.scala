package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiler for the suffix-array family (q_sa_shard_scrub
  * is the bench's most expensive batch query): times each phase of the
  * sharded mine → completion → scrub pipeline separately, with job and
  * stage counts, so the query's cost lands on named phases instead of
  * one opaque total. Run: runMain graft.ops.SaProfile
  */
object SaProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    def time(name: String)(f: => Long): Unit = {
      val (j0, s0) = (jobs.get(), stages.get())
      val t0 = System.nanoTime()
      val n = f
      // capture elapsed BEFORE the listener drain — the sleep is not
      // part of the phase (it inflated every reported phase by a
      // fixed ~0.2 s, misreporting small phases; r15 advisor)
      val elapsed = (System.nanoTime() - t0) / 1e9
      // listener events are async; give the queue a beat
      Thread.sleep(200)
      println(f"$name%-34s $elapsed%8.2f s" +
        f"  jobs=${jobs.get() - j0}%-4d stages=${stages.get() - s0}%-4d rows=$n")
    }
    def drain(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); -1L
    }

    val docs = graft.Tables.documents(spark, sfDir)
    val src = docs.select(col("doc_id"), col("text").as("t"))
    val minLen = 32
    val nShards = 3
    time("warmup corpus count")(docs.count())

    // --- q_sa_shard_scrub decomposition -----------------------------
    val shardMembers = (0 until nShards).map { s =>
      var out: DataFrame = null
      time(s"shard $s repeatGroups") {
        out = SuffixArray.repeatGroups(
          src.filter(pmod(col("doc_id"), lit(nShards.toLong)) === s),
          col("doc_id"), col("t"), minLen)
          .localCheckpoint(true,
            org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        out.count()
      }
      out
    }
    var fps: DataFrame = null
    time("phase B: gramFps + pin") {
      fps = SuffixArray.gramFps(src, minLen)
        .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      fps.count()
    }
    var candPos: DataFrame = null
    time("phase B: spanning semi-join") {
      val spanning = fps.groupBy("h")
        .agg(countDistinct(col("shard")).as("n_shards"))
        .filter(col("n_shards") >= 2)
        .select("h")
      candPos = fps.join(spanning, Seq("h"), "left_semi")
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      candPos.count()
    }
    time("phase B: literalGrams + verify") {
      val grams = SuffixArray.literalGrams(candPos, src, minLen)
        .withColumn("shard", pmod(col("doc_id"), lit(nShards.toLong)))
      drain(grams)
    }
    // the full pipeline end-to-end for reference, then the scrub tail
    var members: DataFrame = null
    time("shardedRepeatGroups FULL (P=2)") {
      members = SuffixArray.shardedRepeatGroups(docs, col("doc_id"),
        col("text"), minLen, nShards, maxConcurrentShards = 2)
        .localCheckpoint(true,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      members.count()
    }
    time("scrubFromMembers tail")(
      drain(SuffixArray.scrubFromMembers(docs, col("doc_id"), col("text"),
        minLen, members)))
    time("q_sa_shard_scrub END-TO-END")(
      drain(SuffixArray.shardedScrub(docs, col("doc_id"), col("text"),
        minLen, nShards, maxConcurrentShards = 2)))

    // --- q_sa_ranks decomposition ------------------------------------
    time("q_sa_ranks END-TO-END")(
      drain(SuffixArray.suffixRanks(docs, col("doc_id"), col("text"),
        maxDepth = 64)))

    // --- q_sa_repeats / q_sa_scrub (shared inventory) ----------------
    time("repeatGroups GLOBAL (unsharded)")(
      drain(SuffixArray.repeatGroups(docs, col("doc_id"), col("text"),
        minLen)))
    spark.stop()
  }
}
