package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage-level profiler for the standing repeat-inventory crawl twin
  * (s_stream_substr): inlines [[SuffixArray.extendRepeatGroups]]'s
  * per-batch body as a plain loop over the same reversed-replay
  * batches the bench twin uses, timing each phase with job counts.
  * Run: runMain graft.ops.SubstrProfile
  */
object SubstrProfile {
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
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def time(name: String)(f: => Unit): Unit = {
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      f
      // elapsed captured BEFORE the listener drain (the sleep is not
      // part of the phase; r15 advisor)
      val elapsed = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      println(f"$name%-38s $elapsed%8.2f s  jobs=${jobs.get() - j0}")
    }

    val minLen = 32
    val docs0 = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).localCheckpoint()
    var corpus = docs0
    var model: SuffixArray.RepeatInventory = null
    time("train standing inventory (untimed)") {
      model = SuffixArray.trainRepeatGroups(docs0, col("doc_id"),
        col("text"), minLen)
    }
    // 4 batches of 1/4 of the corpus each, reversed text, shifted ids
    // (the bench twin's reversed-replay steady state)
    (0 until 4).foreach { i =>
      val b = docs0
        .filter(pmod(col("doc_id"), lit(4L)) === i)
        .select((col("doc_id") + lit(100000000L * (i + 1))).as("doc_id"),
          reverse(col("text")).as("text"))
        .localCheckpoint()
      println(s"--- batch $i")
      // the guard rides the prefilter + verify scans now (and the
      // verify src below) — no separate phase
      val oldSrc = Guards.disjointIdsRide(
        corpus.select(col("doc_id"), col("text").as("t")),
        "doc_id", "doc_id", b.select(col("doc_id")), "profile")
      val newSrc = b.select(col("doc_id"), col("text").as("t"))
      var fpsNew: DataFrame = null
      var nFpsNew = 0L
      time("  gramFps(batch) lazy pin + sizing count") {
        fpsNew = SuffixArray.gramFps(newSrc, minLen)
          .localCheckpoint(false, StorageLevel.MEMORY_AND_DISK_SER)
        nFpsNew = fpsNew.count()
      }
      var cand: DataFrame = null
      time("  extendCandidates (bloom+window, guarded) + pin") {
        cand = SuffixArray.extendCandidates(
            Guards.disjointIdsRide(model.fps, "doc_id", "h",
              b.select(col("doc_id")), "profile"), fpsNew, nFpsNew)
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      }
      var membersX: DataFrame = null
      time("  literal verify + membersX pin") {
        val sideOf = cand
          .groupBy(col("doc_id")).agg(max(col("is_new")).as("is_new"))
        val grams = SuffixArray.literalGrams(
            cand.select(col("doc_id"), col("pos")),
            oldSrc.unionByName(newSrc), minLen)
          .join(sideOf, Seq("doc_id"))
        val w = org.apache.spark.sql.expressions.Window.partitionBy("gram")
        membersX = grams
          .withColumn("n_occ", count(lit(1)).over(w))
          .withColumn("n_docs",
            max(dense_rank().over(org.apache.spark.sql.expressions.Window
              .partitionBy("gram").orderBy("doc_id"))).over(w))
          .withColumn("gkey",
            min(col("doc_id") * lit(4294967296L) + col("pos")).over(w))
          .withColumn("has_new", max(col("is_new")).over(w))
          .withColumn("has_old", max(!col("is_new")).over(w))
          .filter(col("n_occ") >= 2 && col("n_docs") >= 2 &&
            col("has_new") && col("has_old"))
          .select(col("doc_id"), col("pos"),
            expr("gkey div 4294967296").as("grp_did"),
            expr("gkey % 4294967296").as("grp_pos"))
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      }
      time("  batch mine membersFromFps (lazy, in union)") {
        ()
      }
      var members: DataFrame = null
      time("  3-way union + anti-joins + members pin") {
        val membersNew = SuffixArray.membersFromFps(fpsNew, newSrc, minLen)
        val xProbe = broadcast(membersX.select(col("doc_id"), col("pos")))
        members = membersX
          .unionByName(model.members.join(xProbe,
            Seq("doc_id", "pos"), "left_anti"))
          .unionByName(membersNew.join(xProbe,
            Seq("doc_id", "pos"), "left_anti"))
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
      }
      time("  batch-member report (left_semi count)") {
        members.join(b.select(col("doc_id")), Seq("doc_id"), "left_semi")
          .count()
        ()
      }
      model = SuffixArray.RepeatInventory(members,
        model.fps.unionByName(fpsNew), minLen)
      corpus = corpus.unionByName(b)
    }
    spark.stop()
  }
}
