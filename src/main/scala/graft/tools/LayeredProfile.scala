package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-level profiler for the layered-ANN crawl twin (the bench's
  * most expensive entry): inlines [[graft.streaming.StreamBench
  * .benchSelfLayered]]'s per-batch body as a plain loop and times each
  * component — descent, layer-0 fold, upper folds, checkpoints — so
  * the twin's cost lands on named stages instead of one opaque
  * avg_batch_ms.
  */
object LayeredProfile {
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
    val tasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    def time[T](name: String)(f: => T): T = {
      val (j0, s0, k0) = (jobs.get, stages.get, tasks.get)
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s  jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d tasks=${tasks.get - k0}%4d")
      r
    }
    var emb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    var lg = time("buildLayered (untimed in twin)") {
      val g = graft.ops.KnnGraph.buildLayered(emb,
        graft.ops.KnnGraph.build(emb, k = 5, 16),
        k = 5, nCentroids = 16, entryStep = 5L, nLayers = 2)
      g.copy(layers = g.layers.map(_.localCheckpoint()))
    }
    val n = emb.count()
    val batches = 4
    val per = (n / batches).toInt
    (0 until batches).foreach { i =>
      println(s"--- batch $i ---")
      val batch = time("  stage batch (ckpt)") {
        graft.Tables.embeddings(spark, sfDir)
          .orderBy(col("vec_id")).limit((i + 1) * per)
          .filter(col("vec_id") >= i * per)
          .select((col("vec_id") + lit(1000000000000L)).as("vec_id"),
            col("embedding")).localCheckpoint()
      }
      time("  beamSearchLayered.count") {
        graft.ops.KnnGraph.beamSearchLayered(emb, lg,
          batch.select(col("vec_id").as("query_id"), col("embedding")),
          k = 5, beam = 16, rounds = 3).count()
      }
      val ext = time("  extendLayered (lazy)") {
        graft.ops.KnnGraph.extendLayered(emb, batch, lg)
      }
      lg = time("  layer checkpoints") {
        ext.copy(layers = ext.layers.map(_.localCheckpoint()))
      }
      emb = time("  emb union ckpt") {
        emb.unionByName(batch).localCheckpoint()
      }
    }
    spark.stop()
  }
}
