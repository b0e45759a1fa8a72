package graft
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main. Prints ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Methodology (round-2 fix for the 1.9× run-to-run swing in BENCH_r01):
  *  - median of 3 timed executions per query (after a global warmup
  *    pass), so a single GC pause / JIT deopt cannot define a number;
  *  - the action fully consumes the physical plan's rows via
  *    `queryExecution.toRdd` (count() let Catalyst prune unreferenced
  *    projections, so projection-only queries partially measured
  *    nothing);
  *  - per-query try/catch so one failure doesn't zero the report.
  */
object Bench {

  /** Execute the plan and consume every row without deserializing to
    * external Row objects (measures the engine, not the collect path).
    */
  private def exhaust(df: DataFrame): Long =
    df.queryExecution.toRdd
      .mapPartitions { it =>
        var n = 0L
        while (it.hasNext) { it.next(); n += 1 }
        Iterator.single(n)
      }
      .fold(0L)(_ + _)

  private def timeOnce(df: => DataFrame): Double = {
    val t0 = System.nanoTime()
    try exhaust(df) catch { case _: Throwable => -1L }
    (System.nanoTime() - t0) / 1e9
  }

  private def median3(run: => Double): Double = {
    val xs = Seq(run, run, run).sorted
    xs(1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // warmup: JVM/codegen/parquet-footer costs must not be charged to
    // whichever query happens to run first
    Seq("events", "documents", "embeddings", "lineitem", "orders")
      .foreach(t => try Tables.load(spark, sfDir, t).count()
               catch { case _: Throwable => () })
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try timeOnce(fn(spark, sfDir)) catch { case _: Throwable => () }
    }
    val results = ordered.map { case (name, fn) =>
      name -> median3(timeOnce(fn(spark, sfDir)))
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
