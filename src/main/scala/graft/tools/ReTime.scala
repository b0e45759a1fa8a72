package graft.tools

import org.apache.spark.sql.SparkSession

/** Isolated re-measure of named bench queries — the adjudication half
  * of the bench protocol: when a committed record shows an untouched
  * query moving past the compare gate, the question is always "plan
  * regression or session turbulence?", and the answer is a clean-JVM
  * median over just that query, free of the full run's cache/GC wake.
  *
  * Usage: runMain graft.tools.ReTime q_a q_b ...
  *        (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_RETIME_RUNS)
  *
  * Prints one line per query: all observations + the median, same
  * to-completion row-drain timing as [[graft.Bench]] (toRdd count).
  * Each query gets one UNTIMED throwaway drive first (codegen/JIT +
  * any session artifact build), so the observations measure the
  * settled plan — the same warm-measurement convention as the
  * median-of-3 record.
  */
object ReTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_RETIME_RUNS", "5").toInt)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("events", "documents", "embeddings", "lineitem", "orders").foreach { t =>
      try {
        val df = if (t == "events") graft.Tables.events(spark, sfDir)
                 else graft.Tables.load(spark, sfDir, t)
        df.count()
      } catch { case _: Throwable => () }
    }
    val queries = graft.SparkEntry.queries
    val names = args.toSeq
    val unknown = names.filterNot(queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    names.foreach { name =>
      val fn = queries(name)
      def drain(): Unit =
        fn(spark, sfDir).queryExecution.toRdd.mapPartitions { it =>
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }
          Iterator.single(n)
        }.fold(0L)(_ + _)
      drain() // untimed: codegen/JIT + session artifact builds
      val obs = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        drain()
        (System.nanoTime() - t0) / 1e9
      }
      val med = obs.sorted.apply(obs.size / 2)
      println(f"RETIME $name%-28s median=$med%8.3f  runs=[${
        obs.map(o => f"$o%.3f").mkString(", ")}]")
    }
    spark.stop()
  }
}
