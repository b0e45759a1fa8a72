package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named declared queries to files —
  * the plan evidence the optimization rounds commit next to their
  * before/after numbers (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <suffix> q_a q_b ...
  *        (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  *
  * Writes `<outDir>/<query>_<suffix>.txt`. The dump is the ANALYZED
  * plan's formatted physical explain (pre-execution, AQE initial plan
  * — deterministic, diffable); queries that build session artifacts
  * build them as a side effect of planning, same as the bench.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <suffix> <query>...")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    val queries = graft.SparkEntry.queries
    val unknown = names.filterNot(queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explain] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
