package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Scratch harness: run one named query N times in a single JVM and
  * print each timing — for chasing run-to-run variance the bench's
  * median hides.
  */
object QRepro {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_json_repair")
    val n = args.lift(1).map(_.toInt).getOrElse(6)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(name)
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val rows = df.queryExecution.toRdd.mapPartitions { it =>
        var c = 0L; while (it.hasNext) { it.next(); c += 1 }; Iterator.single(c)
      }.fold(0L)(_ + _)
      println(f"run $i%2d: ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$rows")
    }
    spark.stop()
  }
}
