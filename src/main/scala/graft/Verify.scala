package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * Round-3 hardening (CORRECTNESS_r02 came back `{}` — the driver's
  * round-2 verify run produced nothing usable, losing the whole
  * round's correctness evidence):
  *  - `oracle_sql.json` is written FIRST, so even a run killed mid-way
  *    leaves the driver the SQL plus every parquet completed so far —
  *    partial correctness instead of an empty report;
  *  - queries run CONCURRENTLY (fixed pool; each writes its own dir,
  *    no shared state — the one session-conf write in `Tables.events`
  *    is idempotent), cutting wall-clock ~4x so the driver's outer
  *    timeout is never in play;
  *  - a global deadline (SPARK_GRAFT_VERIFY_DEADLINE, default 420s)
  *    stops SUBMITTING new queries when nearly spent — already-running
  *    ones finish, the process exits cleanly;
  *  - `halt(0)` after the summary line: no shutdown-hook noise, no
  *    chance of a hang in executor teardown eating the remaining budget.
  */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val deadlineMs =
      sys.env.getOrElse("SPARK_GRAFT_VERIFY_DEADLINE", "420").toLong * 1000L
    val t0 = System.currentTimeMillis()
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()

    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Full declared-query manifest, written up-front like the oracle
    // SQL: the checker diffs output dirs against THIS list so a query
    // that errors out can never silently vanish from the correctness
    // report (round 5 lost two queries that way).
    Files.writeString(Paths.get(s"$outDir/declared_queries.json"),
      SparkEntry.queries.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))

    val pool = java.util.concurrent.Executors.newFixedThreadPool(6)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    // Local-iteration subset: SPARK_GRAFT_VERIFY_ONLY=q_a,q_b runs just
    // those queries (pairs with tools/run_subset.py on the check side).
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val futures = selected.map { case (name, fn) =>
      scala.concurrent.Future {
        if (System.currentTimeMillis() - t0 < deadlineMs) {
          try {
            fn(spark, sfDir).coalesce(1).write.mode("overwrite")
              .parquet(s"$outDir/$name")
            done.incrementAndGet()
          } catch { case e: Throwable =>
            System.err.println(s"[verify] $name failed: ${e.getMessage}")
          }
        } else System.err.println(s"[verify] $name skipped: deadline")
      }
    }
    import scala.concurrent.duration._
    try scala.concurrent.Await.ready(
      scala.concurrent.Future.sequence(futures), (deadlineMs + 60000L).millis)
    catch { case _: Throwable => () }
    // A write in flight when the Await above gives up leaves a
    // partially-written dir (_temporary, no _SUCCESS) that the driver's
    // DuckDB compare would read as an empty/truncated RESULT rather
    // than a skipped query. Quiesce FIRST — cancel every running job
    // and give the tasks a moment to die — so no writer can drop a new
    // part-file between the directory walk and the delete; then remove
    // any query dir without its commit marker, keeping "killed
    // mid-write" and "genuinely empty" distinguishable.
    spark.sparkContext.cancelAllJobs()
    Thread.sleep(500)
    SparkEntry.queries.keys.foreach { name =>
      val dir = Paths.get(s"$outDir/$name")
      if (Files.isDirectory(dir) && !Files.exists(dir.resolve("_SUCCESS"))) {
        System.err.println(s"[verify] $name incomplete (no _SUCCESS): removing")
        try {
          val walk = Files.walk(dir) // close: walk holds directory handles
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.deleteIfExists(p))
          finally walk.close()
        } catch { case _: Throwable => () }
      }
    }
    println(s"[verify] ${done.get()}/${SparkEntry.queries.size} queries dumped to $outDir")
    System.out.flush()
    Runtime.getRuntime.halt(0)
  }
}
