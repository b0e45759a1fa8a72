package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SQL registration of the native kernels + the DSv2 item-store
  * source (SRC1 semantics: paging, pruning, limited pushdown,
  * case-insensitive fields, malformed-line skip).
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kernels callable from SQL after registration") {
    GraftExtensions.register(spark)
    Seq(("a b c d", Array(1.0f, 2.0f), Array(3.0f, 4.0f)))
      .toDF("t", "x", "y").createOrReplaceTempView("ext_in")
    val row = spark.sql(
      """SELECT simhash64(split(t, ' ')) AS sh,
        |       size(shingles(t, 2)) AS nsh,
        |       dot_double(x, y) AS d,
        |       size(minhash_sig(shingles(t, 2), 8, 42)) AS k
        |FROM ext_in""".stripMargin).collect()(0)
    assert(row.getLong(0) != 0L)
    assert(row.getInt(1) == 3)
    assert(row.getDouble(2) == 11.0)
    assert(row.getInt(3) == 8)
    // portable content fingerprint: 'ab' -> ((0*31+97)%P*31+98)%P = 3105
    val ph = spark.sql(
      "SELECT poly_hash(encode('ab', 'UTF-8')) AS h").collect()(0).getLong(0)
    assert(ph == 97L * 31 + 98)
  }

  test("optimizer rule fuses size(regexp_extract_all) into RegexpCount") {
    // SparkTestSession sets spark.sql.extensions=graft.GraftExtensions,
    // so the injected rule must fire on plain DataFrame code (over a
    // parquet source — a purely-literal frame constant-folds to a
    // LocalRelation before the plan is observable)
    val docs = Tables.documents(spark, SparkTestSession.Sf)
    val df = docs.select(col("doc_id"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))).as("n"))
    assert(df.queryExecution.optimizedPlan.toString.contains("regexpcount"),
      s"rule did not fire:\n${df.queryExecution.optimizedPlan}")
    // and the fused result matches the unfused semantics (fusion
    // guard held OFF via a non-foldable idx that still evaluates to 0)
    val expect = docs.select(col("doc_id"), size(regexp_extract_all(col("text"),
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"),
      (col("doc_id") * 0).cast("int"))).as("n"))
    assert(df.orderBy("doc_id").collect().toSeq ==
      expect.orderBy("doc_id").collect().toSeq)
  }

  test("RegexpCount agrees with size(regexp_extract_all) across inputs") {
    val pats = Seq("[0-9]+", "[^A-Za-z0-9\\s]", "ab?c", "\\b\\d{2}\\b")
    // includes a NULL subject: this session is legacy sizeOfNull
    // (ansi off), so size(regexp_extract_all(NULL)) = -1 and the
    // fused form must forward the flag to match
    val data = Seq("", "abc 12 !? 34ab c", "....", "99 9 99x", "αβ 12γ",
      "a\nb 77", " 12 345 ", null)
    for (p <- pats) {
      val df = data.toDF("t").select(
        size(regexp_extract_all(col("t"), lit(p), lit(0))).as("expect"),
        org.apache.spark.sql.graftshim.Shim.column(
          graft.functions.RegexpCount(
            org.apache.spark.sql.graftshim.Shim.expression(col("t")),
            org.apache.spark.sql.catalyst.expressions.Literal(p),
            legacyNull = true)).as("got"))
      df.collect().foreach { r =>
        assert(r.getInt(0) == r.getInt(1), s"pattern $p on row $r")
      }
    }
  }

  test("rule leaves group-extraction (idx != 0) untouched") {
    val df = Seq("a1 b2").toDF("t")
      .select(size(regexp_extract_all(col("t"),
        lit("([a-z])[0-9]"), lit(1))).as("n"))
    assert(!df.queryExecution.optimizedPlan.toString.contains("regexpcount"))
    assert(df.as[Int].head() == 2)
  }

  private def writePages(lines: Seq[Seq[String]]): String = {
    val dir = java.nio.file.Files.createTempDirectory("pages").toString
    lines.zipWithIndex.foreach { case (page, i) =>
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(f"$dir/page_$i%03d.jsonl"),
        page.mkString("", "\n", "\n"))
    }
    dir
  }

  test("registerViews exposes all tables + kernels to pure SQL") {
    GraftExtensions.register(spark)
    Tables.registerViews(spark, SparkTestSession.Sf)
    val row = spark.sql(
      """SELECT count(*) AS n,
        |       (SELECT count(*) FROM lineitem) AS li,
        |       (SELECT max(simhash64(split(text, ' '))) FROM documents) AS sh
        |FROM events""".stripMargin).collect()(0)
    assert(row.getLong(0) > 0 && row.getLong(1) > 0)
    assert(row.getLong(2) != 0L)
    // events view carries the converted microsecond timestamp type
    assert(spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
  }

  test("item-store source: pages become partitions, schemaless strings") {
    val dir = writePages(Seq(
      Seq("""{"id":"a1","Timestamp":1716241234,"summary":"s1"}""",
        "not json", ""),
      Seq("""{"id":"a2","timestamp":"2025-05-19T21:20:00Z","extra":{"k":1}}""")))
    val df = spark.read.format("graft.sources.ItemStore")
      .option("path", dir).load()
    assert(df.rdd.getNumPartitions == 2) // one per page
    assert(df.count() == 2)              // malformed + blank skipped
    val cols = df.columns.toSet
    assert(cols.contains("id") && cols.contains("timestamp"))
    // case-insensitive: Timestamp and timestamp unify; values stringify
    val rows = df.orderBy("id").collect()
    assert(rows(0).getAs[String]("timestamp") == "1716241234")
    assert(rows(1).getAs[String]("timestamp") == "2025-05-19T21:20:00Z")
  }

  test("item-store source: column pruning and string-equality pushdown") {
    val dir = writePages(Seq(Seq(
      """{"id":"a1","kind":"news","body":"x"}""",
      """{"id":"a2","kind":"blog","body":"y"}""")))
    val df = spark.read.format("graft.sources.ItemStore")
      .option("path", dir).load()
      .filter(col("kind") === "news").select("id")
    assert(df.as[String].collect().toSeq == Seq("a1"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema") || plan.contains("RowDataSourceScan")
      || df.columns.sameElements(Array("id")))
  }

  test("item-store numericFields: typed column + range pushdown (the Number-GSI analog)") {
    val dir = writePages(Seq(Seq(
      """{"id":"a1","ts":1716241234,"body":"old"}""",
      """{"id":"a2","ts":1716241300,"body":"new"}""",
      """{"id":"a3","ts":"not a number","body":"untyped"}""",
      """{"id":"a4","body":"missing ts"}""")))
    val df = spark.read.format("graft.sources.ItemStore")
      .option("path", dir).option("numericFields", "ts").load()
    // declared field surfaces as double
    assert(df.schema("ts").dataType ==
      org.apache.spark.sql.types.DoubleType)
    // unparseable/missing numeric values -> NULL (absent from the index)
    assert(df.filter(col("ts").isNull).count() == 2)
    // range predicate pushes into the source scan
    val recent = df.filter(col("ts") >= 1716241300d).select("id")
    assert(recent.as[String].collect().toSeq == Seq("a2"))
    // fully consumed by the source: no post-scan Filter node remains
    val plan = recent.queryExecution.executedPlan
    assert(plan.collect {
      case f: org.apache.spark.sql.execution.FilterExec => f
    }.isEmpty, s"filter not fully pushed:\n$plan")
    assert(recent.queryExecution.optimizedPlan.toString.contains("ItemStoreScan") ||
      plan.toString.contains("BatchScan"))
  }

  test("item-store feeds the ingest pipeline end-to-end") {
    val dir = writePages(Seq(Seq(
      """{"id":"a1","timestamp":1716241234,"summary":"epoch row","url":"https://ex.com/1"}""",
      """{"id":"a2","timestamp":"2025-05-19T21:20:00Z","content":"iso row"}""",
      """{"id":"a3","timestamp":1716241300,"summary":"dup","url":"https://EX.com/1 "}""",
      """{"id":"a4","timestamp":1716241234,"irrelevant":"no text"}""")))
    val items = spark.read.format("graft.sources.ItemStore")
      .option("path", dir).load()
    val req = ops.Ingest.run(items, cutoffEpochSec = 1700000000L, col("id"))
    // a3 dedups against a1 (same url, case/trim-insensitive); a4 has no
    // usable text -> dropped; a1 + a2 survive
    assert(req.count() == 2)
  }

  test("hours<=0 short-circuits to empty without reading") {
    val items = Tables.events(spark, SparkTestSession.Sf)
      .select(col("event_id").as("id"), col("ts").as("timestamp"),
        col("props").as("summary"))
    assert(ops.Ingest.runWindow(items, 1716241234L, 0, col("id")).count() == 0)
  }
}
