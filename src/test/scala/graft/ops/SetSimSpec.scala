package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SetSimSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def docs(rows: (Int, String)*) =
    rows.toDF("doc_id", "text")

  test("prefix-filtered join equals brute-force exact Jaccard") {
    val d = docs(
      1 -> "a b c d e f g h",
      2 -> "a b c d e f g x", // near-dup of 1
      3 -> "p q r s t u v w",
      4 -> "p q r s t u v w", // exact dup of 3
      5 -> "z y x w v u t s")
    val got = SetSim.jaccardJoin(d, col("doc_id"), col("text"),
      shingleN = 3, tauNum = 1, tauDen = 2)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet

    // brute force over the same shingle sets
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val m = Map(1 -> sh("a b c d e f g h"), 2 -> sh("a b c d e f g x"),
      3 -> sh("p q r s t u v w"), 4 -> sh("p q r s t u v w"),
      5 -> sh("z y x w v u t s"))
    val want = (for {
      a <- m.keys; b <- m.keys if a < b
      inter = (m(a) intersect m(b)).size
      uni = (m(a) union m(b)).size
      if inter * 2 >= uni
    } yield (a, b)).toSet
    assert(got == want)
    assert(want.contains((1, 2)) && want.contains((3, 4)))
  }

  test("inter/uni are exact and jaccard is their quotient") {
    val d = docs(1 -> "a b c d e", 2 -> "a b c d e", 3 -> "q r s t u")
    val rows = SetSim.jaccardJoin(d, col("doc_id"), col("text"))
      .select("id_a", "id_b", "inter", "uni", "jaccard")
      .as[(Int, Int, Long, Long, Double)].collect()
    assert(rows.toSeq == Seq((1, 2, 3L, 3L, 1.0))) // 3 trigrams, identical
  }

  test("threshold tau is inclusive (>=, not >)") {
    // sets of 3 trigrams sharing exactly 2: J = 2/4 = 1/2 exactly
    val d = docs(1 -> "a b c d e", 2 -> "a b c d x")
    // shingles: {abc,bcd,cde} vs {abc,bcd,cdx}: inter 2, uni 4
    val rows = SetSim.jaccardJoin(d, col("doc_id"), col("text"),
      tauNum = 1, tauDen = 2).collect()
    assert(rows.length == 1)
  }

  test("plan: joins stay equi-keyed, no product, no global window") {
    val d = graft.Tables.documents(spark, SparkTestSession.Sf)
    val df = SetSim.jaccardJoin(d, col("doc_id"), col("text"))
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"product in:\n$plan")
    // the row_number window must be keyed on the doc id, never global:
    // every windowspecdefinition in the plan must open with the id
    // partition column (a global window prints the order spec first)
    val specs = "windowspecdefinition\\(([^,)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.startsWith("id#")),
      s"window not partitioned on id ($specs) in:\n$plan")
  }

  test("crossJaccardJoin equals brute force over A x B, no same-side pairs") {
    val a = docs(
      2 -> "a b c d e f g h",
      4 -> "p q r s t u v w",
      6 -> "m n o p q r s t")
    val b = docs(
      1 -> "a b c d e f g x", // near-dup of A:2
      3 -> "p q r s t u v w", // exact dup of A:4
      5 -> "z z z z z z z z")
    val got = SetSim.crossJaccardJoin(a, b, col("doc_id"), col("text"),
      shingleN = 3, tauNum = 1, tauDen = 2)
      .select("id_a", "id_b").as[(Int, Int)].collect().toSet

    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val ma = Map(2 -> sh("a b c d e f g h"), 4 -> sh("p q r s t u v w"),
      6 -> sh("m n o p q r s t"))
    val mb = Map(1 -> sh("a b c d e f g x"), 3 -> sh("p q r s t u v w"),
      5 -> sh("z z z z z z z z"))
    val want = (for {
      x <- ma.keys; y <- mb.keys
      inter = (ma(x) intersect mb(y)).size
      uni = (ma(x) union mb(y)).size
      if inter * 2 >= uni
    } yield (x, y)).toSet
    assert(got == want)
    assert(want.contains((2, 1)) && want.contains((4, 3)))
    // ids from A only on the left, from B only on the right
    assert(got.forall { case (x, y) => ma.contains(x) && mb.contains(y) })
  }

  test("crossJaccardJoin plan: equi-keyed joins, id-partitioned windows") {
    val d = graft.Tables.documents(spark, SparkTestSession.Sf)
    val df = SetSim.crossJaccardJoin(
      d.filter(pmod(col("doc_id"), lit(2)) === 0),
      d.filter(pmod(col("doc_id"), lit(2)) === 1),
      col("doc_id"), col("text"), shingleN = 3, tauNum = 7, tauDen = 10)
    df.collect()
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan.toString
      case p => p.toString
    }
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"product in:\n$plan")
    val specs = "windowspecdefinition\\(([^,)]*)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(specs.nonEmpty && specs.forall(_.startsWith("id#")),
      s"window not partitioned on id ($specs) in:\n$plan")
  }
}
