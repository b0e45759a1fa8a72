package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotDouble, JaccardSorted, MinHashSig, PolyHashBin, Shingles, SimHash64}
import graft.ops.MinHash

/** SQL surface for the native kernels: registers the custom Catalyst
  * expressions as SQL functions so `spark.sql("... simhash64(t) ...")`
  * works — both via `SparkSessionExtensions` (config
  * `spark.sql.extensions=graft.GraftExtensions`) and via a direct
  * registry call for an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // fuse size(regexp_extract_all(s, p, 0)) -> native RegexpCount
    e.injectOptimizerRule(_ => graft.plans.RewriteRegexpCount)
  }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", null, name, usage, "")

  /** (name, info, builder) triples shared by both registration paths. */
  val registrations: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64", info("simhash64", "simhash64(tokens)"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    ("shingles", info("shingles", "shingles(text, n)"),
      (args: Seq[Expression]) => {
        val n = args(1).eval().asInstanceOf[Number].intValue()
        Shingles(args.head, n)
      }),
    ("dot_double", info("dot_double", "dot_double(a, b)"),
      (args: Seq[Expression]) => DotDouble(args.head, args(1))),
    ("jaccard_sorted", info("jaccard_sorted", "jaccard_sorted(a_sorted_distinct, b_sorted_distinct)"),
      (args: Seq[Expression]) => JaccardSorted(args.head, args(1))),
    ("minhash_sig", info("minhash_sig", "minhash_sig(shingles, k, seed)"),
      (args: Seq[Expression]) => {
        val k = args(1).eval().asInstanceOf[Number].intValue()
        val seed = if (args.length > 2)
          args(2).eval().asInstanceOf[Number].longValue() else 42L
        val (as, bs) = MinHash.coeffs(k, seed)
        MinHashSig(args.head, as.toArray, bs.toArray)
      }),
    ("poly_hash", info("poly_hash", "poly_hash(content_binary[, mult[, seed]])"),
      (args: Seq[Expression]) => {
        val mult = if (args.length > 1)
          args(1).eval().asInstanceOf[Number].longValue() else 31L
        val seed = if (args.length > 2)
          args(2).eval().asInstanceOf[Number].longValue() else 0L
        PolyHashBin(args.head, mult, seed)
      }))

  /** Register on an already-built session (tests, notebooks). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        name, builder, "scala_udf")
    }
}
