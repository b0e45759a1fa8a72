package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops._

/** Ad-hoc stage profiler for the near-dup pipeline. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$n")
    }
    time("warmup count")(docs.count())
    time("shingles")(docs.select(TextStats.shingles(col("text"), 3)).count())
    time("signature")(docs.select(MinHash.signature(
      TextStats.shingles(col("text"), 3), 32)).count())
    time("bandedIndex")(MinHash.bandedIndex(docs, col("doc_id"), col("text")).count())
    time("candidatePairs")(MinHash.candidatePairs(docs, col("doc_id"), col("text")).count())
    val idx = MinHash.bandedIndex(docs, col("doc_id"), col("text")).cache()
    time("idx materialize")(idx.count())
    val a = idx.toDF("id_a", "band", "bh")
    val b = idx.toDF("id_b", "band", "bh")
    time("join cached idx")(a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b")).select("id_a", "id_b").distinct().count())
    idx.unpersist()
    time("nearDupPairs")(MinHash.nearDupPairs(docs, col("doc_id"), col("text"), 0.3).count())
    time("simhash sigs")(SimHash.signatures(docs, col("doc_id"), col("text")).count())
    time("simhash candidates")(SimHash.candidateDistances(docs, col("doc_id"), col("text")).count())
    spark.stop()
  }
}
