package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Post-load logical schema contract for all ten tables. The driver
  * regenerates the testdata between rounds and has already changed
  * physical encodings once (events.ts nanos -> timestamp[us] NTZ);
  * this spec makes any future drift a loud, named failure instead of
  * a scattered CAST error inside whichever query touches the moved
  * column first. In particular: NO column may surface as
  * TIMESTAMP_NTZ — [[Tables.load]] normalizes them to TimestampType.
  */
class TableContractSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf

  private val expected: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))

  test("every table loads with the contracted logical schema") {
    val diffs = Tables.All.flatMap { t =>
      val df = if (t == "events") Tables.events(spark, dir)
               else Tables.load(spark, dir, t)
      val got = df.schema.fields.map(f => f.name -> f.dataType).toSeq
      if (got == expected(t)) None
      else Some(s"$t:\n  expected ${expected(t)}\n  got      $got")
    }
    assert(diffs.isEmpty, diffs.mkString("\n"))
  }

  test("no table surfaces a TIMESTAMP_NTZ column after load") {
    Tables.All.foreach { t =>
      val df = if (t == "events") Tables.events(spark, dir)
               else Tables.load(spark, dir, t)
      val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
      assert(ntz.isEmpty, s"$t: ${ntz.map(_.name).mkString(",")}")
    }
  }
}
