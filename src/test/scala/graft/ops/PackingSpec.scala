package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, Tables}

/** BFD sequence packing: budget respected, every doc packed exactly
  * once, deterministic across partitionings, utilization bounded.
  */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf
  import spark.implicits._

  private val Budget = 512L

  private def docs = Tables.documents(spark, dir)

  private def packed = Packing.packGreedy(docs, col("doc_id"),
    TextStats.tokenCount(col("text")), Budget, shards = 8).collect().toSeq

  test("every document lands in exactly one pack") {
    val ids = packed.map(_.docId)
    assert(ids.distinct.size == ids.size)
    assert(ids.toSet == docs.select("doc_id").as[Long].collect().toSet)
  }

  test("no pack exceeds the budget (oversize docs pack alone)") {
    packed.groupBy(_.packId).foreach { case (pid, slots) =>
      val total = slots.map(_.nTokens).sum
      assert(total <= Budget || slots.size == 1,
        s"$pid holds $total tokens in ${slots.size} docs")
    }
  }

  test("slots are dense and ordered within each pack") {
    packed.groupBy(_.packId).foreach { case (_, slots) =>
      assert(slots.map(_.slot).sorted == (0 until slots.size))
    }
  }

  test("packing is deterministic across input partitionings") {
    val a = packed.map(p => (p.packId, p.docId, p.slot)).sorted
    val b = Packing.packGreedy(docs.repartition(13), col("doc_id"),
      TextStats.tokenCount(col("text")), Budget, shards = 8)
      .collect().toSeq.map(p => (p.packId, p.docId, p.slot)).sorted
    assert(a == b)
  }

  test("utilization beats the no-packing baseline substantially") {
    val nPacks = packed.map(_.packId).distinct.size
    val totalTokens = packed.map(p => math.min(p.nTokens, Budget)).sum
    val utilization = totalTokens.toDouble / (nPacks * Budget)
    val unpacked = packed.size // one doc per window without packing
    assert(nPacks < unpacked / 2, s"$nPacks packs for $unpacked docs")
    assert(utilization > 0.5, s"utilization $utilization")
  }

  test("bfd unit: worst-fit order still respects capacity") {
    val out = Packing.bfd(Iterator((1L, 300L), (2L, 300L), (3L, 200L),
      (4L, 700L), (5L, 12L)), budget = 512L, shard = 0).toSeq
    // oversize doc 4 is alone in its bin
    val byBin = out.groupBy(_.packId)
    val binOf4 = out.find(_.docId == 4L).get.packId
    assert(byBin(binOf4).size == 1)
    byBin.foreach { case (_, slots) =>
      assert(slots.map(_.nTokens).sum <= 512L || slots.size == 1)
    }
    assert(out.map(_.docId).toSet == Set(1L, 2L, 3L, 4L, 5L))
  }

  test("materialize emits each pack's texts in slot order, token-exact") {
    import spark.implicits._
    val texts = Seq((1L, "one two three"), (2L, "four five"),
      (3L, "six"), (4L, "seven eight nine ten")).toDF("id", "text")
    val withTok = texts.select(col("id"), col("text"),
      size(split(col("text"), " ")).cast("long").as("ntok"))
    val packs = Packing.packGreedy(withTok, col("id"), col("ntok"),
      budget = 5L, shards = 2)
    val mat = Packing.materialize(packs, texts, col("id"), col("text"),
      sep = " | ").collect()
    val layout = packs.collect().groupBy(_.packId)
    assert(mat.length == layout.size)
    mat.foreach { r =>
      val members = layout(r.getString(0)).sortBy(_.slot)
      val expectText = members.map(m =>
        texts.filter(col("id") === m.docId).select("text").as[String].head())
        .mkString(" | ")
      assert(r.getString(3) == expectText)
      assert(r.getLong(1) == members.length.toLong)
      assert(r.getLong(2) == members.map(_.nTokens).sum)
      assert(r.getLong(2) <= 5L || members.length == 1)
    }
  }
}
