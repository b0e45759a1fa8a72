package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** D1/D2: priority key namespaces, first-wins determinism, keyless
  * rows kept (batch/dynamo_fetcher.py:332-360).
  */
class DedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("url key beats id key; lower-cased and trimmed") {
    val df = Seq(
      (1L, "https://EX.com/1 ", "a"),
      (2L, "https://ex.com/1", "b"),
      (3L, null, "c")).toDF("id", "url", "x")
    val out = Dedup.dedupItems(df, col("id")).orderBy("id")
    // rows 1,2 share url key (case/trim-normalized) -> first (id=1) wins;
    // row 3 falls back to id key -> kept
    assert(out.select("id").as[Long].collect().toSeq == Seq(1L, 3L))
  }
  test("keyless rows are never deduplicated") {
    val df = Seq((10, "a"), (20, "a")).toDF("other", "payload")
    assert(Dedup.dedupItems(df, col("other")).count() == 2)
  }
  test("first-wins is deterministic on the order column") {
    val df = Seq((5L, "k"), (1L, "k"), (3L, "k")).toDF("id", "url")
    val kept = Dedup.dedupItems(df, col("id")).select("id").as[Long].collect()
    assert(kept.toSeq == Seq(1L))
  }
  test("dedup is idempotent") {
    val df = Seq((1L, "u"), (2L, "u"), (3L, "v")).toDF("id", "url")
    val once = Dedup.dedupItems(df, col("id"))
    val twice = Dedup.dedupItems(once, col("id"))
    assert(once.collect().toSet == twice.collect().toSet)
  }
  test("exact text dedup groups count duplicates and keep min id") {
    val df = Seq((1L, "Hello "), (2L, "hello"), (3L, "world"))
      .toDF("doc_id", "text")
    val g = Dedup.exactTextGroups(df, col("text"), col("doc_id"))
      .orderBy("keep_id").collect()
    assert(g.length == 2)
    assert(g(0).getLong(1) == 1L && g(0).getLong(2) == 2L) // hello x2
  }
  test("exact text dedup filter keeps one row per normalized text") {
    val df = Seq((1L, "A"), (2L, "a"), (3L, "b")).toDF("doc_id", "text")
    val kept = Dedup.exactTextDedup(df, col("text"), col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("keyless rows sharing an order value are ALL kept") {
    // order is stable, not unique (e.g. second-granularity timestamps)
    val df = Seq((null.asInstanceOf[String], 100L, "a"),
      (null.asInstanceOf[String], 100L, "b"),
      ("u1", 100L, "c"), ("u1", 200L, "d"))
      .toDF("url", "ts", "tag")
    val kept = Dedup.dedupItems(df, col("ts"))
      .select("tag").as[String].collect().toSet
    // both keyless rows survive; u1 dedups to its first row
    assert(kept == Set("a", "b", "c"))
  }

  test("a real key shaped like a surrogate cannot collide with keyless rows") {
    val df = Seq(("null:100", 100L, "real"),
      (null.asInstanceOf[String], 100L, "keyless"))
      .toDF("id", "ts", "tag")
    val kept = Dedup.dedupItems(df, col("ts"))
      .select("tag").as[String].collect().toSet
    assert(kept == Set("real", "keyless"))
  }

  test("incrementalNew drops batch rows already in the corpus (normalized)") {
    val corpus = Seq((1L, "seen doc"), (2L, "Another One "))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "seen doc"),      // exact dup
                    (11L, "ANOTHER ONE"),   // dup after lower+trim
                    (12L, "genuinely new")) // survives
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNew(batch, corpus, col("text"))
      .select("doc_id").as[Long].collect().toSeq
    assert(out == Seq(12L))
  }

  test("incrementalNew: NULL text is vacuously new and marks nothing seen") {
    val corpus = Seq((1L, "seen doc"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val batch = Seq((10L, null.asInstanceOf[String]), // vacuously new
                    (11L, "seen doc"),                // dropped
                    (12L, "fresh"))                   // survives
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNew(batch, corpus, col("text"))
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(out == Seq(10L, 12L))
  }

  test("incrementalNew keeps within-batch duplicates (dedup batch separately)") {
    val corpus = Seq((1L, "x")).toDF("doc_id", "text")
    val batch = Seq((10L, "y"), (11L, "y")).toDF("doc_id", "text")
    val out = Dedup.incrementalNew(batch, corpus, col("text"))
    // both survive: incrementalNew is batch-vs-corpus, not batch-vs-self
    assert(out.count() == 2)
  }

  test("keepBestNearDup keeps the highest-QUALITY cluster member, not the lowest id") {
    // near-dup pair: same long sentence, but doc 7 is mangled with
    // punctuation noise (lower quality) while doc 9 is clean — the
    // first-wins policy would keep 7; keep-best must keep 9. Doc 20
    // is unrelated and survives untouched.
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away to the hills where it rests for a while in peace"
    val docs = Seq(
      (7L, base + " ~~!!##$$%%^^&&**(())__++"),
      (9L, base),
      (20L, "completely unrelated text about spark physical planning"))
      .toDF("doc_id", "text")
    val kept = Dedup.keepBestNearDup(docs, col("doc_id"), col("text"))
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(9L, 20L), s"keep-best picked $kept")
  }

  test("keepBestByPairs applies the same policy to ANY injected pair table") {
    // the factored policy half: evidence comes from the caller (here a
    // hand pair table standing in for verbatim/SimHash/embedding
    // detectors) — clusters keep their (quality DESC, id) best,
    // unpaired rows survive, and a transitive chain is ONE cluster
    val docs = Seq(
      (1L, "a b"),                                  // low quality (short)
      (2L, "the quick brown fox jumps over the lazy dog and then " +
        "runs far away to the hills where it rests for a while"),
      (3L, "!!@@##$$"),                             // punctuation junk
      (50L, "an unpaired survivor document about catalyst plans"))
      .toDF("doc_id", "text")
    // chain 1-2-3: one component though (1,3) never pair directly
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val kept = Dedup.keepBestByPairs(docs, col("doc_id"), col("text"), pairs)
      .select("id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 50L), s"keep-best-by-pairs picked $kept")
    // and keepBestNearDup IS keepBestByPairs over the MinHash pairs
    val base = "the quick brown fox jumps over the lazy dog and then " +
      "runs far away to the hills where it rests for a while in peace"
    val docs2 = Seq(
      (7L, base + " ~~!!##$$%%^^&&**(())__++"),
      (9L, base),
      (20L, "completely unrelated text about spark physical planning"))
      .toDF("doc_id", "text")
    val viaPairs = Dedup.keepBestByPairs(docs2, col("doc_id"), col("text"),
        MinHash.nearDupPairs(docs2, col("doc_id"), col("text"), 0.3))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    val direct = Dedup.keepBestNearDup(docs2, col("doc_id"), col("text"))
      .orderBy("id").as[(Long, Double)].collect().toSeq
    assert(viaPairs == direct)
  }
}
