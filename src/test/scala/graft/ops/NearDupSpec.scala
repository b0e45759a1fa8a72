package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** E1-near: MinHash+LSH and SimHash detection of planted duplicates. */
class NearDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away today"
  private val docs = Seq(
    (1L, base),
    (2L, base),                                     // exact dup of 1
    (3L, base.replace("quick", "swift")),           // near dup of 1
    (4L, "completely different words about spark catalyst optimizer plans"),
    (5L, "another unrelated document mentioning embeddings and vectors only"))
    .toDF("doc_id", "text")

  test("polyHash: byte-decoded codepoints match the String reference, ASCII and not") {
    // pins the zero-allocation UTF-8 decoder in kernels.polyHash
    // against the definitional form (rolling hash over codePointAt) —
    // the DuckDB oracles recompute exactly this definition via ord()
    def reference(str: String, mult: Long): Long = {
      var h = 0L; var i = 0
      while (i < str.length) {
        val cp = str.codePointAt(i)
        h = (h * mult + cp) % 2147483647L
        i += Character.charCount(cp)
      }
      h
    }
    for (s <- Seq("", "a", "hello world", "héllo wörld", "日本語テキスト",
                  "mixed ascii and 中文 and émoji 😀 end");
         m <- Seq(31L, 131L)) {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      assert(graft.functions.kernels.polyHash(u, m) == reference(s, m),
        s"mismatch for '$s' mult=$m")
    }
  }

  test("polyHash/simhash64: truncated multi-byte tails fold as 0, never read past the buffer") {
    // Spark does not validate UTF-8 on ingest, so corrupt source data
    // can hand the kernels a string ending mid-sequence. The guarded
    // byte-array variant (polyHashUtf8Bytes) is the definitional form:
    // both UTF8String decoders must agree with it byte-for-byte.
    import org.apache.spark.unsafe.types.UTF8String
    val truncated = Seq(
      Array[Byte](0x61, 0xc3.toByte),               // 'a' + lead-of-2, no cont
      Array[Byte](0xe6.toByte, 0x97.toByte),        // lead-of-3, one cont
      Array[Byte](0xf0.toByte, 0x9f.toByte, 0x98.toByte), // lead-of-4, two conts
      Array[Byte](0xf0.toByte),                     // lone lead-of-4
      Array[Byte](0x68, 0x69, 0xe4.toByte))         // "hi" + lone lead-of-3
    for (bytes <- truncated; m <- Seq(31L, 131L)) {
      val u = UTF8String.fromBytes(bytes)
      val expected = graft.functions.kernels.polyHashUtf8Bytes(bytes, m, 0L)
      assert(graft.functions.kernels.polyHash(u, m) == expected,
        s"polyHash mismatch for bytes=${bytes.mkString(",")} mult=$m")
    }
    // simhash64 over a token array containing a truncated tail must not
    // crash and must equal the two-seeded-polyHash definition
    val tok = UTF8String.fromBytes(Array[Byte](0x61, 0x62, 0xe2.toByte))
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any](tok))
    val h1 = graft.functions.kernels.polyHashUtf8Bytes(tok.getBytes, 31L,
      graft.functions.kernels.SimSeed1)
    val h2 = graft.functions.kernels.polyHashUtf8Bytes(tok.getBytes, 131L,
      graft.functions.kernels.SimSeed2)
    val packed = (h1 << 31) + h2
    // with a single token every vote is the token's bit, so the
    // signature IS the packed hash
    assert(graft.functions.kernels.simhash64(arr) == packed)
  }

  test("MinHash+LSH finds exact and near dups, not unrelated pairs") {
    val pairs = MinHash.nearDupPairs(docs, col("doc_id"), col("text"),
      threshold = 0.5, shingleN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 3L)) || pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }
  test("bucketAudit: a boilerplate bucket shows up with its population") {
    // ten identical docs share every signature, so all 8 band buckets
    // hold 10 docs; two distinct docs stay under the threshold
    val corpus = ((1L to 10L).map(i => (i, "same words in every doc here")) ++
      Seq((21L, "completely different text one"),
        (22L, "another unrelated document two")))
      .toDF("doc_id", "text")
    val audit = MinHash.bucketAudit(corpus, col("doc_id"), col("text"),
      minBucket = 5, shingleN = 2)
      .collect().map(r => (r.getInt(0), r.getLong(2)))
    assert(audit.length == 8 && audit.forall(_._2 == 10L), s"got ${audit.toSeq}")
    assert(MinHash.bucketAudit(corpus, col("doc_id"), col("text"),
      minBucket = 10, shingleN = 2).count() == 0)
  }

  test("MinHash signature is deterministic across evaluations") {
    val sig = MinHash.signature(TextStats.shingles(col("text"), 2), 16)
    val a = docs.select(sig).collect().map(_.getSeq[Long](0))
    val b = docs.select(sig).collect().map(_.getSeq[Long](0))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }
  test("incremental near-dup: batch docs matched against the corpus only") {
    // corpus holds docs 1-3, the "new batch" holds 4 (near-dup of 1)
    // and 5 (novel): only batch-vs-corpus pairs may appear
    val corpus = docs.filter(col("doc_id") <= 3)
    val batch = Seq(
      (4L, base.replace("dog", "cat")), // near dup of corpus doc 1
      (5L, "entirely novel content with no shingle overlap at all here"))
      .toDF("doc_id", "text")
    val hits = MinHash.nearDupAgainst(corpus, batch,
      col("doc_id"), col("text"), threshold = 0.5, shingleN = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.exists(_._1 == 4L), s"batch near-dup not found: $hits")
    assert(!hits.exists(_._1 == 5L), s"novel doc misflagged: $hits")
    assert(hits.forall { case (b, c) => b >= 4L && c <= 3L },
      s"role mixup (corpus x corpus or batch x batch pair): $hits")
  }

  test("extend: the crawl loop — an accepted batch becomes probe-able by the next") {
    // corpus = docs 4,5; wave1 brings doc 1 (novel vs corpus); wave2
    // brings doc 6, a near-dup OF WAVE 1's doc — catchable only if
    // wave1 was folded into the standing index
    val corpus = docs.filter(col("doc_id") >= 4)
    val idx0 = MinHash.buildIndex(corpus, col("doc_id"), col("text"), shingleN = 2)
    val wave1 = docs.filter(col("doc_id") === 1)
    val hits1 = MinHash.probe(idx0, wave1, col("doc_id"), col("text"), 0.5)
      .collect()
    assert(hits1.isEmpty, s"doc 1 should be novel vs corpus: ${hits1.toSeq}")
    val idx1 = MinHash.extend(idx0, wave1, col("doc_id"), col("text"))
    val wave2 = Seq((6L, base.replace("dog", "cat"))).toDF("doc_id", "text")
    val hits2 = MinHash.probe(idx1, wave2, col("doc_id"), col("text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits2.contains((6L, 1L)), s"cross-batch dup not caught: $hits2")
    // the extended index equals a from-scratch build over corpus+wave1
    val rebuilt = MinHash.buildIndex(corpus.unionByName(wave1),
      col("doc_id"), col("text"), shingleN = 2)
    val viaRebuild = MinHash.probe(rebuilt, wave2, col("doc_id"), col("text"), 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits2 == viaRebuild)
    // the old snapshot is untouched (parquet-append semantics)
    assert(MinHash.probe(idx0, wave2, col("doc_id"), col("text"), 0.5)
      .collect().isEmpty)
    // incremental accounting: the extended artifact READS materialized
    // blocks (ExistingRDD scans), it does not re-shingle the corpus
    val plan = idx1.index.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), s"index should union checkpoints:\n$plan")
    assert(!plan.contains("Generate"), s"no re-shingling in the artifact:\n$plan")
  }

  test("saveIndex/loadIndex: the persisted artifact probes identically across sessions-of-use") {
    val corpus = docs.filter(col("doc_id") <= 3)
    val idx = MinHash.buildIndex(corpus, col("doc_id"), col("text"), shingleN = 2)
    val path = java.nio.file.Files.createTempDirectory("mh_idx").toString
    MinHash.saveIndex(idx, path)
    val loaded = MinHash.loadIndex(spark, path)
    assert((loaded.shingleN, loaded.k, loaded.bands, loaded.seed) ==
      (idx.shingleN, idx.k, idx.bands, idx.seed))
    val batch = Seq((9L, base.replace("dog", "cat"))).toDF("doc_id", "text")
    def probe(ix: MinHash.CorpusIndex) =
      MinHash.probe(ix, batch, col("doc_id"), col("text"), 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe(loaded) == probe(idx))
    assert(probe(loaded).nonEmpty)
    // a loaded index keeps extending — the durable crawl loop
    val extended = MinHash.extend(loaded, batch, col("doc_id"), col("text"))
    val batch2 = Seq((10L, base.replace("dog", "cat"))).toDF("doc_id", "text")
    assert(MinHash.probe(extended, batch2, col("doc_id"), col("text"), 0.5)
      .collect().map(_.getLong(1)).toSet.contains(9L))
  }

  test("SimHash: identical texts at distance 0, near dups close, unrelated far") {
    val sigs = SimHash.signatures(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def d(a: Long, b: Long) = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
    assert(d(1, 2) == 0)
    assert(d(1, 3) < d(1, 4))
  }
  test("concurrent nearDupPairs calls over two corpora stay independent") {
    // regression: a JVM-global cache slot let call B unpersist call A's
    // shingled base mid-query; per-call localCheckpoint scoping must
    // keep interleaved actions over both results stable
    val other = Seq(
      (10L, "mary had a little lamb whose fleece was white as snow"),
      (11L, "mary had a little lamb whose fleece was white as milk"),
      (12L, "rockets and planets and orbits in the night sky above"))
      .toDF("doc_id", "text")
    val pa = MinHash.nearDupPairs(docs, col("doc_id"), col("text"),
      threshold = 0.5, shingleN = 2)
    val pb = MinHash.nearDupPairs(other, col("doc_id"), col("text"),
      threshold = 0.5, shingleN = 2)
    val a1 = pa.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b1 = pb.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a2 = pa.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a1 == a2, "first corpus result changed after the second call ran")
    assert(a1.contains((1L, 2L)) && b1.contains((10L, 11L)))
    assert(!b1.exists(p => p._1 == 12L || p._2 == 12L))
  }
  test("SimHash chunk join surfaces the exact-dup pair at distance 0") {
    val pairs = SimHash.nearDupPairs(docs, col("doc_id"), col("text"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 0L))
  }
}
