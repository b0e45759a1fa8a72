package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection (north-star operator E1-near,
  * SURVEY.md §2.9) — the scale path for corpus dedup where exact
  * pairwise Jaccard is quadratic.
  *
  * Pipeline: word shingles → per-shingle base hash (engine-portable
  * polynomial hash mod 2^31−1, [[graft.functions.kernels.polyHash]]) →
  * k universal hashes `(a·h + b) mod p` minimized over shingles (the
  * MinHash signature) → signature split into bands → rows sharing any
  * (band, bandKey) bucket become candidate pairs → candidates verified
  * by exact shingle-set Jaccard. Every stage is pure 64-bit integer
  * arithmetic, so an independent engine (the DuckDB oracle) recomputes
  * the exact candidate set and output.
  *
  * Everything up to the bucket join is a narrow map (codegen'd
  * expressions, no shuffle); the bucket join is ONE shuffle on
  * (band, bandHash) whose key space is uniform — this is what makes it
  * hold at 1000 executors: no all-pairs, no skewed key, candidate
  * volume proportional to true-duplicate volume.
  */
object MinHash {

  private[graft] val P = 2147483647L // 2^31 − 1; a,b,h < 2^31 keep a·h+b < 2^62

  /** Seed-deterministic universal-hash coefficients. */
  def coeffs(k: Int, seed: Long = 42L): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(seed)
    def draw() = (rnd.nextLong().abs % (P - 1)) + 1
    (Seq.fill(k)(draw()), Seq.fill(k)(draw()))
  }

  /** Portable band key: fold of one band's signature rows,
    * acc ← (acc·31 + sᵢ) mod P — pure codegen'd integer arithmetic
    * (`element_at`/`pmod`, no murmur3), so any engine can recompute the
    * bucket assignment and the correctness oracle replicates the
    * candidate set exactly. Each step stays below 2^36 (acc < P,
    * sᵢ < P). Key is one long — same shuffle width as the hash it
    * replaces.
    */
  private[graft] def bandKey(sig: Column, start: Int, rows: Int): Column =
    (0 until rows).foldLeft(lit(0L): Column) { (acc, j) =>
      pmod(acc * lit(31L) + element_at(sig, start + j + 1), lit(P))
    }

  /** MinHash signature (array<long> of length k) of a shingle-array
    * column. Base hash computed once per shingle, then k permutations
    * minimized in one pass — a native Catalyst expression
    * ([[graft.functions.MinHashSig]]); the `transform`+`array_min`
    * composition it replaces is CodegenFallback and rescans the
    * shingle array k times per row.
    */
  def signature(shinglesCol: Column, k: Int, seed: Long = 42L): Column = {
    val (as, bs) = coeffs(k, seed)
    graft.functions.ArrayExprs.minhashSig(shinglesCol, as.toArray, bs.toArray)
  }

  /** (doc, band, bandHash) index rows — the LSH buckets. The band
    * array is statically unrolled (`array(...)` of codegen'd
    * hash/slice) rather than `transform(sequence(...))`, which is
    * CodegenFallback and would re-evaluate the signature per band.
    */
  def bandedIndex(docs: DataFrame, idCol: Column, textCol: Column,
                  shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                  seed: Long = 42L): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val sig = signature(TextStats.shingles(textCol, shingleN), k, seed)
    val bandHashes = array((0 until bands).map { b =>
      struct(lit(b).as("band"), bandKey(col("sig"), b * rows, rows).as("bh"))
    }: _*)
    docs.select(idCol.as("id"), sig.as("sig"))
      .select(col("id"), explode(bandHashes).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
  }

  /** Candidate near-dup pairs (id_a < id_b), deduplicated across bands. */
  def candidatePairs(docs: DataFrame, idCol: Column, textCol: Column,
                     shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                     seed: Long = 42L): DataFrame = {
    val idx = bandedIndex(docs, idCol, textCol, shingleN, k, bands, seed)
    val a = idx.toDF("id_a", "band", "bh")
    val b = idx.toDF("id_b", "band", "bh")
    a.join(b, Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Bucket-skew audit for the LSH band join: the (band, bh, n)
    * buckets holding more than `minBucket` documents. MinHash does not
    * cap its buckets (completeness over the threshold is the
    * contract), so a degenerate corpus — boilerplate documents all
    * landing in one bucket — shows up here as the quadratic-join
    * early warning rather than as a silent drop. Bounded output:
    * ≤ (bands·docs)/minBucket rows.
    */
  def bucketAudit(docs: DataFrame, idCol: Column, textCol: Column,
                  minBucket: Int, shingleN: Int = 3, k: Int = 32,
                  bands: Int = 8, seed: Long = 42L): DataFrame =
    bandedIndex(docs, idCol, textCol, shingleN, k, bands, seed)
      .groupBy(col("band"), col("bh")).agg(count(lit(1)).as("n"))
      .filter(col("n") > minBucket)

  /** Full near-dup detection: LSH candidates verified by exact
    * shingle-set Jaccard ≥ threshold.
    *
    * The corpus is shingled ONCE: `(id, sorted distinct shingles,
    * signature)` is computed in a single pass and persisted
    * (MEMORY_AND_DISK — spills, never OOMs), then reused by the banded
    * index AND both sides of the verify join. (MinHash is
    * multiplicity-blind, so signing the distinct set equals signing the
    * raw shingle stream.) Verify Jaccard is a merge pass over the
    * pre-sorted sets ([[graft.functions.JaccardSorted]]) — no
    * per-pair array allocation.
    */
  def nearDupPairs(docs: DataFrame, idCol: Column, textCol: Column,
                   threshold: Double, shingleN: Int = 3, k: Int = 32,
                   bands: Int = 8, seed: Long = 42L,
                   roundTo: Int = 4): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    // lazy localCheckpoint scopes the shingled corpus to THIS call:
    // the first action materializes it once (MEMORY_AND_DISK — spills,
    // never OOMs), the banded index and both verify-join sides read
    // the blocks, and the ContextCleaner reclaims them when the
    // returned frame becomes unreachable. No JVM-global eviction slot
    // (a previous round's AtomicReference cache let one call unpersist
    // a concurrent caller's base mid-query — correct but re-shingling;
    // per-call scoping removes the shared mutable state entirely).
    val base = docs.select(idCol.as("id"),
        array_sort(array_distinct(TextStats.shingles(textCol, shingleN))).as("sset"))
      .withColumn("sig", signature(col("sset"), k, seed))
      .localCheckpoint(eager = false)
    val bandHashes = array((0 until bands).map { b =>
      struct(lit(b).as("band"), bandKey(col("sig"), b * rows, rows).as("bh"))
    }: _*)
    val idx = base.select(col("id"), explode(bandHashes).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val cands = idx.toDF("id_a", "band", "bh")
      .join(idx.toDF("id_b", "band", "bh"), Seq("band", "bh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sets = base.select(col("id"), col("sset"))
    cands
      .join(sets.toDF("id_a", "set_a"), Seq("id_a"))
      .join(sets.toDF("id_b", "set_b"), Seq("id_b"))
      .withColumn("jac",
        round(graft.functions.ArrayExprs.jaccardSorted(col("set_a"), col("set_b")), roundTo))
      .filter(col("jac") >= threshold)
      .select(col("id_a"), col("id_b"), col("jac"))
  }

  /** INCREMENTAL near-dup: which documents of a NEW batch near-
    * duplicate the EXISTING corpus — the daily-ingest dedup gate (the
    * LSH scale twin of [[Dedup]]'s exact incremental anti-join). The
    * candidate join is BIPARTITE (corpus index × batch index, never
    * corpus × corpus): at 100 TB the corpus's banded index and shingle
    * sets are a materialized artifact written once and re-probed by
    * every batch — only the (small) batch side is shingled and signed
    * per run, and the bucket join's cost tracks the batch size, not
    * the corpus. Output: (batch_id, corpus_id, jac ≥ threshold) —
    * downstream drops `batch_id`s with any match.
    */
  def nearDupAgainst(corpus: DataFrame, batch: DataFrame,
                     idCol: Column, textCol: Column,
                     threshold: Double, shingleN: Int = 3, k: Int = 32,
                     bands: Int = 8, seed: Long = 42L,
                     roundTo: Int = 4): DataFrame = {
    val cBase = prepared(corpus, idCol, textCol, shingleN, k, seed)
      .localCheckpoint(eager = false)
    probe(CorpusIndex(cBase, banded(cBase, k, bands), shingleN, k, bands, seed),
      batch, idCol, textCol, threshold, roundTo)
  }

  /** (id, sorted distinct shingle set, signature) — the shared prep of
    * every LSH path (caller decides checkpoint eagerness/scope).
    */
  private def prepared(df: DataFrame, idCol: Column, textCol: Column,
                       shingleN: Int, k: Int, seed: Long): DataFrame = {
    require(k > 0, "k must be positive")
    df.select(idCol.as("id"),
        array_sort(array_distinct(TextStats.shingles(textCol, shingleN))).as("sset"))
      .withColumn("sig", signature(col("sset"), k, seed))
  }

  /** (id, band, bh) banded-index rows of a prepared base. */
  private def banded(base: DataFrame, k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, "k must divide into bands")
    val rows = k / bands
    val bandHashes = array((0 until bands).map { b =>
      struct(lit(b).as("band"), bandKey(col("sig"), b * rows, rows).as("bh"))
    }: _*)
    base.select(col("id"), explode(bandHashes).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
  }

  /** Standing corpus LSH artifact for write-once-probe-many gates: the
    * shingled+signed base and its banded index. [[buildIndex]] pins
    * both via EAGER localCheckpoint, so every probe — each micro-batch
    * of a streaming ingest, each daily batch — reads materialized
    * blocks; the corpus is shingled exactly once for its lifetime.
    * At 100 TB this is a parquet table maintained next to the corpus;
    * the local-mode checkpoint is the same artifact shape.
    */
  final case class CorpusIndex(base: DataFrame, index: DataFrame,
                               shingleN: Int, k: Int, bands: Int, seed: Long)

  def buildIndex(corpus: DataFrame, idCol: Column, textCol: Column,
                 shingleN: Int = 3, k: Int = 32, bands: Int = 8,
                 seed: Long = 42L): CorpusIndex = {
    val base = prepared(corpus, idCol, textCol, shingleN, k, seed).localCheckpoint()
    CorpusIndex(base, banded(base, k, bands).localCheckpoint(),
      shingleN, k, bands, seed)
  }

  /** PERSIST a [[CorpusIndex]] as the parquet artifact its scaladoc
    * promises: `path/base` (id, sset, sig), `path/index` (id, band,
    * bh), and `path/params.json` (the signature hyper-parameters —
    * probing with different params would silently match nothing, so
    * [[loadIndex]] refuses a mismatched artifact... by carrying them).
    * [[extend]]'s output can be saved over a new path; at 100 TB the
    * equivalent is appending the new rows to these tables.
    */
  def saveIndex(cidx: CorpusIndex, path: String): Unit = {
    cidx.base.write.mode("overwrite").parquet(s"$path/base")
    cidx.index.write.mode("overwrite").parquet(s"$path/index")
    val params = s"""{"shingleN":${cidx.shingleN},"k":${cidx.k},""" +
      s""""bands":${cidx.bands},"seed":${cidx.seed}}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "params.json"),
      params.getBytes("UTF-8"))
  }

  /** Load a persisted [[CorpusIndex]]: the frames read straight from
    * the parquet artifact (no checkpoint — the files ARE the
    * materialization), params from the manifest.
    */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                path: String): CorpusIndex = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "params.json")), "UTF-8")
    def intOf(key: String): Long = {
      val m = s""""$key"\\s*:\\s*(-?\\d+)""".r.findFirstMatchIn(txt)
      require(m.isDefined, s"params.json missing $key")
      m.get.group(1).toLong
    }
    CorpusIndex(
      spark.read.parquet(s"$path/base"),
      spark.read.parquet(s"$path/index"),
      intOf("shingleN").toInt, intOf("k").toInt, intOf("bands").toInt,
      intOf("seed"))
  }

  /** INDEX MAINTENANCE — the other half of the crawl loop: after a
    * batch is probed (and its accepted rows kept), [[extend]] folds
    * those rows into the standing index so the NEXT batch can match
    * against them. Only the new rows are shingled and signed (one
    * batch-sized checkpoint); the existing artifact's blocks are
    * UNIONED, never recomputed or copied — at 100 TB this is a
    * parquet append to the index table, and the local union of
    * checkpointed frames is the same accounting. The extended index
    * is a new value; the input index remains valid (readers of the
    * old snapshot are unaffected — the parquet-append semantics).
    */
  def extend(cidx: CorpusIndex, batch: DataFrame,
             idCol: Column, textCol: Column,
             checkDisjoint: Boolean = true): CorpusIndex = {
    if (checkDisjoint)
      Guards.requireDisjointIds(cidx.base.select(col("id")),
        batch.select(idCol), "MinHash.extend")
    val bBase = prepared(batch, idCol, textCol, cidx.shingleN, cidx.k,
      cidx.seed).localCheckpoint()
    CorpusIndex(
      cidx.base.unionByName(bBase),
      cidx.index.unionByName(banded(bBase, cidx.k, cidx.bands).localCheckpoint()),
      cidx.shingleN, cidx.k, cidx.bands, cidx.seed)
  }

  /** Probe a batch against a standing [[CorpusIndex]]: only the batch
    * is shingled and signed; the bipartite band join and the verify
    * join's corpus side read the index artifact. Output
    * (batch_id, corpus_id, jac ≥ threshold).
    */
  def probe(cidx: CorpusIndex, batch: DataFrame,
            idCol: Column, textCol: Column, threshold: Double,
            roundTo: Int = 4): DataFrame = {
    val bBase = prepared(batch, idCol, textCol, cidx.shingleN, cidx.k, cidx.seed)
      .localCheckpoint(eager = false)
    val cands = banded(bBase, cidx.k, cidx.bands).toDF("batch_id", "band", "bh")
      .join(cidx.index.toDF("corpus_id", "band", "bh"), Seq("band", "bh"))
      .select("batch_id", "corpus_id").distinct()
    cands
      .join(bBase.select(col("id").as("batch_id"), col("sset").as("set_b")), Seq("batch_id"))
      .join(cidx.base.select(col("id").as("corpus_id"), col("sset").as("set_c")), Seq("corpus_id"))
      .withColumn("jac",
        round(graft.functions.ArrayExprs.jaccardSorted(col("set_b"), col("set_c")), roundTo))
      .filter(col("jac") >= threshold)
      .select(col("batch_id"), col("corpus_id"), col("jac"))
  }
}
