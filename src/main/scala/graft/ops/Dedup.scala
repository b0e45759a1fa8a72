package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Deduplication (operators D1/D2 and E1-exact in SURVEY.md §2.3/§2.9).
  *
  * D1 — priority dedup-key derivation (reference:
  * batch/dynamo_fetcher.py:332-349): first present url-like key
  * (`url, link, source_url, guid`; value lower-cased + trimmed, tagged
  * with a "url:" namespace) else first present id-like key
  * (`id, pk, record_id, article_id`; stringified, tagged "id:").
  * Keys are probed case-insensitively (the reference probes exact case
  * then `Capitalize`d — schema-level case-insensitive resolution
  * subsumes both probes).
  *
  * D2 — first-wins elimination (dynamo_fetcher.py:199-203,352-360).
  * The reference's "first" is scan order, which Spark does not have;
  * per SURVEY §7 we impose an explicit total order on a caller-supplied
  * stable key — the one intentional semantic refinement. Keyless rows
  * are never deduplicated (dynamo_fetcher.py:349-351): they get a
  * per-row surrogate key derived from the order column.
  *
  * Scale: `dropDuplicates` is order-nondeterministic, so we use
  * window + row_number — a hash shuffle on the dedup key that spills via
  * UnsafeExternalSorter; this replaces the reference's unbounded
  * in-memory Python `set` and is the 100 TB fix (SURVEY §4).
  */
object Dedup {

  val UrlKeys: Seq[String] = Seq("url", "link", "source_url", "guid")
  val IdKeys: Seq[String]  = Seq("id", "pk", "record_id", "article_id")

  private def nonEmpty(c: Column): Column = {
    val t = trim(c.cast(StringType))
    when(t === "", lit(null: String)).otherwise(t)
  }

  /** D1: namespaced priority dedup key; NULL when no candidate present/
    * non-empty (the reference returns None → row kept un-deduped).
    */
  def dedupKey(df: DataFrame): Column = {
    val byLower = Schemas.byLowerName(df)
    val urls = UrlKeys.flatMap(byLower.get).map(n =>
      concat(lit("url:"), lower(nonEmpty(col(n)))))
    val ids = IdKeys.flatMap(byLower.get).map(n =>
      concat(lit("id:"), nonEmpty(col(n))))
    val all = urls ++ ids
    if (all.isEmpty) lit(null).cast(StringType) else coalesce(all: _*)
  }

  /** D2: deterministic first-wins dedup on `key`, ordered by `order`
    * (ascending). Rows with NULL key are ALWAYS kept: they get a
    * forced rank of 1 instead of competing in a window, so two
    * keyless rows sharing an `order` value (order is stable, not
    * unique) can no longer collapse into one. The partition key
    * namespaces real keys ("k:") apart from the keyless surrogate
    * ("null:"), so a real key that happens to look like a surrogate
    * cannot land in a keyless row's partition and lose its rank-1.
    */
  def firstWins(df: DataFrame, key: Column, order: Column): DataFrame = {
    val k = when(key.isNull,
      concat(lit("null:"), order.cast(StringType)))
      .otherwise(concat(lit("k:"), key))
    val w = Window.partitionBy(k).orderBy(order.asc)
    df.withColumn("__rn",
        when(key.isNull, lit(1)).otherwise(row_number().over(w)))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** D1+D2 composed over the priority key vocabulary. */
  def dedupItems(df: DataFrame, order: Column): DataFrame =
    firstWins(df, dedupKey(df), order)

  /** E1 exact text dedup at scale: hash-groupBy on a content
    * fingerprint (sha-free md5 is enough for grouping; collisions at
    * 100 TB would be verified by a follow-up equality check).
    * Returns one row per distinct normalized text with the surviving
    * (minimum) id and the duplicate count — a map-side-combinable
    * aggregation, no window needed.
    */
  def exactTextGroups(df: DataFrame, textCol: Column, idCol: Column): DataFrame =
    df.select(md5(lower(trim(textCol))).as("fp"), idCol.as("id"))
      .groupBy(col("fp"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("dup_cnt"))

  /** E1 as a filter: keep only the first (min-id) row per normalized
    * text — the production "drop exact dups from the corpus" shape.
    * Implemented as an aggregation + semi-join (both map-side
    * combinable) rather than a window, so AQE can pick a broadcast
    * semi-join when the survivor set is small.
    */
  def exactTextDedup(df: DataFrame, textCol: Column, idCol: Column): DataFrame = {
    val keep = exactTextGroups(df, textCol, idCol).select(col("keep_id"))
    df.join(keep, idCol === col("keep_id"), "left_semi")
  }

  /** Incremental ingest dedup: rows of `batch` whose normalized text
    * is NOT already in `corpus` — the "dedup the new crawl against
    * the existing corpus" shape that incremental pipelines need
    * (re-deduplicating the full corpus per ingest is O(total), this
    * is O(batch + corpus-fingerprint scan)).
    *
    * Scale shape: a left_anti join on the content fingerprint. Both
    * sides project to (fp) / (fp, row) before the exchange, so the
    * shuffled bytes are fingerprints, not documents; when the batch
    * is small relative to the corpus, AQE turns the batch side into
    * the broadcast build. The corpus side would normally BE a stored
    * fingerprint table (exactTextGroups output) maintained across
    * ingests — passing raw documents works but re-fingerprints.
    *
    * NULL text: a NULL-text batch row is vacuously new (kept — its
    * fingerprint is NULL and a NULL key never matches in left_anti),
    * and NULL-text corpus rows are excluded from the seen set
    * EXPLICITLY so the semantics don't ride on join null-handling
    * (a SQL `NOT IN` with a NULL in the subquery would instead
    * return nothing — the classic three-valued-logic trap).
    * Fingerprint collisions: md5 grouping tolerates ~n²/2^129
    * false merges — zero in practice; a colliding pair would drop a
    * genuinely new document, the same tolerance class as the
    * xxhash64 windows in [[SubstringDedup]].
    */
  def incrementalNew(batch: DataFrame, corpus: DataFrame,
                     textCol: Column): DataFrame = {
    val seen = corpus.filter(textCol.isNotNull)
      .select(md5(lower(trim(textCol))).as("__fp")).distinct()
    batch.join(seen, md5(lower(trim(textCol))) === col("__fp"), "left_anti")
  }

  /** KEEP-BEST near-dup dedup (E1∘E11): near-duplicate clusters keep
    * their highest-QUALITY member instead of the lowest id — the
    * policy a production pipeline actually wants (the canonical copy
    * of a boilerplate-mangled article family is the cleanest one, not
    * the first-crawled one). Clusters come from the banded-MinHash
    * near-dup pairs ([[MinHash.nearDupPairs]], exact-Jaccard-verified)
    * closed by [[ConnectedComponents]]; within a cluster the keeper is
    * argmax [[TextStats.qualityScore]] with the (quality DESC, id ASC)
    * total order, so the choice is deterministic and oracle-replayable.
    * Documents in no cluster survive untouched. Output: one row per
    * SURVIVOR, (id, quality).
    *
    * Scale shape: everything here is the already-bounded machinery —
    * LSH-banded pairs (never corpus²), O(log diameter) CC rounds, one
    * doc-keyed quality projection, a cluster-keyed window over cluster
    * members only (a vanishing fraction of the corpus), one anti-join.
    */
  def keepBestNearDup(docs: DataFrame, idCol: Column, textCol: Column,
                      threshold: Double = 0.3): DataFrame =
    keepBestByPairs(docs, idCol, textCol,
      MinHash.nearDupPairs(docs, idCol, textCol, threshold))

  /** The keep-best POLICY over ANY near-dup pair table — the second
    * half of [[keepBestNearDup]], factored out so every E1 detector's
    * evidence (MinHash, SimHash, embedding-cosine, verbatim
    * substring) keys the same canonical-copy rule: [[
    * ConnectedComponents]] closes `pairs` (id_a, id_b) into clusters,
    * each cluster keeps its argmax-[[TextStats.qualityScore]] member
    * under the (quality DESC, id ASC) total order, unpaired documents
    * survive untouched. `cacheKey` routes the closure through the
    * session-shared cluster artifact ([[ConnectedComponents
    * .sharedComponents]]) — the SAME table the leakage-safe split and
    * dup-cluster report read, one propagation per (session, pair
    * table). Output: one row per SURVIVOR, (id, quality).
    */
  def keepBestByPairs(docs: DataFrame, idCol: Column, textCol: Column,
                      pairs: DataFrame,
                      cacheKey: Option[String] = None): DataFrame = {
    val comp = ConnectedComponents.sharedComponents(pairs, "id_a", "id_b",
      cacheKey)
    val scored = docs.select(idCol.as("id"),
      TextStats.qualityScore(textCol).as("quality"))
    val byBest = Window.partitionBy(col("comp"))
      .orderBy(col("quality").desc, col("id").asc)
    val losers = scored.join(comp, Seq("id"))
      .withColumn("rn", row_number().over(byBest))
      .filter(col("rn") > 1)
      .select(col("id"))
    scored.join(losers, Seq("id"), "left_anti")
  }
}
