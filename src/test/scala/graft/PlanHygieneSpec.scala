package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the scale-critical queries: these pin
  * the plan SHAPE (pushdown, pruning, broadcast, single-shuffle,
  * TakeOrderedAndProject), not just the result values — a correct
  * query with a quadratic or single-task plan is a regression this
  * suite must catch before a 100 TB run would.
  */
class PlanHygieneSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.Sf

  /** Execute and return the FINAL (post-AQE) physical plan string. */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, dir)

  test("q_scan_project prunes the scan to only the projected columns") {
    val plan = finalPlan(q("q_scan_project"))
    // 3-column projection over the 6-column events table: the scan's
    // ReadSchema must not include the unreferenced columns
    assert(plan.contains("ReadSchema: struct<event_id:bigint,event_type:string,value:double>"),
      s"unpruned scan in:\n$plan")
  }

  test("filters on raw columns reach the parquet scan as PushedFilters") {
    import org.apache.spark.sql.functions.col
    val df = Tables.lineitem(spark, dir)
      .filter(col("l_quantity") > 30.0)
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = finalPlan(df)
    assert(plan.contains("GreaterThan(l_quantity"), s"filter not pushed in:\n$plan")
  }

  test("q_lev_neardup pair join is block-keyed equi, never a product") {
    val plan = finalPlan(q("q_lev_neardup"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"levenshtein blocking degenerated:\n$plan")
  }

  test("q_pmi top-50 is TakeOrderedAndProject over broadcast totals, no product beyond the 1-row cross") {
    val plan = finalPlan(q("q_pmi"))
    assert(plan.contains("TakeOrderedAndProject"), s"global sort in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"product in:\n$plan")
  }

  test("q_resample calendar join is equi-keyed on (user, day), no product") {
    val plan = finalPlan(q("q_resample"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"product in:\n$plan")
  }

  test("q_skyline has NO window operator - the running max is the two-pass scan") {
    val plan = finalPlan(q("q_skyline"))
    assert(!plan.contains("Window"), s"global window crept back in:\n$plan")
  }

  test("q_shard_assign has NO window operator - the deal index is the prefix scan") {
    val plan = finalPlan(q("q_shard_assign"))
    assert(!plan.contains("Window"), s"global window crept back in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"stratum lookup should broadcast, not shuffle the corpus:\n$plan")
  }

  test("q_global_rank has NO window operator - rank comes from the prefix-sum") {
    val plan = finalPlan(q("q_global_rank"))
    assert(!plan.contains("Window"), s"global window crept back in:\n$plan")
    assert(plan.contains("HashAggregate") || plan.contains("partial"),
      s"per-value multiplicities not map-side combined:\n$plan")
  }

  test("q_ewma: block-bounded folds — a streaming row_number window, two key-bounded aggregations, no product") {
    val plan = finalPlan(q("q_ewma"))
    // the ONE window is the per-key row_number that assigns block
    // indices — a streaming (sort-based, spilling) operator with no
    // per-key buffer; the per-key history buffer the old single
    // collect_list held is gone (two aggregations: per-(key, block)
    // then per-key over block SUMMARIES)
    assert("Window \\[".r.findAllIn(plan).size <= 1,
      s"more than the block-index window in:\n$plan")
    assert(plan.contains("row_number"), s"block-index window missing in:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"product in:\n$plan")
  }

  test("q_histogram is one map-side-combinable aggregation, no window") {
    val plan = finalPlan(q("q_histogram"))
    assert(plan.contains("HashAggregate") || plan.contains("partial"),
      s"no partial aggregation in:\n$plan")
    assert(!plan.contains("Window"), s"unexpected window in:\n$plan")
  }

  test("q_pagerank per-iteration joins are equi-joins over checkpointed ranks") {
    val plan = finalPlan(q("q_pagerank"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"PR iteration degenerated to a product:\n$plan")
    // lineage is cut: the rank side scans checkpointed RDDs, not a
    // 3-iteration re-derivation of the events table
    assert(plan.contains("Scan ExistingRDD"), s"no checkpoint scan in:\n$plan")
  }

  test("q_star_join broadcasts both dims — fact table shuffles at most once") {
    val plan = finalPlan(q("q_star_join"))
    assert(plan.contains("BroadcastHashJoin"), s"dims not broadcast in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"fact-side merge join in:\n$plan")
  }

  test("q_topk compiles to TakeOrderedAndProject, never a global sort") {
    val plan = finalPlan(q("q_topk"))
    assert(plan.contains("TakeOrderedAndProject"), s"no top-k operator in:\n$plan")
  }

  test("q_semi_join and q_anti_join stay semi/anti — no row-multiplying join") {
    assert(finalPlan(q("q_semi_join")).contains("LeftSemi"))
    assert(finalPlan(q("q_anti_join")).contains("LeftAnti"))
  }

  test("q_asof_join shuffles the union exactly once on the join key") {
    val plan = finalPlan(q("q_asof_join"))
    // exchange budget: one for the query's own marks groupBy, ONE for
    // the as-of keyed window, one for the final orderBy's range
    // partitioning — anything more means the as-of degenerated
    val exchanges = "Exchange (hash|range)partitioning".r.findAllIn(plan).size
    assert(exchanges <= 3, s"$exchanges exchanges in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of fell back to a product join:\n$plan")
    // and the carrying window must be keyed, never global
    val globalWindow = "Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan)
    assert(globalWindow.isEmpty, s"global window in:\n$plan")
  }

  test("q_sessionize partitions its windows by user — no global window") {
    val plan = finalPlan(q("q_sessionize"))
    // a Window with an empty partition spec funnels ALL rows to 1 task
    assert(!plan.contains("WindowExec: No Partition Defined"))
    val globalWindow = "Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan)
    assert(globalWindow.isEmpty, s"global window in:\n$plan")
  }

  test("partitioned payload numbering plans zero unpartitioned windows") {
    val plan = finalPlan(q("q_payload_build_part"))
    // its window is partitioned on __pid; an EMPTY partition spec
    // (all rows to one task) is the regression this guards against
    val globalWindow = "Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan)
    assert(globalWindow.isEmpty, s"global window in:\n$plan")
  }

  test("q_dedup window partitions on the dedup key") {
    val plan = finalPlan(q("q_dedup"))
    val globalWindow = "Window \\[[^\\]]*\\], \\[\\]".r.findFirstIn(plan)
    assert(globalWindow.isEmpty, s"global window in:\n$plan")
  }

  test("q_group_agg does a partial (map-side) aggregate before the shuffle") {
    val plan = finalPlan(q("q_group_agg"))
    assert(plan.contains("HashAggregate"), s"no hash agg in:\n$plan")
    // partial_ functions appear only in the pre-shuffle partial pass
    assert(plan.contains("partial_"), s"no map-side combine in:\n$plan")
  }

  test("q_range_join is an equi-join on the bucket key, not a product") {
    val plan = finalPlan(q("q_range_join"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join degenerated to a product:\n$plan")
  }

  test("q_null_safe_join broadcasts the dim like any equi-join") {
    val plan = finalPlan(q("q_null_safe_join"))
    assert(plan.contains("BroadcastHashJoin"), s"dim not broadcast in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"null-safe comparison fell off the hash-join path:\n$plan")
  }

  test("q_stat_agg keeps moment aggregates map-side combinable") {
    val plan = finalPlan(q("q_stat_agg"))
    assert(plan.contains("partial_"), s"no map-side combine in:\n$plan")
  }

  test("q_pii_redact is expression-only: no join, no agg, fused regex counts") {
    val plan = finalPlan(q("q_pii_redact"))
    assert(!plan.contains("Join") && !plan.contains("HashAggregate"),
      s"scrub grew a join/agg:\n$plan")
    // the injected RewriteRegexpCount rule fused the three audit counts
    assert(plan.contains("regexpcount"), s"audit counts not fused:\n$plan")
    // the only shuffle is the deterministic output ORDER BY
    assert(!plan.contains("Exchange hashpartitioning"),
      s"unexpected hash shuffle in:\n$plan")
  }

  test("q_token_count runs the fused RegexpCount kernel") {
    assert(finalPlan(q("q_token_count")).contains("regexpcount"))
  }

  test("q_tfidf: per-doc top-k is group-limited; the term-df side broadcasts") {
    val plan = finalPlan(q("q_tfidf"))
    // rank<=k pushed into WindowGroupLimit (partial per-partition
    // top-k before the window shuffle — the 'never a global sort' shape)
    assert(plan.contains("WindowGroupLimit"), s"no group limit in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"df side not broadcast in:\n$plan")
  }

  test("q_repetition evaluates doc-level stats below the explode") {
    // ExtractGenerator leaves non-generator expressions in the
    // Project ABOVE Generate; dup_token_frac must enter Generate as a
    // pre-computed attribute or the token stats re-run per gram row
    // (measured 3x on the whole query)
    val plan = finalPlan(q("q_repetition"))
    assert(plan.contains("explode(__grams"), s"doc-level projection not below Generate:\n$plan")
  }

  test("q_decontaminate joins grams against a broadcast benchmark set") {
    val plan = finalPlan(q("q_decontaminate"))
    assert(plan.contains("BroadcastHashJoin"), s"bench probe not broadcast in:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"gram probe degenerated:\n$plan")
  }

  test("q_semdedup pair join is cell-keyed equi, never a product") {
    val plan = finalPlan(q("q_semdedup"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"cell blocking degenerated:\n$plan")
  }

  test("q_sparse_sim postings join is term-keyed equi, never a product") {
    val plan = finalPlan(q("q_sparse_sim"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"inverted index degenerated:\n$plan")
  }

  test("q_pit_join stays a union+window carry — no interval nested-loop") {
    val plan = finalPlan(q("q_pit_join"))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"as-of carry degenerated:\n$plan")
  }

  test("q_zorder is a pure narrow projection over the scan") {
    val plan = finalPlan(q("q_zorder"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"z-value needs no hash shuffle:\n$plan")
  }

  test("q_sparse_topk rank filter plans as WindowGroupLimit, no full sort") {
    val plan = finalPlan(q("q_sparse_topk"))
    assert(plan.contains("WindowGroupLimit"), s"no group limit in:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"product in:\n$plan")
  }

  test("q_media_neardup: band join is equi-keyed, cap list broadcasts, one hash pass") {
    val plan = finalPlan(q("q_media_neardup"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"banded join degenerated:\n$plan")
    // the surviving-bucket list joins as a broadcast semi
    assert(plan.contains("LeftSemi"), s"no semi cap join in:\n$plan")
    // the decode+hash UDF pass materializes once (lazy checkpoint):
    // the executed plan scans the checkpoint RDD, not parquet 3x
    assert(!plan.contains("Scan parquet"),
      s"hash table recomputed from source per consumer:\n$plan")
  }

  test("q_audio_neardup shares the banded shape (no product, semi cap)") {
    val plan = finalPlan(q("q_audio_neardup"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerated:\n$plan")
    assert(plan.contains("LeftSemi"), s"no semi cap join in:\n$plan")
  }

  test("q_sem_decontam: bench side broadcasts on the cell equi-key; corpus never shuffles") {
    val plan = finalPlan(q("q_sem_decontam"))
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join in:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerated:\n$plan")
    // the corpus side reaches the join without an exchange: the only
    // hash exchanges allowed are for the final orderBy (range)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"corpus shuffled for the probe join:\n$plan")
  }

  test("q_hard_negatives: anchors broadcast, rank is a per-query window") {
    val plan = finalPlan(q("q_hard_negatives"))
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), s"anchors not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), s"product in:\n$plan")
  }

  test("q_hard_negatives_ivf: the cell join is a broadcast EQUI-join — the nested loop is retired") {
    val plan = finalPlan(q("q_hard_negatives_ivf"))
    // the brute form's label-mismatch predicate forces a broadcast
    // nested loop over the whole corpus per anchor; the IVF form joins
    // on the cell id — per-anchor work is the probed pool
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast equi-join in:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"nested loop survived:\n$plan")
  }

  test("q_cap_audit is one map-side-combinable aggregation, no join") {
    val plan = finalPlan(q("q_cap_audit"))
    assert(plan.contains("partial_count") || plan.contains("Partial"),
      s"no partial aggregate in:\n$plan")
    assert(!plan.contains("Join"), s"audit should not join:\n$plan")
  }

  test("q_ivfpq_batch: the ADC lookup table stays BELOW the probe explode") {
    // the ExtractGenerator trap: an expression in the same select as
    // explode() lands in the Project ABOVE Generate — re-evaluated per
    // exploded row, and (for the m·ks-entry LUT) historically past
    // Janino's method limit, silently dropping the stage to
    // interpreted. Parent nodes print first, so the Generate line must
    // precede the PqLut reference that feeds it.
    val plan = finalPlan(q("q_ivfpq_batch"))
    val gen = plan.indexOf("Generate")
    val lut = plan.toLowerCase.indexOf("pqlut")
    assert(gen >= 0 && lut >= 0, s"missing Generate/PqLut in:\n$plan")
    assert(gen < lut, s"LUT computed above the explode:\n$plan")
  }

  test("q_bpe_apply joins the vocab by broadcast — the corpus never shuffles for the join") {
    val plan = finalPlan(q("q_bpe_apply"))
    assert(plan.contains("BroadcastHashJoin"), s"vocab not broadcast in:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"corpus-side merge join in:\n$plan")
  }

  test("q_audio_resample decodes below the explode — one decode per clip, not per rate") {
    // the decode+resample UDF must sit BELOW Generate (parent nodes
    // print first): in the Project above it would re-run per exploded
    // rate row — decode ×|rates| instead of ×1
    val plan = finalPlan(q("q_audio_resample"))
    val gen = plan.indexOf("Generate")
    val udfIdx = plan.indexOf("UDF")
    assert(gen >= 0 && udfIdx >= 0, s"missing Generate/UDF in:\n$plan")
    assert(gen < udfIdx, s"decode UDF computed above the explode:\n$plan")
  }

  test("q_embed_drift collapses each snapshot before any join") {
    val plan = finalPlan(q("q_embed_drift"))
    // occupancy is a cell-keyed aggregate; the join is over <= 16 rows
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerated:\n$plan")
  }

  test("repeatGroups (uncached build) group join is sort-merge, never broadcast/product") {
    // the repeat-class stats table is corpus-sized in the worst case
    // and RDD-derived (no stats): the join back to members must stay
    // the spill-safe sort-merge — a broadcast here OOM'd the ×64 curve.
    // Pin the UNCACHED build: q_sa_repeats itself reads the session
    // artifact (SessionArtifactCache eagerly localCheckpoints, so the
    // query's visible plan is Scan ExistingRDD + sort and can never
    // show the build's SMJ)
    import org.apache.spark.sql.functions.col
    val plan = finalPlan(
      ops.SuffixArray.repeatGroups(
        Tables.documents(spark, dir), col("doc_id"), col("text"), minLen = 32))
    assert(plan.contains("SortMergeJoin"), s"group join not SMJ:\n$plan")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerated:\n$plan")
  }

  test("q_sa_repeats cached read never degenerates to a product") {
    // the query-visible plan after the artifact checkpoint: a cached
    // read plus the output sort — no join of any kind should survive
    val plan = finalPlan(q("q_sa_repeats"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerated:\n$plan")
  }

  test("q_knn_graph pair join is cell-keyed equi, never a product") {
    // the graph build's candidate set is same-cell pairs — a product
    // here is corpus² and the exact failure blocking exists to avoid
    val plan = finalPlan(q("q_knn_graph"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerated:\n$plan")
  }

  test("q_graph_ann walk never degenerates to a product") {
    // the walk's rounds run under per-round frontier checkpoints
    // (round-12: an unbroken lineage re-scanned the corpus-sized edge
    // table 2^(rounds−1) times), so the final plan is the last
    // ranking over a checkpoint read — no join of any kind survives
    // (the q_sa_repeats repointing precedent); the
    // frontier-broadcasts-per-round shape is the op's documented
    // internal contract, row-verified by KnnGraphSpec's replays
    val plan = finalPlan(q("q_graph_ann"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerated:\n$plan")
  }

  test("q_knn_refine and q_knn_extend never degenerate to a product") {
    // refine's two-hop join and extend's new-side probe pairs are both
    // equi-keyed; a product here is the corpus² failure the candidate
    // discipline exists to avoid
    for (name <- Seq("q_knn_refine", "q_knn_extend")) {
      val plan = finalPlan(q(name))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"$name degenerated:\n$plan")
    }
  }

  test("round-12 graph queries: no products; layered entry is the one bounded BNLJ") {
    // q_knn_converged (checkpointed fixed point + sort), q_curate_sem
    // (equi gates + CC components + anti-join) and q_graph_cap_audit
    // (one aggregation) must never degenerate to a product
    for (name <- Seq("q_knn_converged", "q_curate_sem", "q_graph_cap_audit")) {
      val plan = finalPlan(q(name))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"$name degenerated:\n$plan")
    }
    // q_graph_ann_layered's entry stage is a deliberate bounded scan
    // (corpus/entryStep rows against the broadcast query panel — a
    // BroadcastNestedLoopJoin by construction), but it runs under the
    // entry checkpoint; the FINAL plan, like q_graph_ann's, is the
    // last ranking over a checkpoint read with no surviving join
    val plan = finalPlan(q("q_graph_ann_layered"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerated:\n$plan")
  }

  test("q_tfidf_standing and q_dedup_keep_best never degenerate to a product") {
    // standing-df scoring is one vocab-keyed (broadcastable) join;
    // keep-best is banded pairs + CC + a cluster-keyed window + one
    // anti-join — all equi-keyed
    for (name <- Seq("q_tfidf_standing", "q_dedup_keep_best")) {
      val plan = finalPlan(q(name))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"$name degenerated:\n$plan")
    }
  }

  test("q_sa_shard_scrub completion pass keeps equi joins only") {
    // the sharded miner's fingerprint completion (hash groups, literal
    // verification, member anti-join) and the scrub covers are all
    // equi-keyed; the corpus must never cross-join itself
    val plan = finalPlan(q("q_sa_shard_scrub"))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"degenerated:\n$plan")
  }

  test("q_sa_ranks final round has no join and no corpus-wide window") {
    // the visible plan is the last scan-ranked round over its pinned
    // sort: rank attach is the PrefixScan map (no rank-table join),
    // and the only windows in the whole op are per-document (lead)
    // and per-alphabet (char ranks) — a global ORDER BY window would
    // print as 'Window [..]' with no PartitionBy inside this plan
    val plan = finalPlan(q("q_sa_ranks"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin") &&
      !plan.contains("CartesianProduct"),
      s"rank attach regressed to a join:\n$plan")
  }

  test("inventory extend probe: standing fps is bloom-pruned below its exchange") {
    // the corpus-sized standing side must carry the batch-hash bloom
    // probe in its scan-side filter — without it every crawl batch
    // re-shuffles the whole standing fingerprint table. Assert on the
    // candidate-stage plan extendRepeatGroups ACTUALLY executes
    // (SuffixArray.extendCandidates — the factored step (2), shared
    // code, exposed precisely so the eager checkpoint can't hide it),
    // not a synthetic prefilter replica.
    import org.apache.spark.sql.functions.col
    val d = Tables.documents(spark, dir)
    val standing = graft.ops.SuffixArray.trainRepeatGroups(
      d.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"), 32)
    // the batch fps via the same public trainer (gramFps is ops-private)
    val fpsNew = graft.ops.SuffixArray.trainRepeatGroups(
      d.filter(col("doc_id") % 2 === 1), col("doc_id"), col("text"), 32).fps
    val cand = graft.ops.SuffixArray.extendCandidates(standing.fps, fpsNew)
    val plan = cand.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"extend's candidate stage lost the bloom prune:\n$plan")
    // the prune sits on the STANDING side BELOW its exchange: the
    // might_contain filter appears after (deeper than) the last
    // Exchange in the plan text — i.e. some Exchange has the filter
    // in its subtree
    val exIdx = plan.indexOf("Exchange")
    val bloomIdx = plan.indexOf("might_contain")
    assert(exIdx >= 0 && bloomIdx > exIdx,
      s"bloom filter not below the exchange:\n$plan")
    // and the real extend over the same inputs still folds members
    val ext = graft.ops.SuffixArray.extendRepeatGroups(standing,
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1),
      col("doc_id"), col("text"))
    assert(ext.members.count() > 0)
  }

  test("q_winnow_decontam and q_leakage_split never degenerate to a product") {
    for (name <- Seq("q_winnow_decontam", "q_leakage_split")) {
      val plan = finalPlan(q(name))
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"), s"$name degenerated:\n$plan")
    }
  }

  test("incremental winnow probe: standing fps bloom-pruned; round-14 pair queries stay equi-join") {
    // the standing side of dupPairsAgainst must carry the batch-hash
    // bloom probe (without it every crawl batch re-shuffles the whole
    // standing fingerprint table), and none of the round's pair paths
    // may degenerate to a product
    val plan = finalPlan(q("q_incr_winnow_pairs"))
    assert(plan.contains("might_contain"),
      s"incremental probe lost the bloom prune:\n$plan")
    for (name <- Seq("q_incr_winnow_pairs", "q_winnow_pairs_capped",
        "q_winnow_cap_audit", "q_leakage_split_verbatim",
        "q_keep_best_verbatim")) {
      val p = finalPlan(q(name))
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoopJoin"), s"$name degenerated:\n$p")
    }
  }

}
