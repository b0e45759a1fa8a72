package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime enforcement of the standing-index maintenance
  * preconditions. Every monotone index fold (MinHash, winnowed
  * fingerprints, repeat inventories, the k-NN graph, the semantic
  * gate's bench table) requires the batch's ids DISJOINT from the
  * standing ids: a re-crawled duplicate id silently corrupts the
  * artifact — double-counted fingerprints, aliased pair members, a
  * vector paired against its own stale copy. Scaladoc convention
  * alone leaves that door open; this is the cheap loud check (the
  * `Sharding.assign` raise-on-violation precedent), opt-out for
  * callers that can PROVE disjointness (monotone crawl ids, shifted
  * replay ids).
  */
private[graft] object Guards {

  /** Throw (IllegalArgumentException, naming a colliding id) unless
    * the batch's ids are disjoint from the standing ids. One bounded
    * job: the standing id column is scanned once with the batch's
    * distinct ids as a BROADCAST semi-probe — the corpus side never
    * shuffles, and the probe short-circuits at the first collision
    * (`limit(1)`). At 100 TB the standing side is the index's own
    * bucketed id column, so the scan prunes to the probed buckets.
    */
  def requireDisjointIds(standingIds: DataFrame, batchIds: DataFrame,
                         what: String): Unit = {
    val s = standingIds.toDF("__gid")
    val b = batchIds.distinct().toDF("__gbid")
    val hit = s.join(broadcast(b), col("__gid") === col("__gbid"), "left_semi")
      .limit(1).collect()
    require(hit.isEmpty,
      s"$what: batch ids must be disjoint from standing ids (standing id " +
        s"${hit.headOption.map(_.get(0)).getOrElse("")} reappears in the " +
        "batch — folding a re-crawled duplicate would silently corrupt " +
        "the artifact). Callers that can prove disjointness opt out via " +
        "checkDisjoint = false.")
  }

  /** The guard folded INTO a scan the caller already pays for
    * (guide §1.2 — the per-fold guard JOB was a measured cost of the
    * crawl twins): decorate the standing side with a broadcast
    * batch-id hit marker and wrap `wrapColName` (a payload column the
    * surrounding query provably evaluates on EVERY standing row —
    * e.g. the embedding feeding an unconditional explode) so that a
    * colliding row's first payload evaluation raises instead. Zero
    * extra jobs and no separate standing scan; the failure surfaces
    * when the surrounding query first materializes the standing side
    * (eager checkpoint → still at fold time), wrapped in Spark's job
    * failure rather than an eager IllegalArgumentException — equally
    * loud, same message.
    *
    * The wrap is load-bearing: a filter that merely tested the id
    * could be pushed below or reordered away by the optimizer; a
    * payload column REWRITTEN through the guard cannot be bypassed by
    * any plan that consumes the payload.
    */
  def disjointIdsRide(standing: DataFrame, idColName: String,
                      wrapColName: String, batchIds: DataFrame,
                      what: String): DataFrame = {
    val hits = batchIds.distinct().toDF("__gbid")
    val msg = concat(
      lit(s"$what: batch ids must be disjoint from standing ids (standing id "),
      col(idColName).cast("string"),
      lit(" reappears in the batch — folding a re-crawled duplicate would " +
        "silently corrupt the artifact). Callers that can prove " +
        "disjointness opt out via checkDisjoint = false."))
    standing
      .join(broadcast(hits), col(idColName) === col("__gbid"), "left_outer")
      .withColumn(wrapColName,
        when(col("__gbid").isNull, col(wrapColName)).otherwise(raise_error(msg)))
      .drop("__gbid")
  }
}
