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
}
