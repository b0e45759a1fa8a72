package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step of every large-scale dedup pipeline: near-dup PAIRS (from
  * MinHash/SimHash/embedding blocking) become dup CLUSTERS, and one
  * representative per cluster survives.
  *
  * Algorithm: min-label propagation with pointer jumping. Every node
  * starts labeled with its own id; each round a node adopts the
  * minimum of (its label, its neighbors' labels, its label's label).
  * The last term — pointer jumping, `comp ← comp[comp]` — halves the
  * remaining propagation distance every round, so convergence is
  * O(log diameter) rounds instead of O(diameter) (the doubling trick
  * of Shiloach–Vishkin / the MapReduce CC literature, e.g. Kiveris et
  * al., SoCC'14). At fixpoint each component is labeled by its minimum
  * member id — a unique, deterministic result (oracle-comparable:
  * DuckDB recursive-CTE transitive closure + GROUP BY min).
  *
  * Scale shape per round: one edges⋈labels join, one labels⋈labels
  * join (both equi-joins on partitioned keys), one min-groupBy — all
  * shuffle-based, no driver-side graph state. Convergence detection is
  * folded into the same aggregate (each node's previous label rides
  * along; a cache-local emptiness probe afterwards touches no shuffle).
  * Lineage is cut every round (`localCheckpoint`), otherwise the plan
  * doubles per iteration.
  */
object ConnectedComponents {

  /** @param pairs  undirected edges, one row per pair
    * @param aCol   first endpoint column name
    * @param bCol   second endpoint column name
    * @param maxIter safety cap on propagation rounds; the loop exits
    *                as soon as a round changes no label
    * @return (id, comp) — comp is the minimum id in the component.
    *         Only nodes that appear in `pairs` are emitted (isolated
    *         nodes are their own singleton component by definition).
    */
  def components(pairs: DataFrame, aCol: String, bCol: String,
                 maxIter: Int = 20): DataFrame =
    componentsWithRounds(pairs, aCol, bCol, maxIter)._1

  /** [[components]] behind the session artifact cache — the cluster
    * table is the write-once artifact EVERY pair-keyed policy reads
    * (dup-cluster reporting, leakage-safe splitting, keep-best
    * canonicalization), so one propagation per (session, pair-plan
    * semantics) serves them all; the first toucher is charged the
    * build (the `sharedGraph` accounting). Keyed on the pair table's
    * SEMANTIC plan — two different pair tables (different detector,
    * threshold, corpus) can never alias each other's clusters.
    */
  def sharedComponents(pairs: DataFrame, aCol: String, bCol: String,
                       cacheKey: Option[String] = None,
                       maxIter: Int = 20): DataFrame =
    cacheKey match {
      case None => components(pairs, aCol, bCol, maxIter)
      case Some(src) => SessionArtifactCache.getOrBuild(
        pairs.select(col(aCol), col(bCol)),
        tag = s"cc_components:$src", params = s"maxIter=$maxIter",
        // the propagation's own final-round snapshot is redundant
        // once the cache's checkpoint materializes — drop it, or two
        // full copies of the cluster table outlive the build
        onBuilt = unpersistCheckpoint) {
        components(pairs, aCol, bCol, maxIter)
      }
    }

  /** [[components]] plus the number of propagation rounds it took —
    * the observable the O(log diameter) claim rests on (the
    * convergence-shape spec pins it on a long path graph).
    */
  def componentsWithRounds(pairs: DataFrame, aCol: String, bCol: String,
                           maxIter: Int = 20): (DataFrame, Int) = {
    val edges = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .unionByName(pairs.select(col(bCol).as("u"), col(aCol).as("v")))
      .distinct()
      .persist()
    var labels = edges.select(col("u").as("id"))
      .distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    var prevLabels: DataFrame = null
    while (!converged && i < maxIter) {
      val viaEdges = edges
        .join(labels, edges("u") === labels("id"))
        .select(col("v").as("id"), col("comp"))
      // pointer jump: every comp is itself a node id, so resolve its
      // current label and adopt that too
      val viaJump = labels.as("x")
        .join(labels.as("y"), col("x.comp") === col("y.id"))
        .select(col("x.id").as("id"), col("y.comp").as("comp"))
      // LAZY checkpoint: the convergence probe below is the round's one
      // and only job — it materializes the checkpoint as it scans, so a
      // round never pays a separate eager-materialization pass
      val next = labels.withColumn("__self", lit(1))
        .unionByName(viaEdges.withColumn("__self", lit(0)))
        .unionByName(viaJump.withColumn("__self", lit(0)))
        .groupBy(col("id"))
        .agg(min(col("comp")).as("comp"),
          max(when(col("__self") === 1, col("comp"))).as("__prev"))
        .localCheckpoint(eager = false)
      converged = next.filter(col("comp") =!= col("__prev")).limit(1).count() == 0L
      // `next` is materialized by the probe above, so the PREVIOUS
      // round's checkpoint blocks are dead weight from here on — drop
      // them, or up to maxIter cached label snapshots pile up in the
      // block manager for the life of the session (real executor-memory
      // pressure at dedup scale). The round-1 input (the eager initial
      // checkpoint) is dropped on the first pass; the final round's
      // snapshot survives, backing the returned DataFrame. NB: this
      // must happen at the RDD level — Dataset.unpersist only clears
      // CacheManager entries, and localCheckpoint blocks live on the
      // checkpointed RDD itself.
      if (prevLabels != null) unpersistCheckpoint(prevLabels)
      prevLabels = labels
      labels = next.select(col("id"), col("comp"))
      i += 1
    }
    // the loop unpersists round i-2 inside the body, so at exit the
    // SECOND-TO-LAST round's snapshot is still live — drop it too;
    // only the final round's snapshot (backing the returned frame)
    // survives
    if (prevLabels != null) unpersistCheckpoint(prevLabels)
    edges.unpersist(blocking = false)
    (labels, i)
  }

  /** The standing CLUSTER artifact — the one member of the
    * standing-index family every E1 evidence stream terminates in
    * (near-dup pairs → dup clusters → keep-best / leakage splits /
    * reports), with the full train / extend / save / load loop the
    * other indexes follow (MinHash, WinnowIndex, VerbatimIndex, the
    * k-NN graph). `labels` is the (id, comp) table at [[components]]'
    * fixpoint; `maxIter` rides along as the propagation bound new
    * evidence folds under.
    */
  final case class ClusterIndex(labels: DataFrame, maxIter: Int)

  /** Train the standing cluster table: one full [[components]]
    * propagation over the corpus's pair evidence.
    */
  def train(pairs: DataFrame, aCol: String, bCol: String,
            maxIter: Int = 20): ClusterIndex =
    ClusterIndex(components(pairs, aCol, bCol, maxIter), maxIter)

  /** INDEX MAINTENANCE for the cluster table — fold a batch of new
    * pair evidence WITHOUT re-propagating the standing pairs, at
    * O(batch + touched components):
    *
    *  - each batch endpoint resolves to its standing component label
    *    (novel ids label themselves) — the standing table is probed
    *    by a BROADCAST semi-join on the batch's ids, so the corpus
    *    side never shuffles (the `dupPairsAgainst` accounting);
    *  - a SUPER-GRAPH over those labels (O(batch) edges) runs the
    *    same min-label propagation: a pair internal to one component
    *    is a self-edge no-op, a bridging pair min-label-merges only
    *    the touched labels, novel ids join or start components;
    *  - the standing table is updated by a broadcast remap keyed on
    *    the (≤ touched-labels-sized) label changes — a narrow
    *    map-side decoration, no shuffle — plus the novel rows.
    *
    * Provably == [[components]] over (old pairs ∪ new pairs): a
    * standing label is the MIN member id of its component, so the
    * merged super-component's min over {standing labels, novel ids}
    * IS the merged component's min over all member ids — spec-pinned
    * at two split points. Unlike the other indexes' extends,
    * RE-FOLDED evidence is harmless: a duplicate pair resolves to a
    * self-edge and merges nothing (min-label merge is idempotent and
    * commutative), so no disjoint-id precondition exists here —
    * spec-pinned too.
    *
    * The returned labels view is LAZY (base scan + broadcast remap);
    * callers that fold repeatedly (a crawl loop) should cut lineage
    * per batch (`localCheckpoint`) — at 100 TB the standing table is
    * a bucketed parquet table and the remap a metadata-sized rewrite.
    */
  def extendIndex(idx: ClusterIndex, newPairs: DataFrame,
                  aCol: String, bCol: String): ClusterIndex = {
    val e = newPairs.select(col(aCol).as("u"), col(bCol).as("v"))
    val ids = e.select(col("u").as("pid"))
      .unionByName(e.select(col("v").as("pid"))).distinct()
    // standing labels of the batch's endpoints — batch-bounded rows,
    // corpus side streamed once, never shuffled
    val touched = idx.labels
      .join(broadcast(ids), col("id") === col("pid"), "left_semi")
    // resolve endpoints: standing comp, else the novel id itself.
    // `touched` is batch-bounded, so both resolution joins broadcast.
    val res = e
      .join(broadcast(touched.select(col("id").as("u"), col("comp").as("cu0"))),
        Seq("u"), "left")
      .join(broadcast(touched.select(col("id").as("v"), col("comp").as("cv0"))),
        Seq("v"), "left")
      .select(coalesce(col("cu0"), col("u")).as("cu"), col("cu0").isNull.as("un"),
        coalesce(col("cv0"), col("v")).as("cv"), col("cv0").isNull.as("vn"))
    val superLab = components(res.select(col("cu"), col("cv")), "cu", "cv",
      idx.maxIter)
    // provenance of each super-node: a standing label or a novel id
    // (no value can be both — every standing label is itself a row of
    // the standing table, and novel means absent from it)
    val nodeFlags = res.select(col("cu").as("n"), col("un").as("isNew"))
      .unionByName(res.select(col("cv").as("n"), col("vn").as("isNew")))
      .distinct()
    val flagged = superLab.join(nodeFlags, col("id") === col("n"))
    val remap = flagged.filter(!col("isNew") && col("comp") =!= col("id"))
      .select(col("id").as("oldc"), col("comp").as("newc"))
    val novel = flagged.filter(col("isNew"))
      .select(col("id"), col("comp"))
    val updated = idx.labels.as("l")
      .join(broadcast(remap), col("l.comp") === col("oldc"), "left")
      .select(col("l.id").as("id"),
        coalesce(col("newc"), col("l.comp")).as("comp"))
      .unionByName(novel)
    ClusterIndex(updated, idx.maxIter)
  }

  /** Persist a [[ClusterIndex]]: label parquet + params manifest (the
    * `saveGraph` shape) — at scale the write is bucketed by `id` so
    * extend's semi-probe and the policy consumers' joins prune.
    */
  def saveComponents(idx: ClusterIndex, path: String): Unit = {
    idx.labels.write.mode("overwrite").parquet(s"$path/labels")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(path, "params.json"),
      s"""{"maxIter":${idx.maxIter}}""".getBytes("UTF-8"))
  }

  /** Load a persisted [[ClusterIndex]]; refuses a manifest missing
    * its propagation bound.
    */
  def loadComponents(spark: org.apache.spark.sql.SparkSession,
                     path: String): ClusterIndex = {
    val txt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path, "params.json")), "UTF-8")
    val m = """"maxIter"\s*:\s*(-?\d+)""".r.findFirstMatchIn(txt)
    require(m.isDefined, "params.json missing maxIter")
    ClusterIndex(spark.read.parquet(s"$path/labels"), m.get.group(1).toInt)
  }

  /** Drop the MEMORY_AND_DISK blocks behind a `localCheckpoint`ed
    * DataFrame (or a projection over one). The checkpointed data is an
    * RDD persist, invisible to `Dataset.unpersist`/CacheManager; find
    * the `LogicalRDD` leaf and unpersist its RDD directly.
    */
  private[graft] def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectFirst {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }.foreach(_.unpersist(blocking = false))
}
