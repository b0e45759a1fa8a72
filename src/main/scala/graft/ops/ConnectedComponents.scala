package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step of every large-scale dedup pipeline: near-dup PAIRS (from
  * MinHash/SimHash/embedding blocking) become dup CLUSTERS, and one
  * representative per cluster survives.
  *
  * Algorithm: min-label propagation. Every node starts labeled with
  * its own id; each round, every node adopts the minimum label among
  * itself and its neighbors; at fixpoint each component is labeled by
  * its minimum member id. The fixpoint is unique and deterministic, so
  * the result is oracle-comparable (DuckDB: recursive-CTE transitive
  * closure + GROUP BY min).
  *
  * Scale shape: each round is one join (edges ⋈ labels, both sides
  * partitioned on the key) + one min-groupBy — all shuffle-based, no
  * driver-side graph. Lineage is cut per round (`localCheckpoint`),
  * otherwise the plan doubles every iteration. Rounds needed = graph
  * diameter; near-dup clusters are shallow (pairs share a common
  * center), so convergence is typically 2–4 rounds. For adversarial
  * diameters (long chains) the known remedy is alternating star
  * contraction (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) which converges in O(log n) rounds — the
  * round-loop below is the same outer shape, so that optimization
  * swaps in without changing the API.
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
                 maxIter: Int = 20): DataFrame = {
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
    while (!converged && i < maxIter) {
      val proposals = edges
        .join(labels, edges("u") === labels("id"))
        .select(col("v").as("id"), col("comp"))
      val next = labels.unionByName(proposals)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      // emptiness probe, not a full count: one changed row is enough
      val changed = next
        .join(labels.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev"))
        .limit(1).count()
      converged = changed == 0L
      labels = next
      i += 1
    }
    edges.unpersist(blocking = false)
    labels
  }
}
