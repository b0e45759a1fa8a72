package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank over a weighted edge list, in FIXED-POINT integer
  * arithmetic — the graph-centrality member of the iterative family
  * ([[ConnectedComponents]] is the clustering member). Ranks are
  * maintained as integer micro-units of a `scale` total (default
  * 10^12), every division is an explicit integer floor, and the
  * damping split is integer percent — so the result is bit-identical
  * on any engine and any partitioning (a float PageRank's sums are
  * partial-aggregation-order dependent and can never hash-match an
  * oracle).
  *
  * Scale shape (the standard distributed PR): each iteration is one
  * equi-join of the edge list with the rank table on src (both keyed,
  * shuffles bounded by |E| and |V|) plus one map-side-combinable
  * groupBy(dst). The rank table is `localCheckpoint`ed every
  * iteration, cutting the plan's lineage exactly like
  * [[ConnectedComponents]] — iteration count bounds the driver, data
  * never reaches it (the only collect-like action is the node COUNT).
  * Dangling mass (nodes with no out-edges) is dropped, not
  * redistributed — the conventional simplification; document if the
  * graph has heavy sinks.
  *
  * Overflow bound: rank*weight products stay below scale * maxWeight;
  * with scale = 10^12 the per-edge weight must stay <= ~9*10^6 to fit
  * a long — aggregate parallel edges before calling (the builder in
  * SparkEntry does), or lower `scale`.
  */
object PageRank {

  /** Ranks after `iterations` synchronous updates:
    * `(node, rank)` with rank in integer `scale`-units;
    * r' = floor(scale*(100-dampingPct) / (100*N))
    *    + floor(dampingPct * Σ_src floor(r_src * w / out_src) / 100).
    *
    * @param edges (src, dst, w: long) — parallel edges pre-aggregated.
    */
  def ranks(edges: DataFrame, iterations: Int = 3, dampingPct: Long = 85L,
            scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(dampingPct >= 0 && dampingPct <= 100, "dampingPct in [0,100]")
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint() // consumed once per iteration + the count
    val n = nodes.count()
    require(n > 0, "empty graph")
    val base = (scale * (100L - dampingPct)) / (100L * n)
    val withOut = edges
      .join(edges.groupBy(col("src")).agg(sum(col("w")).as("out_w")), Seq("src"))
      .localCheckpoint() // static across iterations: compute the join once
    var ranks = nodes.withColumn("rank", lit(scale / n))
    var i = 0
    while (i < iterations) {
      val inflow = withOut
        .join(ranks, withOut("src") === ranks("node"))
        .select(col("dst"), expr("(rank * w) div out_w").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("infl"))
      ranks = nodes
        .join(inflow, nodes("node") === inflow("dst"), "left_outer")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampingPct * coalesce(infl, 0L)) div 100")).as("rank"))
        .localCheckpoint(eager = false) // cut lineage per iteration
      i += 1
    }
    ranks
  }
}
