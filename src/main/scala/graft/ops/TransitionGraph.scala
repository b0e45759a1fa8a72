package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transition-graph derivation + depth-capped reachability over an
  * event log (the recursive-query surface, SURVEY.md §2 q_recursive).
  *
  * Scale shape: the raw log is reduced to an aggregated edge list
  * first (one lag window + one groupBy, both shuffled on src — linear
  * in the data), and the recursion runs over THAT graph, whose size
  * is bounded by distinct states², not by rows. The edge list is
  * localCheckpoint'ed so each recursion step reads the materialized
  * graph instead of re-deriving it from the log.
  */
object TransitionGraph {

  /** Top-`k` outgoing transition edges per source state, by observed
    * frequency (ties broken on dst for determinism). One window for
    * the lag, one aggregation, one window for the per-src rank — all
    * partition-parallel.
    */
  def topEdges(ev: DataFrame, user: Column, order: Column, state: Column,
               k: Int): DataFrame =
    ev.select(user.as("u"), order.as("o"), state.as("dst"))
      .withColumn("src",
        lag(col("dst"), 1).over(Window.partitionBy(col("u")).orderBy(col("o"))))
      .filter(col("src").isNotNull)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("src")).orderBy(col("cnt").desc, col("dst"))))
      .filter(col("rk") <= k)
      .select(col("src"), col("dst"))

  /** Depth-capped BFS reachability from `start` via SQL WITH
    * RECURSIVE. Path enumeration is bounded by k^maxDepth (the caller
    * controls fan-out through [[topEdges]]' k); the final aggregate
    * keeps each node's minimum depth.
    */
  def reachable(spark: SparkSession, edges: DataFrame, start: String,
                maxDepth: Int, viewName: String = "graft_transition_edges")
      : DataFrame = {
    // public helper, interpolated SQL: quote-escape the start literal
    // and whitelist the identifier so no caller value can break out of
    // (or inject into) the statement
    require(viewName.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"viewName must be a plain identifier, got '$viewName'")
    val startLit = start.replace("'", "''")
    edges.localCheckpoint().createOrReplaceTempView(viewName)
    spark.sql(
      s"WITH RECURSIVE r(node, d) AS (SELECT '$startLit', 0 UNION ALL " +
        s"SELECT g.dst, r.d + 1 FROM r JOIN $viewName g ON g.src = r.node " +
        s"WHERE r.d < $maxDepth) " +
        "SELECT node, CAST(min(d) AS BIGINT) AS depth FROM r " +
        "GROUP BY node ORDER BY node")
  }
}
