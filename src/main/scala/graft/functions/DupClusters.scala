package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Duplicate-cluster resolution: the step AFTER near-dup candidate
 * generation. Pair output (e2/e2b/e2d) names edges; keeping one document
 * per duplicate GROUP needs the connected components of that graph, so
 * transitively-linked docs (A~B, B~C but never A~C) collapse together.
 *
 * Algorithm: iterative min-label propagation — every node repeatedly
 * adopts the smallest label among itself and its neighbours until a pass
 * changes nothing. This is how components are computed at cluster scale
 * without a graph library: each round is one equi-join + one aggregation
 * (shuffle on node id), and the round count is the graph diameter — for
 * near-dup graphs (near-cliques per duplicate group) a handful. The only
 * driver-side value per round is the single `count` used for the
 * convergence check, never row data.
 */
object DupClusters {

  /** @param edges two-column DataFrame of undirected edges
    * @return (id, cluster) — cluster = least node id reachable; only nodes
    *         appearing in `edges` are labelled (isolated docs are their own
    *         cluster by definition and need no resolution) */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      // every propagation round joins on dst: partition the edge table by it
      // once so each round reads the cache with no fresh edge-side exchange
      .repartition(col("dst"))
      .cache()
    var cached = sym.groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("nbr"))
      .select(col("id"), least(col("id"), col("nbr")).as("cluster"))
      .cache()
    var labels = cached
    var converged = false
    while (!converged) {
      // each node adopts min(own cluster, neighbours' clusters); the OLD
      // label rides along so the convergence check is a filter over this
      // round's cached output, not an extra join
      val next = sym
        .join(labels.withColumnRenamed("id", "dst").withColumnRenamed("cluster", "nc"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("nc")).as("nbr"))
        .join(labels, "id")
        .select(
          col("id"),
          col("cluster").as("old"),
          least(col("cluster"), col("nbr")).as("cluster"))
        .cache()
      val changed = next.where(col("cluster") =!= col("old"))
        .count() // convergence check: one long to the driver, no row data
      cached.unpersist()
      cached = next
      labels = next.select("id", "cluster")
      converged = changed == 0
    }
    // detach the result from the final round's cache so the loop's storage
    // (and the edge table) can be freed; the label table itself is
    // #nodes rows — the component map a dedup pass keeps anyway
    val result = labels.cache()
    result.count()
    cached.unpersist()
    sym.unpersist()
    result
  }
}
