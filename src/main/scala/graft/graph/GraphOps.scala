package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural health census of a directed edge set — the check that
  * runs between building a kNN graph ([[graft.similarity.Ann.knnGraph]])
  * and spending cluster-hours on it (PageRank q128, community passes):
  * reciprocity (a healthy kNN graph is substantially mutual), in-degree
  * concentration (a hub node means a degenerate LSH cell or an
  * embedding-space collapse), and isolated-node count (unreachable
  * vectors — they will never surface in graph-mediated retrieval).
  *
  * Scale shape: one equi-join of the edge set with itself on the
  * reversed key (|E| = k·n rows, both sides shuffled by the same join
  * key — no broadcast needed, no skew beyond the graph's own), plus
  * two count aggregations. Nothing touches the n²-pair space.
  */
object GraphOps {

  /** One-row census: n_nodes (distinct endpoints — a node in a
    * singleton LSH cell emits no edges, so srcs alone undercount),
    * n_edges, n_reciprocal (edges whose reverse also exists),
    * max_in_degree, n_receiving (distinct dsts), n_isolated (nodes no
    * edge points at — ≥ 0 by construction since dsts ⊆ endpoints).
    */
  def degreeReciprocityCensus(edges: DataFrame,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    val e = edges.select(col(srcCol).as("s"), col(dstCol).as("d"))
    val nodes = e.select(col("s").as("v")).union(e.select(col("d").as("v")))
      .agg(count_distinct(col("v")).as("n_nodes"))
      .crossJoin(e.agg(count(lit(1)).as("n_edges")))
    val recip = e.join(e.select(col("s").as("rd"), col("d").as("rs")),
        col("s") === col("rs") && col("d") === col("rd"), "left_semi")
      .agg(count(lit(1)).as("n_reciprocal"))
    val indeg = e.groupBy(col("d")).agg(count(lit(1)).as("c"))
      .agg(coalesce(max(col("c")), lit(0L)).as("max_in_degree"),
        count(lit(1)).as("n_receiving"))
    nodes.crossJoin(recip).crossJoin(indeg)
      .withColumn("n_isolated", col("n_nodes") - col("n_receiving"))
  }
}
