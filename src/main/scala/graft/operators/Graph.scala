package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph operators for the dedup pipeline. The one that matters
  * at 100 TB: connected components over the near-duplicate pair graph, to
  * collapse each duplicate CLUSTER to one canonical document (pairs alone
  * over-delete: a–b and b–c pairs must keep exactly one of {a,b,c}, not
  * lose two).
  */
object Graph {

  /** Connected components of an undirected edge list via iterative
    * min-label propagation: every vertex starts labeled with itself; each
    * round every vertex takes the min of its own and its neighbors' labels;
    * fixpoint = each vertex labeled with its component's smallest id.
    *
    * Output: (`vertex`, `component`) for every vertex appearing in `edges`
    * — `component` is the component's minimum vertex id.
    *
    * Scale posture: each round is one shuffled (edge ⋈ label) equi-join
    * plus a groupBy-min — all narrow (two longs per row). Lineage is
    * truncated every round with localCheckpoint (an iterative DataFrame
    * loop otherwise compounds the plan until analysis itself dominates),
    * and convergence is detected with a count of changed labels — one
    * aggregate action per round, no per-vertex driver traffic. Rounds
    * needed = component diameter; near-dup clusters are shallow (a hub
    * document links its variants), so a handful of rounds suffices. For
    * adversarially long chains, switch to the alternating large/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce"),
    * which converges in O(log n) — not needed for dedup graphs.
    */
  def connectedComponents(edges: DataFrame, src: String, dst: String,
      maxIter: Int = 20): DataFrame = {
    // both directions once, deduplicated — neighbors(v) for every v
    val und = edges.select(col(src).as("a"), col(dst).as("b"))
      .unionByName(edges.select(col(dst).as("a"), col(src).as("b")))
      .distinct()
      .localCheckpoint()
    var labels = und.select(col("a").as("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      // neighbor labels flow along edges: b's label becomes a candidate for a
      val viaNeighbor = und
        .join(labels.withColumnRenamed("v", "b"), Seq("b"))
        .select(col("a").as("v"), col("label"))
      val next = labels.unionByName(viaNeighbor)
        .groupBy(col("v")).agg(min(col("label")).as("label"))
        .localCheckpoint()
      val changed = next.join(labels.withColumnRenamed("label", "__old"), Seq("v"))
        .filter(col("label") =!= col("__old"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("v").as("vertex"), col("label").as("component"))
  }
}
