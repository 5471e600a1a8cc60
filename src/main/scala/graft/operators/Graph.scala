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
    * loop otherwise compounds the plan until analysis itself dominates);
    * superseded rounds' checkpoint blocks are freed as soon as the next
    * round materializes, so the loop holds ONE working-set copy, not
    * `rounds` copies. Convergence rides the same aggregation that computes
    * the new labels (each vertex's own row is flagged, so the group sees
    * both min-candidate and previous label) — the changed-count is then a
    * filter over the already-materialized checkpoint, NOT a second
    * label-join per round. Rounds needed = component diameter; near-dup
    * clusters are shallow (a hub document links its variants), so a handful
    * of rounds suffices. For adversarially long chains, switch to
    * [[connectedComponentsStar]] (alternating large/small-star, Kiveris et
    * al., "Connected Components in MapReduce and Beyond"), which converges
    * in O(log² n) rounds — not needed for dedup graphs.
    *
    * If `maxIter` rounds pass without convergence the loop STOPS and the
    * returned labels are only partially propagated (components wider than
    * `maxIter` hops split) — a warning is logged; size `maxIter` to the
    * expected component diameter.
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
      // own rows are flagged so one aggregation yields BOTH the new min
      // label and the previous one — convergence needs no second join
      val next = labels.withColumn("__own", lit(true))
        .unionByName(viaNeighbor.withColumn("__own", lit(false)))
        .groupBy(col("v"))
        .agg(min(col("label")).as("label"),
          max(when(col("__own"), col("label"))).as("__old"))
        .localCheckpoint() // eager: materialized before the old round is freed
      val changed = next.filter(col("label") =!= col("__old")).count()
      org.apache.spark.sql.graftx.CheckpointUtils.unpersistLocalCheckpoint(labels)
      labels = next.select(col("v"), col("label"))
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      System.err.println(s"[graft] connectedComponents: NOT converged after " +
        s"$maxIter rounds — components wider than $maxIter hops are split; " +
        "raise maxIter or use connectedComponentsStar")
    labels.select(col("v").as("vertex"), col("label").as("component"))
  }
}
