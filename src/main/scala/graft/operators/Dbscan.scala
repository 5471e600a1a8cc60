package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-blocked DBSCAN (Ester et al. 1996) over 2-D points.
  *
  * Density clustering without a fixed k: a point is CORE when at least
  * `minPts` points (itself included) sit within distance eps; clusters are
  * the connected components of the core-core eps-graph; non-core points
  * with a core neighbor are BORDER (attached to the smallest neighboring
  * cluster label — a deterministic refinement of the paper's
  * first-visitor rule); the rest are NOISE.
  *
  * Scale posture: the eps-neighbor search is the classic grid block — each
  * point lands in its floor(coord/eps) cell, the probe side is replicated
  * to the 3x3 stencil (9x, map-side), and candidates meet in ONE hash
  * equi-join on the cell key; the eps ball cannot cross more than one cell
  * boundary per axis, so the stencil is pigeonhole-complete and no pair is
  * generated twice. Per-cell work is O((points per 3x3 block)^2) — bounded
  * by the LOCAL density around eps-balls, never by n — so the join is
  * scan-shaped when eps is sized to the data density (the gate derives
  * eps^2 = c/n, which pins the expected neighbor count across scale
  * factors). A pathological all-points-in-one-cell distribution degrades
  * to the quadratic core the algorithm defines; pre-salting such a cell
  * subdivides it the same way SemDeDup's fat-cell sub-blocking does.
  * Cluster formation reuses [[Graph.connectedComponentsStar]] — the
  * O(log^2 n) alternating-star rounds, two narrow shuffles each — rather
  * than any sequential frontier expansion.
  *
  * Determinism: distances are IEEE double expressions evaluated in one
  * fixed shape ((dx*dx)+(dy*dy) compared to the eps^2 literal), component
  * labels are component-minimum ids, and border attachment takes the
  * minimum neighboring label — the full labeling is a pure function of the
  * data on any partitioning.
  */
object Dbscan {

  /** Labels each point: `(id, role in {core,border,noise}, cluster)` —
    * cluster is the component-min core id, or -1 for noise.
    *
    * `eps2` is the SQUARED radius (callers derive it exactly, e.g. c/n,
    * and the comparison happens on squares — no sqrt in the predicate;
    * sqrt is only used driver-side to size the grid cells).
    */
  def cluster(points: DataFrame, idCol: String, xCol: String, yCol: String,
      eps2: Double, minPts: Int): DataFrame = {
    require(eps2 > 0.0, "eps2 must be positive")
    require(minPts >= 1, "minPts must be >= 1")
    val eps = math.sqrt(eps2)
    val p = points.select(col(idCol).cast("long").as("id"),
        col(xCol).cast("double").as("x"), col(yCol).cast("double").as("y"))
      .localCheckpoint() // feeds the join twice + the final labeling
    val home = p
      .withColumn("cx", floor(col("x") / lit(eps)).cast("long"))
      .withColumn("cy", floor(col("y") / lit(eps)).cast("long"))
    // probe replicas: each point visits its 3x3 stencil once (map-side 9x)
    val offs = for { dx <- -1 to 1; dy <- -1 to 1 }
      yield struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy"))
    val repl = home.select(col("id").as("jid"), col("x").as("jx"),
        col("y").as("jy"), col("cx").as("jcx"), col("cy").as("jcy"),
        explode(array(offs: _*)).as("o"))
      .select(col("jid"), col("jx"), col("jy"),
        (col("jcx") + col("o.dx")).as("cx"), (col("jcy") + col("o.dy")).as("cy"))
    // directed eps-neighbor pairs (id -> jid), each exactly once: the
    // replica of jid at id's home cell is unique
    val dx = col("x") - col("jx")
    val dy = col("y") - col("jy")
    val pairs = home.join(repl, Seq("cx", "cy"))
      .filter(col("id") =!= col("jid") &&
        dx * dx + dy * dy <= lit(eps2))
      .select(col("id"), col("jid"))
      .localCheckpoint() // feeds degrees, core edges, border attachment
    val deg = pairs.groupBy(col("id")).agg(count(lit(1)).as("nb"))
    val core = p.select(col("id")).join(deg, Seq("id"), "left")
      .filter(coalesce(col("nb"), lit(0L)) + 1L >= minPts.toLong)
      .select(col("id"))
      .localCheckpoint() // semi-join probe used three times, tiny schema
    // undirected core-core edges -> star CC; isolated cores self-label
    val coreEdges = pairs.filter(col("id") < col("jid"))
      .join(core, Seq("id"), "left_semi")
      .join(core.select(col("id").as("jid")), Seq("jid"), "left_semi")
      .select(col("id").as("src"), col("jid").as("dst"))
    val comp = Graph.connectedComponentsStar(coreEdges, "src", "dst")
    val coreLab = core
      .join(comp.withColumnRenamed("vertex", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
      .localCheckpoint() // feeds border attachment + final labeling
    val border = pairs
      .join(core, Seq("id"), "left_anti") // only non-core points attach
      .join(coreLab.select(col("id").as("jid"), col("cluster")), Seq("jid"))
      .groupBy(col("id")).agg(min(col("cluster")).as("cluster"))
    p.select(col("id"))
      .join(coreLab.withColumnRenamed("cluster", "c_cl"), Seq("id"), "left")
      .join(border.withColumnRenamed("cluster", "b_cl"), Seq("id"), "left")
      .select(col("id"),
        when(col("c_cl").isNotNull, lit("core"))
          .when(col("b_cl").isNotNull, lit("border"))
          .otherwise(lit("noise")).as("role"),
        coalesce(col("c_cl"), col("b_cl"), lit(-1L)).as("cluster"))
  }
}
