package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Aggregations.sumStable

/** Classic analytic shapes beyond the basic join/agg layer: outer-join
  * distributions (TPC-H Q13), HAVING over grouped facts (Q18), per-group-
  * average correlated filtering (Q17), and explicit GROUPING SETS.
  *
  * Scale notes: Q13's left join shuffles both sides on custkey (fact⋈fact);
  * Q18's HAVING is a pre-aggregation on the fact before the dimension joins,
  * so only qualifying orders join; Q17's per-part aggregate joins back onto
  * the fact scan with the strategy left to AQE (the aggregate's cardinality
  * is input-proportional, so a hard broadcast hint would not survive scale).
  */
object AnalyticQueries extends QueryPack {

  /** Symmetric part co-occurrence graph (parts linked when they share an
    * order) — shared by a_pagerank_parts, a_communities.
    */
  private def partGraph(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val op = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
      .distinct()
    // NOTE (r12, measured and kept as-is): a canonical-half variant (join
    // on a < b, distinct over half the pairs, mirror by projection +
    // checkpoint) was tried per guide §2.3 — warm it is a WASH on the
    // build (2.2 s both forms; the op distinct dominates) and ~1.2-1.4×
    // WORSE for consumers (the union-of-checkpoint shape doubles the
    // scan partition count and costs LPA/conductance more than the
    // halved distinct saves). Reverted; evidence in OPTIMIZATION_r12.md.
    op.as("x")
      .join(op.as("y"), col("x.ok") === col("y.ok") && col("x.p") =!= col("y.p"))
      .select(col("x.p").as("a"), col("y.p").as("b"))
      .distinct()
  }

  /** Weighted supplier co-supply graph: suppliers linked when they ship
    * the same part, weight = the cheapest joint shipment in exact integer
    * cents (min over shared parts of the two line items' summed cents) —
    * shared by a_mst_suppliers, a_mis_suppliers. ~|S| vertices, dense.
    */
  private def supplierGraph(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    // pre-aggregate to one (sk, pk, min cents) row BEFORE the per-part
    // self-join: for a pair (u, v) sharing pk the joined line items range
    // over u's and v's pk-shipments INDEPENDENTLY, so
    //   min over pairs (cents_x + cents_y)
    //     = min_pk (min cents of u at pk + min cents of v at pk)
    // — row-for-row the same w_q, with the join fan-out shrunk from
    // |lineitem|² per part to |distinct (sk, pk)|² per part (guide §2.3:
    // aggregate before you shuffle; the self-join is the exchange here)
    val sp = Tables.load(s, dir, "lineitem")
      .select(col("l_suppkey").as("sk"), col("l_partkey").as("pk"),
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
          .as("cents"))
      .groupBy(col("sk"), col("pk")).agg(min(col("cents")).as("cents"))
    sp.as("x")
      .join(sp.as("y"),
        col("x.pk") === col("y.pk") && col("x.sk") < col("y.sk"))
      .groupBy(col("x.sk").as("u"), col("y.sk").as("v"))
      .agg(min(col("x.cents") + col("y.cents")).as("w_q"))
  }

  /** Shared oracle CTEs for the supplier co-supply graph — the DuckDB
    * mirror of [[supplierGraph]]: `e(u, v, w)` canonical weighted edges,
    * `verts(vx)` the vertex set.
    */
  private val supplierGraphSql: String =
    """sp AS MATERIALIZED (SELECT l_suppkey AS sk, l_partkey AS pk,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM lineitem),
      |e AS MATERIALIZED (SELECT x.sk AS u, y.sk AS v,
      |    min(x.cents + y.cents) AS w
      |  FROM sp x JOIN sp y ON x.pk = y.pk AND x.sk < y.sk
      |  GROUP BY 1, 2),
      |verts AS MATERIALIZED (SELECT u AS vx FROM e UNION SELECT v FROM e)"""
      .stripMargin

  /** Two deterministic 3-hop walks from every 31st part over the part
    * co-occurrence graph — shared by a_walk_corpus, a_skipgram_pairs.
    */
  private def walkFrame(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val starts = Tables.load(s, dir, "part")
      .filter(col("p_partkey") % 31 === 0)
      .select(col("p_partkey"))
    graft.operators.Graph.deterministicWalks(partGraph(s, dir), "a", "b",
      starts, "p_partkey", steps = 3, walksPerVertex = 2)
  }

  /** Distinct (customer, part+10^9) purchase pairs — the bipartite frame
    * shared by a_kcore (symmetrized) and a_hits (directed). The offset
    * keeps the two id namespaces disjoint.
    */
  private def custPartPairs(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long").as("c"),
        (col("l_partkey") + lit(1000000000L)).as("p"))
      .distinct()

  /** Canonical (a < b) brand co-occurrence graph, cut at the median pair
    * weight — shared by a_triangle_count, a_clustering_coeff. The median
    * cut is the hub-edge prefilter that bounds wedge fan-out.
    */
  private def brandGraph(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val pt = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val ob = li.join(pt, col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      .distinct()
    val pw = ob.as("x")
      .join(ob.as("y"), col("x.ok") === col("y.ok") && col("x.b") < col("y.b"))
      .groupBy(col("x.b").as("a"), col("y.b").as("b"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint()
    val wm = org.apache.spark.sql.expressions.Window
      .orderBy(col("w"), col("a"), col("b"))
    val med = pw
      .withColumn("__rn", row_number().over(wm))
      .crossJoin(broadcast(pw.agg(count(lit(1)).as("__n"))))
      .agg(max(when(col("__rn") === ceil(col("__n") * 0.5), col("w")))
        .as("med"))
    pw.crossJoin(broadcast(med))
      .filter(col("w") > col("med"))
      .select(col("a"), col("b"))
  }

  override def queries: Map[String, Query] = Map(
    // Q13 shape: customer count distribution incl. zero-order customers.
    "q13_custdist" -> ((s, dir) => {
      val c = Tables.load(s, dir, "customer")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
      val perCust = c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
      perCust.groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // Q18 shape: large orders via HAVING on the grouped fact, then joins.
    "q18_large_orders" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val big = li.groupBy(col("l_orderkey"))
        .agg(sumStable(col("l_quantity")).as("sum_qty"))
        .filter(col("sum_qty") > 160)
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"), col("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // Q17 shape: lines under 50% of their part's average quantity.
    // No broadcast hint on the per-part aggregate: its cardinality grows with
    // the fact table (~200k×sf parts), so a forced broadcast OOMs the driver
    // at scale — AQE picks broadcast vs shuffle from the aggregate's runtime
    // size instead.
    "q17_small_qty_revenue" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val avgQty = li.groupBy(col("l_partkey").as("p_key"))
        .agg((sumStable(col("l_quantity")) / count(col("l_quantity")))
          .as("avg_qty"))
      li.join(avgQty, li("l_partkey") === avgQty("p_key"))
        .filter(col("l_quantity") < col("avg_qty") * 0.5)
        .agg(sumStable(col("l_extendedprice")).as("total_price"),
          count(lit(1)).as("n_lines"))
    }),

    // Q22 shape through the SQL surface (spark.sql): scalar subquery for
    // the global average + NOT EXISTS anti-join — exercises the parser /
    // subquery-decorrelation path the DataFrame queries don't. The average
    // goes through DECIMAL(38,10) in BOTH engines so the filter boundary
    // is bit-identical (a plain double avg would make boundary rows
    // engine-dependent).
    "q22_idle_balances" -> ((s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_mktsegment, COUNT(*) AS n_custs,
          |  CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS STRING) AS DOUBLE)
          |    AS total_bal
          |FROM customer c
          |WHERE c_acctbal > (
          |    SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,10))) AS STRING) AS DOUBLE)
          |      / COUNT(*)
          |    FROM customer WHERE c_acctbal > 0.0)
          |  AND NOT EXISTS (SELECT 1 FROM orders o
          |    WHERE o.o_custkey = c.c_custkey
          |      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
          |GROUP BY c_mktsegment
          |ORDER BY c_mktsegment""".stripMargin)
    }),

    // Q4 shape through the SQL surface: correlated EXISTS with a non-equi
    // correlated predicate (l_shipdate > o_orderdate + 75 days) — Catalyst
    // must decorrelate this into a LeftSemi join with a mixed
    // equality/inequality condition; counts late-shipping orders per
    // priority.
    "q4_late_priority" -> ((s, dir) => {
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      Tables.load(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT o_orderpriority, COUNT(*) AS n_orders
          |FROM orders o
          |WHERE EXISTS (SELECT 1 FROM lineitem l
          |  WHERE l.l_orderkey = o.o_orderkey
          |    AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY)
          |GROUP BY o_orderpriority
          |ORDER BY o_orderpriority""".stripMargin)
    }),

    // Correlated SCALAR aggregate subquery (Q2/Q17 family): each qualifying
    // customer carries a count computed in a correlated subquery — Catalyst
    // must decorrelate it into a left-outer aggregate join (a per-row
    // subquery execution would be |customers| separate scans).
    "a_corr_order_counts" -> ((s, dir) => {
      Tables.load(s, dir, "customer").createOrReplaceTempView("customer")
      Tables.load(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT c_custkey, c_acctbal,
          |  (SELECT COUNT(*) FROM orders o
          |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
          |    AS n_big_orders
          |FROM customer c
          |WHERE c_acctbal > 9000
          |ORDER BY c_custkey""".stripMargin)
    }),

    // Q21 shape: suppliers who were the SOLE late shipper on finished
    // multi-supplier orders. The textbook EXISTS / NOT-EXISTS form (kept as
    // the oracle SQL) decorrelates into three lineitem scans and two orders
    // scans; because l3.l_orderkey = l1.l_orderkey forces o3 = o1, the whole
    // predicate is a per-order property, so we plan it single-pass instead:
    // one lineitem⋈orders('F') join, one (order,supplier) rollup carrying a
    // late flag, one per-order rollup — "≥2 suppliers, exactly 1 late" names
    // the credited supplier directly. One fact scan, narrow aggregations
    // all the way; this shape is what survives a 100 TB lineitem.
    "q21_sole_late_supplier" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val lines = li
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
            .as("__late"))
      val perSupp = lines
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(max(when(col("__late"), 1).otherwise(0)).as("__late"))
      val soleLate = perSupp
        .groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("__n_supp"),
          sum(col("__late")).as("__n_late"),
          max(when(col("__late") === 1, col("l_suppkey"))).as("s_suppkey"))
        .filter(col("__n_supp") >= 2 && col("__n_late") === 1)
      soleLate
        .groupBy(col("s_suppkey"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("n_orders").desc, col("s_suppkey"))
        .limit(10)
    }),

    // Graph analytics beyond components: triangle count of the brand
    // co-occurrence graph. Edges are brand pairs with ABOVE-MEDIAN
    // co-order support (an order-statistic cut — scale-free and exact in
    // both engines, where any fixed count threshold is either trivial or
    // sf-fragile on this uniform data). Canonical orientation a<b<c makes
    // each triangle appear EXACTLY once as e(a,b)⋈e(b,c)⋈e(a,c) — two
    // equi-joins, no per-vertex state; at scale the standard
    // degree-ordering refinement bounds the wedge join by the arboricity,
    // and the edge list here is brand-vocabulary-sized, not data-sized.
    "a_triangle_count" -> ((s, dir) => {
      val e = brandGraph(s, dir).localCheckpoint()
      val wedges = e.select(col("a"), col("b").as("m"))
        .join(e.select(col("a").as("m"), col("b").as("c")), Seq("m"))
      val tri = wedges.join(
        e.select(col("a"), col("b").as("c")), Seq("a", "c"))
      tri.agg(count(lit(1)).as("n_triangles"))
        .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
    }),

    // Benford first-digit screen on transaction amounts — the classic
    // fabricated-data / unit-mixing detector on financial columns. The
    // digit comes from exact integer cents (floor(x·100 + 0.5) — double→
    // string repr is NOT cross-engine-safe, integer→string is; ×100 never
    // changes the leading nonzero digit), and the expected-frequency and
    // chi-square terms are identical IEEE chains quantized to micro-units.
    // One map-side-combinable 9-group aggregation: scan-bound at any scale.
    "a_benford" -> ((s, dir) => {
      val digit = substring(
        floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
          .cast("string"), 1, 1)
      val counts = Tables.load(s, dir, "lineitem")
        .select(digit.as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      val tot = counts.agg(sum(col("n_obs")).as("n_total"))
      val p = log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
      val diff = col("n_obs").cast("double") - col("n_total").cast("double") * p
      counts.crossJoin(broadcast(tot)) // 9 rows × 1 row
        .select(col("digit"), col("n_obs"), col("n_total"),
          round(p * lit(1e6)).cast("long").as("exp_q"),
          round(diff * diff / (col("n_total").cast("double") * p) * lit(1e6))
            .cast("long").as("chi_q"))
        .orderBy(col("digit"))
    }),

    // Per-vertex local clustering coefficient over the same median-cut
    // brand co-occurrence graph as a_triangle_count: triangles explode to
    // their 3 corners for the per-vertex count; 2T/(d(d−1)) is one IEEE
    // division of exact integers, so every coefficient hash-matches.
    "a_clustering_coeff" -> ((s, dir) => {
      graft.operators.Graph.clusteringCoefficients(brandGraph(s, dir), "a", "b")
        .orderBy(col("vertex"))
    }),

    // 12-truss of the brand graph: 3 synchronous support-peel rounds (the
    // sf0.01 cascade is 150 → 103 → 78 → 78, i.e. the fixpoint, so the
    // third round also proves idempotence). Oracle unrolls each round with
    // MATERIALIZED CTEs; support is re-derived per round from a triangle
    // self-join — the engine's semi-join peel must match edge for edge.
    "a_ktruss" -> ((s, dir) => {
      graft.operators.Graph.kTrussPeel(brandGraph(s, dir), "a", "b",
          k = 12, iters = 3)
        .orderBy(col("a"), col("b"))
    }),

    // PageRank over the part co-purchase graph (parts linked when they
    // co-occur in an order — both directions, so no dangling mass), in
    // fixed-point INTEGER arithmetic: every rank a BIGINT in micro-units,
    // every step integer multiply/div/sum, so a 1000-executor run is
    // bit-identical to the single-node oracle (no float sum-order
    // sensitivity). Three unrolled rounds — the oracle mirrors the
    // recurrence term by term as chained CTEs. Per-order line counts are
    // bounded (~7), so the co-occurrence self-join is linear in lineitem,
    // and each rank round is one narrow (long,long) equi-join + sum.
    // Adamic-Adar link prediction on a deterministic 1-in-5 vertex sample
    // of the part co-purchase graph (the full graph's wedge count Σdeg² ≈
    // 3·10⁸ at sf0.1 — gate-prohibitive; the sample keeps the same shape
    // at ~1/125 the wedges). Integer micro-unit scores — value-exact.
    "a_link_prediction" -> ((s, dir) => {
      val op = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
        .filter(col("p") % 5 === 0)
        .distinct()
      val e = op.as("x")
        .join(op.as("y"), col("x.ok") === col("y.ok") && col("x.p") =!= col("y.p"))
        .select(col("x.p").as("a"), col("y.p").as("b"))
        .distinct()
      graft.operators.Graph.adamicAdar(e, "a", "b")
        .orderBy(col("aa_q").desc, col("u"), col("v"))
        .limit(20)
    }),

    // Strongly connected components of the DIRECTED within-order part
    // sequence graph (part at line n → part at line n+1): forward-backward
    // min-label coloring, both closures monotone min-propagations, so the
    // oracle replays every round with a fixed budget (≥ the engine's
    // early-exit fixpoints — measured depth 5, budget 10×3).
    "a_scc_parts" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          col("l_partkey").as("p"))
      val e = li.as("x")
        .join(li.as("y"),
          col("x.ok") === col("y.ok") && col("y.ln") === col("x.ln") + 1)
        .select(col("x.p").as("a"), col("y.p").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
      graft.operators.Graph
        .stronglyConnectedComponents(e, "a", "b",
          outerRounds = 3, propRounds = 10)
        .orderBy(col("vertex"))
    }),

    // Borůvka minimum spanning forest over the supplier co-supply graph
    // (suppliers linked when they ship the same part; weight = cheapest
    // joint shipment in exact integer cents). Log-round distributed MST —
    // each round every component grabs its lightest cut edge and the
    // selected pseudo-forest contracts by pointer doubling. The oracle
    // replays all rounds (argmin, 2-cycle break, 7 doubling jumps) term
    // by term — the forest is unique under the (w, u, v) total order.
    "a_mst_suppliers" -> ((s, dir) =>
      graft.operators.Graph
        .boruvkaMst(supplierGraph(s, dir), "u", "v", "w_q")
        .orderBy(col("id_a"), col("id_b"))),

    // Deterministic Luby maximal independent set over the same supplier
    // graph: priorities are the engine-neutral (md5(vertex), vertex)
    // order, so the expected-O(log n) randomized rounds become exactly
    // SQL-replayable. Output = every vertex with its entry round (0 =
    // dominated): the covering structure a dedup/sampling pass keeps.
    "a_mis_suppliers" -> ((s, dir) => {
      val g = supplierGraph(s, dir)
      val und = g.select(col("u").as("a"), col("v").as("b"))
        .unionByName(g.select(col("v").as("a"), col("u").as("b")))
      graft.operators.Graph.lubyMis(und, "a", "b")
        .orderBy(col("vertex"))
    }),

    "a_pagerank_parts" -> ((s, dir) => {
      graft.operators.Graph.pageRankInt(partGraph(s, dir), "a", "b", iters = 3)
        .orderBy(col("rank").desc, col("vertex"))
        .limit(20)
        .select(col("vertex").as("part_id"), col("rank").as("rank_micro"))
    }),

    // Personalized PageRank from a seed slice of parts (p % 53 == 0) —
    // the related-items proximity ranking: teleport mass returns only to
    // the seeds, so scores measure closeness to the query set. Same
    // integer recurrence as a_pagerank_parts with a seed indicator; the
    // oracle unrolls it term by term.
    "a_ppr_parts" -> ((s, dir) => {
      val e = partGraph(s, dir)
      val seeds = Tables.load(s, dir, "part")
        .filter(col("p_partkey") % 53 === 0)
        .select(col("p_partkey"))
      graft.operators.Graph
        .personalizedPageRankInt(e, "a", "b", seeds, "p_partkey", iters = 3)
        .orderBy(col("rank").desc, col("vertex"))
        .limit(20)
        .select(col("vertex").as("part_id"), col("rank").as("rank_micro"))
    }),

    // Deterministic label-propagation communities over the same symmetric
    // part co-occurrence graph: 3 synchronous rounds, ties to the smallest
    // label. The oracle unrolls the exact recurrence as CTEs with a
    // window-argmax — structurally independent of the struct-max plan.
    "a_communities" -> ((s, dir) => {
      graft.operators.Graph.labelPropagation(partGraph(s, dir), "a", "b",
          iters = 3)
        .select(col("vertex").as("part_id"), col("community"))
        .orderBy(col("part_id"))
    }),

    // Degree distribution + Hill/MLE power-law exponent estimate
    // α = 1 + n / Σ ln(dᵢ/d_min) — the scale-free check that tells a
    // skew-mitigation plan whether hub salting is mandatory. Per-vertex
    // log terms quantized to micro-nats BEFORE the order-free integer sum;
    // α comes out as exact integer micro-units.
    "a_degree_powerlaw" -> ((s, dir) => {
      val deg = partGraph(s, dir)
        .groupBy(col("a").as("v")).agg(count(lit(1)).as("d"))
        .localCheckpoint() // read by the extrema fetch and the sum
      val ext = deg.agg(min(col("d")).as("dmin"), max(col("d")).as("dmax"),
        count(lit(1)).as("n"))
      deg.crossJoin(broadcast(ext))
        .select(col("n"), col("dmin"), col("dmax"),
          round(log(col("d").cast("double") / col("dmin").cast("double"))
            * lit(1e6)).cast("long").as("q"))
        .groupBy(col("n"), col("dmin"), col("dmax"))
        .agg(sum(col("q")).as("sum_ln_q"))
        .select(col("n").as("n_vertices"), col("dmin").as("d_min"),
          col("dmax").as("d_max"), col("sum_ln_q"),
          when(col("sum_ln_q") <= 0, lit(0L))
            .otherwise(expr("1000000 + (n * 1000000000000) div sum_ln_q"))
            .as("alpha_q"))
    }),

    // Per-community CONDUCTANCE φ = cut / min(vol, vol_rest) over the
    // a_communities labels — the complement of modularity (a low-φ
    // community is genuinely separable; LPA labels with high φ are noise).
    // Cut and volume both count directed (symmetric) edges, so φ is an
    // exact integer ratio in micro-units. Two narrow label joins + three
    // map-combinable aggregations.
    "a_conductance" -> ((s, dir) => {
      val g = partGraph(s, dir).localCheckpoint()
      val labels = graft.operators.Graph.labelPropagation(g, "a", "b",
          iters = 3)
        .select(col("vertex").as("v"), col("community").as("lab"))
        .localCheckpoint() // read by the volume and both cut joins
      val deg = g.groupBy(col("a").as("v")).agg(count(lit(1)).as("d"))
      val vol = deg.join(labels, Seq("v"))
        .groupBy(col("lab")).agg(sum(col("d")).as("vol"))
        .localCheckpoint() // read by the total and the output join
      val tot = vol.agg(sum(col("vol")).as("tv"))
      val cut = g
        .join(labels.select(col("v").as("a"), col("lab").as("la")), Seq("a"))
        .join(labels.select(col("v").as("b"), col("lab").as("lb")), Seq("b"))
        .filter(col("la") =!= col("lb"))
        .groupBy(col("la").as("lab")).agg(count(lit(1)).as("cut_edges"))
      vol.join(cut, Seq("lab"), "left").crossJoin(broadcast(tot))
        .withColumn("cut0", coalesce(col("cut_edges"), lit(0L)))
        .withColumn("mvol", least(col("vol"), col("tv") - col("vol")))
        .select(col("lab").as("community"), col("vol"),
          col("cut0").as("cut_edges"),
          when(col("mvol") === 0, lit(0L))
            .otherwise(expr("(cut0 * 1000000) div mvol"))
            .as("conductance_q"))
        .orderBy(col("community"))
    }),

    // k-core density screen over the bipartite customer–part purchase
    // graph (vertex = customer, or part offset by 10⁹; edge = "bought at
    // least once", both directions): 4 synchronous peel rounds at k=20
    // strip the sparse periphery — the web-graph quality screen that
    // isolates the densely-interacting core. Fixed rounds keep the
    // oracle unrollable; the peel cascade here fixes in ≤4 rounds at
    // both gate scales (verified), so this IS the k-core. Degrees on
    // this graph are scale-INVARIANT (orders-per-customer and
    // customers-per-part are constant in sf), so the fixed k holds at
    // any sf.
    "a_kcore" -> ((s, dir) => {
      val cp = custPartPairs(s, dir)
      val e = cp.select(col("c").as("a"), col("p").as("b"))
        .unionByName(cp.select(col("p").as("a"), col("c").as("b")))
      graft.operators.Graph.kCorePeel(e, "a", "b", k = 20, iters = 4)
        .select(
          when(col("vertex") >= 1000000000L, lit("part")).otherwise(lit("cust"))
            .as("side"),
          when(col("vertex") >= 1000000000L, col("vertex") - 1000000000L)
            .otherwise(col("vertex")).as("node_id"),
          col("deg"))
        .orderBy(col("side"), col("node_id"))
    }),

    // HITS hubs & authorities over the directed customer→part purchase
    // graph: hub customers endorse authority parts; three max-normalized
    // integer rounds (bit-identical to the oracle's unrolled CTEs), then
    // the top 20 of each side. The part namespace offsets by 10⁹ so a
    // custkey can never alias a partkey.
    "a_hits" -> ((s, dir) => {
      val cp = custPartPairs(s, dir)
        .select(col("c").as("u"), col("p").as("v"))
      val r = graft.operators.Graph.hitsInt(cp, "u", "v", iters = 3)
        .localCheckpoint() // read twice (hub slice + auth slice)
      val auth = r.filter(col("auth").isNotNull)
        .orderBy(col("auth").desc, col("vertex")).limit(20)
        .select(lit("auth").as("role"),
          (col("vertex") - 1000000000L).as("node_id"),
          col("auth").as("score"))
      val hub = r.filter(col("hub").isNotNull)
        .orderBy(col("hub").desc, col("vertex")).limit(20)
        .select(lit("hub").as("role"), col("vertex").as("node_id"),
          col("hub").as("score"))
      auth.unionByName(hub)
        .orderBy(col("role"), col("score").desc, col("node_id"))
    }),

    // Poisson bootstrap (Chamandy et al. 2012 — the resampling scheme
    // that works WITHOUT knowing n or materializing resamples): each row
    // draws a hash-derived Poisson(1) weight per replicate, so 50
    // bootstrap means per return flag come from one 50× map-side
    // explosion straight into a combinable weighted aggregation — no
    // global sort, no row-index join, the only shuffle is flag×replicate
    // partials. Weights come from integer CDF cutoffs on a 2²⁰-ring
    // two-round hash (engine-exact; capped at 7, CDF residual 1e-5).
    "a_bootstrap_means" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .withColumn("rep", explode(sequence(lit(0), lit(49))))
      val u = ((col("l_orderkey") * lit(2654435761L)
        + col("l_linenumber").cast("long") * lit(97L)
        + col("rep").cast("long")) % lit(1048576L) * lit(2654435761L)
        + lit(12345L)) % lit(1048576L)
      val cuts = Seq(385749L, 771499L, 964373L, 1028665L, 1044738L,
        1047952L, 1048488L, 1048565L)
      val w = cuts.zipWithIndex.foldRight(lit(8L): org.apache.spark.sql.Column) {
        case ((c, k), rest) => when(u < c, k.toLong).otherwise(rest)
      }
      li.withColumn("w", w)
        .groupBy(col("l_returnflag"), col("rep"))
        .agg(sum(col("w")).as("n_eff"),
          sumStable(col("w").cast("double") * col("l_quantity")).as("sum_w"))
        .select(col("l_returnflag"), col("rep"), col("n_eff"),
          (col("sum_w") / col("n_eff").cast("double")).as("boot_mean"))
        .orderBy(col("l_returnflag"), col("rep"))
    }),

    // Spearman rank correlation of quantity vs price per return flag —
    // the robust (monotone-invariant) complement to a_regression_stats'
    // Pearson. Tie-corrected average ranks from min-rank + tie-count
    // windows (integer-exact), then the Pearson of the rank columns
    // through the decimal-stable moment sums. Per-flag windows follow the
    // a_price_quantiles precedent.
    "a_spearman" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag").as("f"),
          col("l_quantity").cast("double").as("x"), col("l_extendedprice").as("y"))
      def avgRank(c: String) = {
        import org.apache.spark.sql.expressions.Window
        val wr = Window.partitionBy(col("f")).orderBy(col(c))
        val wt = Window.partitionBy(col("f"), col(c))
        rank().over(wr).cast("double") +
          (count(lit(1)).over(wt).cast("double") - 1.0) / 2.0
      }
      val ranked = li
        .withColumn("rx", avgRank("x"))
        .withColumn("ry", avgRank("y"))
      val m = ranked.groupBy(col("f"))
        .agg(count(lit(1)).as("n"),
          sumStable(col("rx")).as("sx"), sumStable(col("ry")).as("sy"),
          sumStable(col("rx") * col("ry")).as("sxy"),
          sumStable(col("rx") * col("rx")).as("sxx"),
          sumStable(col("ry") * col("ry")).as("syy"))
      m.select(col("f").as("l_returnflag"), col("n"),
          graft.ops.Aggregations.pearsonFromMoments(col("n"), col("sx"),
            col("sy"), col("sxy"), col("sxx"), col("syy")).as("spearman"))
        .orderBy(col("l_returnflag"))
    }),

    // Closed-form ridge regression (price ~ quantity + discount): ONE
    // scan reduces to nine decimal-stable Gram sums, then every λ in the
    // grid is a free 1-row Cramer projection — sufficient statistics
    // once, hyperparameter sweep at zero extra scans. λ=0 is exact OLS.
    // Oracle retypes the identical determinant chain — value-exact.
    "a_ridge_check" -> ((s, dir) =>
      graft.ops.Ridge.fit2(Tables.load(s, dir, "lineitem"),
          "l_quantity", "l_discount", "l_extendedprice",
          Seq(0.0, 1000.0, 100000.0))
        .orderBy(col("lambda"))),

    // Chi-square independence screen between two categorical columns
    // (order priority × order status): per-cell (obs−exp)²/exp terms in
    // micro-units — quantized per cell, so the statistic Σ chi_q is an
    // order-free long sum. One contingency aggregation + broadcast
    // margins; scan-bound at any scale.
    "a_chi2_independence" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderpriority").as("r"), col("o_orderstatus").as("c"))
      val cells = o.groupBy(col("r"), col("c")).agg(count(lit(1)).as("n_obs"))
        .localCheckpoint() // feeds margins + the cell table
      val rowTot = cells.groupBy(col("r")).agg(sum(col("n_obs")).as("rt"))
      val colTot = cells.groupBy(col("c")).agg(sum(col("n_obs")).as("ct"))
      val tot = cells.agg(sum(col("n_obs")).as("n"))
      val exp0 = col("rt").cast("double") * col("ct").cast("double") /
        col("n").cast("double")
      val dev = col("n_obs").cast("double") - exp0
      cells
        .join(broadcast(rowTot), Seq("r"))
        .join(broadcast(colTot), Seq("c"))
        .crossJoin(broadcast(tot))
        .select(col("r").as("o_orderpriority"), col("c").as("o_orderstatus"),
          col("n_obs"),
          round(exp0 * lit(1e6)).cast("long").as("exp_q"),
          round(dev * dev / exp0 * lit(1e6)).cast("long").as("chi_q"))
        .orderBy(col("o_orderpriority"), col("o_orderstatus"))
    }),

    // Multi-source BFS layers: hop distance from the every-101st-part
    // seed set over the co-occurrence graph — the graph-distance feature
    // pass (trusted-set proximity). Exactly 3 synchronous min-propagation
    // rounds; unreached vertices stay null.
    "a_bfs_layers" -> ((s, dir) => {
      val seeds = Tables.load(s, dir, "part")
        .filter(col("p_partkey") % 101 === 0)
        .select(col("p_partkey"))
      graft.operators.Graph.bfsLayers(partGraph(s, dir), "a", "b",
          seeds, "p_partkey", maxDepth = 3)
        .select(col("vertex").as("part_id"), col("dist"))
        .orderBy(col("part_id"))
    }),

    // Sampled harmonic centrality (Boldi & Vigna 2014): Σ_seeds 1/d(s,v)
    // over a deterministic seed sample, each term as the exact integer
    // 10⁶ div d — the "how reachable is this node" score without
    // all-pairs distances. Per-seed BFS waves share one plan (seed rides
    // as a grouping column); the oracle unrolls the same rounds with the
    // seed column carried.
    // RFM (recency / frequency / monetary) customer segmentation with
    // TIE-COHERENT quintiles: scores come from comparing each customer
    // against the four exact 20/40/60/80% order-statistic boundaries
    // (Selection.exactQuantiles — two scans, no global-sort ntile, so the
    // segmentation survives 10⁹ customers), equal values always share a
    // score. Monetary is exact integer cents. rfm_code = r·100+f·10+m.
    "a_rfm_segments" -> ((s, dir) => {
      import graft.operators.Selection
      val orders = Tables.load(s, dir, "orders")
      val anchor = orders.agg(max(col("o_orderdate")).as("anchor"))
      val base = orders.groupBy(col("o_custkey"))
        .agg(max(col("o_orderdate")).as("last_order"),
          count(lit(1)).as("frequency"),
          sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
            .as("cents"))
        .crossJoin(broadcast(anchor))
        .select(col("o_custkey").as("custkey"),
          datediff(col("anchor"), col("last_order")).cast("long")
            .as("recency"),
          col("frequency"), col("cents"))
        .localCheckpoint() // read by three boundary scans + the scorer
      val fr = Seq(0.2, 0.4, 0.6, 0.8)
      def bounds(c: String): Seq[Double] =
        Selection.exactQuantiles(base, c, fr)
          .orderBy(col("frac")).select(col("value"))
          .collect().map(_.getDouble(0)).toSeq // 4 values: bounded fetch
      def above(c: String, bs: Seq[Double]) =
        bs.map(b => when(col(c) > lit(b), 1).otherwise(0))
          .reduce(_ + _)
      val (br, bf, bm) = (bounds("recency"), bounds("frequency"), bounds("cents"))
      base.select(col("custkey"), col("recency"), col("frequency"),
          col("cents"),
          (lit(5) - above("recency", br)).as("r_score"),
          (lit(1) + above("frequency", bf)).as("f_score"),
          (lit(1) + above("cents", bm)).as("m_score"))
        .withColumn("rfm_code",
          col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
        .orderBy(col("custkey"))
    }),

    // Sampled Brandes betweenness in fixed-point integers over the part
    // co-occurrence graph — seeds are the a_harmonic_centrality sample.
    // The oracle unrolls both passes: 3 BFS layers with exact path counts,
    // then the per-child-quantized dependency recursion (tq = ⌊(10⁶+δu)·
    // 10⁶/σu⌋ per child, δv = ⌊σv·Σtq/10⁶⌋) with every division replayed.
    "a_betweenness" -> ((s, dir) => {
      val seeds = Tables.load(s, dir, "part")
        .filter(col("p_partkey") % 101 === 0)
        .select(col("p_partkey"))
      graft.operators.Graph.betweennessInt(partGraph(s, dir), "a", "b",
          seeds, "p_partkey", maxDepth = 3)
        .select(col("vertex").as("part_id"), col("n_seeds"), col("bc_q"))
        .orderBy(col("part_id"))
    }),

    // Neighborhood function N(h) (the HyperANF statistic, computed EXACTLY
    // on the sampled seed set instead of with HLL registers): how many
    // (seed, vertex) pairs sit within h hops, with the cumulative fraction
    // of the depth-budget total in integer micro-units — the effective-
    // diameter read-off (smallest h with frac ≥ 0.9). Reuses the per-seed
    // BFS frames; one narrow aggregation over (seed, vertex, dist).
    "a_neighborhood_fn" -> ((s, dir) => {
      val seeds = Tables.load(s, dir, "part")
        .filter(col("p_partkey") % 101 === 0)
        .select(col("p_partkey"))
      // aggregate to ≤ 4 (dist, count) rows FIRST; the cumulative non-equi
      // join then touches only those 4 rows, never the pair frame
      val byDist = graft.operators.Graph.multiSourceDistances(
          partGraph(s, dir), "a", "b", seeds, "p_partkey", maxDepth = 3)
        .groupBy(col("dist")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val hs = byDist.sparkSession.range(0, 4).select(col("id").as("h"))
      val per = hs.join(byDist, col("dist") <= col("h"))
        .groupBy(col("h")).agg(sum(col("c")).as("n_pairs"))
      val tot = byDist.agg(sum(col("c")).as("n_total"))
      per.crossJoin(broadcast(tot))
        .select(col("h").cast("int").as("h"), col("n_pairs"),
          expr("(n_pairs * 1000000) div n_total").as("frac_q"))
        .orderBy(col("h"))
    }),

    // HyperANF: the neighborhood function via an HLL register per vertex
    // (Boldi-Rosa-Vigna) — the O(|V|·2^lgK) state shape that reaches
    // all-pairs territory where the exact bitmap caps at sampled sources.
    // Gated on the SAME source sample as a_neighborhood_fn so the exact
    // cumulative pair counts are independently recomputable: the oracle
    // replays the exact BFS; the register estimate must land within ±15%
    // of it per h (deterministic hashing — green is green forever).
    "a_hyperanf" -> ((s, dir) => {
      val seeds = Tables.load(s, dir, "part")
        .filter(col("p_partkey") % 101 === 0)
        .select(col("p_partkey"))
      val g = partGraph(s, dir).localCheckpoint() // shared by both paths
      val est = graft.operators.Graph.hyperAnf(g, "a", "b",
        seeds, "p_partkey", maxDepth = 3, lgK = 9)
      val byDist = graft.operators.Graph.multiSourceDistances(
          g, "a", "b", seeds, "p_partkey", maxDepth = 3)
        .groupBy(col("dist")).agg(count(lit(1)).as("c"))
        .localCheckpoint()
      val hs = byDist.sparkSession.range(0, 4).select(col("id").as("h"))
      val exact = hs.join(byDist, col("dist") <= col("h"))
        .groupBy(col("h")).agg(sum(col("c")).as("n_pairs"))
      exact.join(est, exact("h") === est("h"))
        .select(exact("h").cast("int").as("h"), col("n_pairs"),
          when(abs(col("est") - col("n_pairs")).cast("double") /
            col("n_pairs") <= 0.15, 1L).otherwise(0L).as("est_ok"))
        .orderBy(col("h"))
    }),

    "a_harmonic_centrality" -> ((s, dir) => {
      val seeds = Tables.load(s, dir, "part")
        .filter(col("p_partkey") % 101 === 0)
        .select(col("p_partkey"))
      graft.operators.Graph.multiSourceDistances(partGraph(s, dir),
          "a", "b", seeds, "p_partkey", maxDepth = 3)
        .filter(col("dist") > 0)
        .groupBy(col("vertex"))
        .agg(count(lit(1)).as("n_sources"),
          sum(expr("CAST(1000000 AS BIGINT) div dist")).as("h_micro"))
        .select(col("vertex").as("part_id"), col("n_sources"),
          col("h_micro"))
        .orderBy(col("part_id"))
    }),

    // Seeded label spreading: every 29th part carries class p%3; three
    // damped integer diffusion rounds (the PPR recurrence run for all
    // classes at once), then the per-vertex argmax class — the
    // semi-supervised label-propagation pass for spreading sparse human
    // labels over an interaction graph. Oracle unrolls the recurrence
    // per class and argmaxes with a window.
    "a_label_spread" -> ((s, dir) => {
      val seeds = Tables.load(s, dir, "part")
        .filter(col("p_partkey") % 29 === 0)
        .select(col("p_partkey"),
          (col("p_partkey") % 3).cast("long").as("cls"))
      graft.operators.Graph.labelSpread(partGraph(s, dir), "a", "b",
          seeds, "p_partkey", "cls", iters = 3)
        .select(col("vertex").as("part_id"), col("label"), col("mass"))
        .orderBy(col("part_id"))
    }),

    // Newman modularity of the 3-round LPA communities over the part
    // co-occurrence graph — the standard partition-quality score,
    // term-quantized per community so the cross-community sum is
    // order-free. One row per community; Σ term_q is Q in 1e-8 units.
    "a_modularity" -> ((s, dir) => {
      val e = partGraph(s, dir).localCheckpoint()
      val lab = graft.operators.Graph.labelPropagation(e, "a", "b", iters = 3)
      graft.operators.Graph
        .modularityTerms(e, "a", "b", lab, "vertex", "community")
        .orderBy(col("community"))
    }),

    // Degree assortativity (Newman, PRL 2002): the Pearson correlation of
    // endpoint degrees over the symmetric edge list — do hubs link hubs?
    // Same decimal-exact moment-sum discipline as a_regression_stats.
    "a_assortativity" -> ((s, dir) => {
      val e = partGraph(s, dir).localCheckpoint()
      val deg = e.groupBy(col("a")).agg(count(lit(1)).as("d"))
      val pairs = e
        .join(deg.select(col("a"), col("d").as("dx")), Seq("a"))
        .join(deg.select(col("a").as("b"), col("d").as("dy")), Seq("b"))
        .select(col("dx").cast("double").as("x"),
          col("dy").cast("double").as("y"))
      val m = pairs.agg(count(lit(1)).as("n"),
        sumStable(col("x")).as("sx"), sumStable(col("y")).as("sy"),
        sumStable(col("x") * col("y")).as("sxy"),
        sumStable(col("x") * col("x")).as("sxx"),
        sumStable(col("y") * col("y")).as("syy"))
      m.select(col("n"),
        graft.ops.Aggregations.pearsonFromMoments(col("n"), col("sx"),
          col("sy"), col("sxy"), col("sxx"), col("syy"))
          .as("assortativity"))
    }),

    // DeepWalk-style walk corpus over the part co-occurrence graph: two
    // deterministic 3-hop walks from every 31st part — the sampling pass
    // that feeds skip-gram graph-embedding training. The LCG neighbor
    // choice is plain integer arithmetic, so the oracle replays every
    // hop exactly.
    "a_walk_corpus" -> ((s, dir) =>
      walkFrame(s, dir).orderBy(col("start"), col("walk"), col("step"))),

    // Skip-gram training pairs from the walk corpus (word2vec over
    // graphs): every ordered (center, context) pair within window 2
    // along each walk, counted — the direct input to embedding training.
    // One self-equi-join per walk key (walks are 4 rows each, so the
    // pair fan-out is a small constant) + one map-combinable count.
    "a_skipgram_pairs" -> ((s, dir) => {
      val w = walkFrame(s, dir).localCheckpoint() // both join sides
      w.as("x").join(w.as("y"),
          col("x.start") === col("y.start") && col("x.walk") === col("y.walk")
            && col("x.step") =!= col("y.step")
            && abs(col("x.step") - col("y.step")) <= 2)
        .groupBy(col("x.vertex").as("center"), col("y.vertex").as("context"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("center"), col("context"))
    }),

    // Pareto frontier (2-D skyline) of parts maximizing (size, price) —
    // the "best trade-off set" shape. The operator needs no dominance
    // join (per-x max + distributed running-max filter + duplicate-
    // preserving semi-join back); the oracle is the textbook NOT EXISTS
    // dominance anti-join — structurally independent mechanisms that must
    // agree row-for-row.
    "a_skyline_parts" -> ((s, dir) =>
      graft.operators.Skyline.skyline2(
        Tables.load(s, dir, "part")
          .select(col("p_partkey"), col("p_size"), col("p_retailprice")),
        "p_size", "p_retailprice")
        .orderBy(col("p_size").desc, col("p_retailprice").desc,
          col("p_partkey"))),

    // Bivariate statistics per return flag: Pearson correlation and the
    // simple-OLS slope/intercept of extendedprice on quantity, all derived
    // from decimal-exact Σx/Σy/Σxy/Σx²/Σy² (order-insensitive merges, so
    // 1000-executor results are bit-equal to the oracle) through the SAME
    // double expression shape in both engines. One mergeable aggregation.
    "a_regression_stats" -> ((s, dir) => {
      import graft.ops.Aggregations.sumStable
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").as("y"))
      val m = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sumStable(col("x")).as("sx"), sumStable(col("y")).as("sy"),
          sumStable(col("x") * col("y")).as("sxy"),
          sumStable(col("x") * col("x")).as("sxx"),
          sumStable(col("y") * col("y")).as("syy"))
      val nd = col("n").cast("double")
      val covN = col("sxy") - col("sx") * col("sy") / nd
      val varX = col("sxx") - col("sx") * col("sx") / nd
      val varY = col("syy") - col("sy") * col("sy") / nd
      m.select(col("l_returnflag"), col("n"),
          col("sx"), col("sy"),
          covN.as("cov_n"), varX.as("var_x_n"), varY.as("var_y_n"))
        .select(col("l_returnflag"), col("n"),
          (col("cov_n") / sqrt(col("var_x_n") * col("var_y_n"))).as("corr"),
          (col("cov_n") / col("var_x_n")).as("slope"),
          col("sx"), col("sy"))
        .select(col("l_returnflag"), col("n"), col("corr"), col("slope"),
          ((col("sy") - col("slope") * col("sx")) /
            col("n").cast("double")).as("intercept"))
        .orderBy(col("l_returnflag"))
    }),

    // Market-basket co-occurrence with lift: brand pairs co-ordered in the
    // same order, ranked by support with quantized lift — association-rule
    // mining's first pass. Scale shape: the per-order brand set is bounded
    // (≤7 lines/order in TPC-H), so the self-join on l_orderkey explodes
    // at most |lines|²/2 per order — LINEAR in orders, not quadratic in
    // brands; the (order, brand) table stages once and feeds the pair
    // join, the brand marginals, and the order total; marginals broadcast.
    "a_basket_lift" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"))
      val pt = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"))
      val ob = li.join(pt, col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
        .distinct()
        .localCheckpoint()
      val tot = ob.agg(countDistinct(col("ok")).as("n_orders"))
      val bc = ob.groupBy(col("b")).agg(count(lit(1)).as("cb"))
      val pairs = ob.as("x")
        .join(ob.as("y"), col("x.ok") === col("y.ok") && col("x.b") < col("y.b"))
        .groupBy(col("x.b").as("b1"), col("y.b").as("b2"))
        .agg(count(lit(1)).as("pair_n"))
      pairs
        .join(broadcast(bc.select(col("b").as("b1"), col("cb").as("c1"))), Seq("b1"))
        .join(broadcast(bc.select(col("b").as("b2"), col("cb").as("c2"))), Seq("b2"))
        .crossJoin(broadcast(tot))
        .select(col("b1"), col("b2"), col("pair_n"),
          round(col("pair_n").cast("double") * col("n_orders").cast("double") /
            (col("c1").cast("double") * col("c2").cast("double")) * lit(1e6))
            .cast("long").as("lift_q"))
        .orderBy(col("pair_n").desc, col("b1"), col("b2"))
        .limit(20)
    }),

    // Item-item collaborative-filtering neighbors at PART granularity
    // (data-sized, unlike the bounded-brand basket lift): cosine² between
    // order-basket occurrence vectors, quantized to pico-units in
    // DECIMAL(38,0) (sqrt-free — cos² preserves the ranking), top-3 per
    // part via the bounded k-heap [[graft.operators.TopK.perKey]]. Scale
    // posture: the pair fan-out is per-ORDER (Σ basket², baskets are small
    // by domain), pair counts and part counts are map-combinable, and the
    // final reduction exchanges ≤ partitions·k rows per part — never a
    // per-part window over all neighbors.
    "a_item_cosine" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
        .localCheckpoint() // feeds the counts AND the pair join
      val pc = li.groupBy(col("pk")).agg(count(lit(1)).as("c"))
      val pairs = li.as("x")
        .join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.pk") =!= col("y.pk"))
        .groupBy(col("x.pk").as("part_id"), col("y.pk").as("nb"))
        .agg(count(lit(1)).as("co"))
      val scored = pairs
        .join(pc.select(col("pk").as("part_id"), col("c").as("ci")),
          Seq("part_id"))
        .join(pc.select(col("pk").as("nb"), col("c").as("cj")), Seq("nb"))
        .select(col("part_id"), col("nb").as("neighbor_id"),
          expr("CAST((CAST(1000000000000 AS DECIMAL(38,0)) * co * co) " +
            "div (CAST(ci AS DECIMAL(38,0)) * cj) AS BIGINT)").as("cos2_q"))
      graft.operators.TopK
        .perKey(scored, "part_id", "cos2_q", "neighbor_id", 3,
          descending = true)
        .select(col("part_id"), col("neighbor_id"),
          col("cos2_q").cast("long").as("cos2_q"), col("rank"))
        .orderBy(col("part_id"), col("rank"))
    }),

    // Exact positional quantiles (percentile_disc semantics): the value at
    // rank ceil(p·n) under a total order — reproducible across engines,
    // unlike interpolating percentile functions whose fp arithmetic
    // differs. One window + one filter; no global sort.
    "a_price_quantiles" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      val ranked = o
        .withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("o_orderstatus"))))
      ranked
        .groupBy(col("o_orderstatus"))
        .agg(
          max(when(col("__rn") === ceil(col("__n") * 0.5), col("o_totalprice")))
            .as("p50"),
          max(when(col("__rn") === ceil(col("__n") * 0.9), col("o_totalprice")))
            .as("p90"))
        .orderBy(col("o_orderstatus"))
    }),

    // Explicit GROUPING SETS: (year, status), (year), () — with grouping_id
    // to disambiguate the null markers.
    "g_grouping_sets" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .select(year(col("o_orderdate")).as("y"), col("o_orderstatus"),
          col("o_totalprice"))
        .groupingSets(
          Seq(Seq(col("y"), col("o_orderstatus")), Seq(col("y")), Seq()),
          col("y"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sumStable(col("o_totalprice")).as("total_sales"))
        .select(coalesce(col("y"), lit(-1)).as("y"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
          col("n"), col("total_sales"))
        .orderBy(col("y"), col("o_orderstatus"))))

  private def stable(expr: String) =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"

  /** Oracle mirror of [[walkFrame]]: the deterministic-walk CTE chain,
    * ending in a `walks(start, walk, step, vertex)` relation.
    */
  private def walkCtes: String = {
    // one deterministic hop: LCG-pick a neighbor index mod degree
    def hop(k: Int): String =
      s"""s$k AS (SELECT s.start, s.walk, $k AS step, adj.b AS vertex
         |  FROM s${k - 1} s JOIN deg ON deg.a = s.vertex
         |  JOIN adj ON adj.a = s.vertex
         |    AND adj.idx = (s.vertex * 1103515245 + s.walk * 12345
         |      + $k * 2747636419 + 12345) % deg.d)""".stripMargin
    s"""op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
       |    FROM lineitem),
       |e AS (SELECT DISTINCT x.p AS a, y.p AS b
       |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
       |adj AS (SELECT a, b,
       |    CAST(row_number() OVER (PARTITION BY a ORDER BY b) - 1
       |      AS BIGINT) AS idx
       |  FROM e),
       |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY a),
       |st AS (SELECT CAST(p_partkey AS BIGINT) AS start FROM part
       |  WHERE p_partkey % 31 = 0),
       |s0 AS (SELECT start, w.walk, 0 AS step, start AS vertex
       |  FROM st CROSS JOIN (VALUES (0), (1)) w(walk)),
       |${hop(1)},
       |${hop(2)},
       |${hop(3)},
       |walks AS (SELECT start, walk, step, vertex FROM s0
       |  UNION ALL SELECT * FROM s1
       |  UNION ALL SELECT * FROM s2
       |  UNION ALL SELECT * FROM s3)""".stripMargin
  }

  override def oracleSql: Map[String, String] = Map(
    "q13_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q18_large_orders" ->
      s"""WITH big AS (
         |  SELECT l_orderkey, ${stable("l_quantity")} AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING ${stable("l_quantity")} > 160)
         |SELECT c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
         |FROM big
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,

    "q17_small_qty_revenue" ->
      s"""WITH a AS (
         |  SELECT l_partkey AS p_key,
         |    ${stable("l_quantity")} / COUNT(l_quantity) AS avg_qty
         |  FROM lineitem GROUP BY l_partkey)
         |SELECT ${stable("l_extendedprice")} AS total_price,
         |  COUNT(*) AS n_lines
         |FROM lineitem JOIN a ON l_partkey = p_key
         |WHERE l_quantity < avg_qty * 0.5""".stripMargin,

    "q22_idle_balances" ->
      s"""SELECT c_mktsegment, COUNT(*) AS n_custs,
         |  ${stable("c_acctbal")} AS total_bal
         |FROM customer c
         |WHERE c_acctbal > (
         |    SELECT ${stable("c_acctbal")} / COUNT(*)
         |    FROM customer WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (SELECT 1 FROM orders o
         |    WHERE o.o_custkey = c.c_custkey
         |      AND o.o_orderdate >= TIMESTAMP '2000-01-01')
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin,

    "q4_late_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |  WHERE l.l_orderkey = o.o_orderkey
        |    AND l.l_shipdate > o.o_orderdate + INTERVAL 75 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "a_corr_order_counts" ->
      """SELECT c_custkey, c_acctbal,
        |  (SELECT COUNT(*) FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        |    AS n_big_orders
        |FROM customer c
        |WHERE c_acctbal > 9000
        |ORDER BY c_custkey""".stripMargin,

    "q21_sole_late_supplier" ->
      """SELECT l1.l_suppkey AS s_suppkey,
        |  COUNT(DISTINCT l1.l_orderkey) AS n_orders
        |FROM lineitem l1 JOIN orders o1 ON o1.o_orderkey = l1.l_orderkey
        |WHERE o1.o_orderstatus = 'F'
        |  AND l1.l_shipdate > o1.o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
        |GROUP BY l1.l_suppkey
        |ORDER BY n_orders DESC, s_suppkey
        |LIMIT 10""".stripMargin,

    "a_triangle_count" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |    FROM lineitem JOIN part ON l_partkey = p_partkey),
        |pw AS (SELECT x.b AS a, y.b AS b, CAST(count(*) AS BIGINT) AS w
        |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
        |  GROUP BY x.b, y.b),
        |r AS (SELECT w, row_number() OVER (ORDER BY w, a, b) AS rn,
        |    COUNT(*) OVER () AS n FROM pw),
        |med AS (SELECT max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
        |    THEN w END) AS med FROM r),
        |e AS (SELECT a, b FROM pw CROSS JOIN med WHERE w > med),
        |tri AS (SELECT e1.a, e1.b AS m, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles,
        |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges""".stripMargin,

    "a_benford" ->
      """WITH d AS (SELECT substring(CAST(CAST(floor(l_extendedprice * 100
        |      + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS digit FROM lineitem),
        |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n_obs
        |  FROM d GROUP BY digit),
        |t AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM c)
        |SELECT digit, n_obs, n_total,
        |  CAST(round(log10(CAST(1.0 AS DOUBLE)
        |    + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)) * 1000000)
        |    AS BIGINT) AS exp_q,
        |  CAST(round((CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE)
        |      * log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)))
        |    * (CAST(n_obs AS DOUBLE) - CAST(n_total AS DOUBLE)
        |      * log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)))
        |    / (CAST(n_total AS DOUBLE)
        |      * log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)))
        |    * 1000000) AS BIGINT) AS chi_q
        |FROM c CROSS JOIN t
        |ORDER BY digit""".stripMargin,

    "a_clustering_coeff" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |    FROM lineitem JOIN part ON l_partkey = p_partkey),
        |pw AS (SELECT x.b AS a, y.b AS b, CAST(count(*) AS BIGINT) AS w
        |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
        |  GROUP BY x.b, y.b),
        |r AS (SELECT w, row_number() OVER (ORDER BY w, a, b) AS rn,
        |    COUNT(*) OVER () AS n FROM pw),
        |med AS (SELECT max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
        |    THEN w END) AS med FROM r),
        |e AS (SELECT a, b FROM pw CROSS JOIN med WHERE w > med),
        |tri AS (SELECT e1.a, e1.b AS m, e2.b AS c
        |  FROM e e1 JOIN e e2 ON e1.b = e2.a
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tv AS (SELECT a AS v FROM tri UNION ALL SELECT m FROM tri
        |  UNION ALL SELECT c FROM tri),
        |tpv AS (SELECT v, CAST(count(*) AS BIGINT) AS n_tri FROM tv GROUP BY v),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS deg
        |  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v)
        |SELECT deg.v AS vertex, deg, COALESCE(n_tri, 0) AS n_tri,
        |  CASE WHEN deg >= 2 THEN CAST(2.0 AS DOUBLE)
        |      * CAST(COALESCE(n_tri, 0) AS DOUBLE)
        |      / CAST(deg * (deg - 1) AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END AS coeff
        |FROM deg LEFT JOIN tpv ON tpv.v = deg.v
        |ORDER BY vertex""".stripMargin,

    "a_ktruss" -> {
      // one synchronous peel round r: triangles of e{r-1} (oriented a<m<c),
      // per-edge support via the 3-corner union, survivors keep sup >= 10
      def peel(r: Int): String =
        s"""t$r AS (SELECT e1.a AS a, e1.b AS m, e2.b AS c
           |  FROM e${r - 1} e1 JOIN e${r - 1} e2 ON e1.b = e2.a
           |  JOIN e${r - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
           |s$r AS MATERIALIZED (SELECT x AS a, y AS b, count(*) AS sup FROM (
           |    SELECT a AS x, m AS y FROM t$r
           |    UNION ALL SELECT m AS x, c AS y FROM t$r
           |    UNION ALL SELECT a AS x, c AS y FROM t$r) GROUP BY x, y),
           |e$r AS MATERIALIZED (SELECT e.a, e.b FROM e${r - 1} e
           |  JOIN s$r s ON e.a = s.a AND e.b = s.b AND s.sup >= 10)""".stripMargin
      s"""WITH ob AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
         |    FROM lineitem JOIN part ON l_partkey = p_partkey),
         |pw AS MATERIALIZED (SELECT x.b AS a, y.b AS b, CAST(count(*) AS BIGINT) AS w
         |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b
         |  GROUP BY x.b, y.b),
         |r AS (SELECT w, row_number() OVER (ORDER BY w, a, b) AS rn,
         |    COUNT(*) OVER () AS n FROM pw),
         |med AS (SELECT max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT)
         |    THEN w END) AS med FROM r),
         |e0 AS MATERIALIZED (SELECT a, b FROM pw CROSS JOIN med WHERE w > med),
         |${peel(1)},
         |${peel(2)},
         |${peel(3)},
         |tf AS (SELECT e1.a AS a, e1.b AS m, e2.b AS c
         |  FROM e3 e1 JOIN e3 e2 ON e1.b = e2.a
         |  JOIN e3 e3x ON e3x.a = e1.a AND e3x.b = e2.b),
         |sf AS (SELECT x AS a, y AS b, CAST(count(*) AS BIGINT) AS sup FROM (
         |    SELECT a AS x, m AS y FROM tf
         |    UNION ALL SELECT m AS x, c AS y FROM tf
         |    UNION ALL SELECT a AS x, c AS y FROM tf) GROUP BY x, y)
         |SELECT e.a, e.b, CAST(COALESCE(sf.sup, 0) AS BIGINT) AS support
         |FROM e3 e LEFT JOIN sf ON e.a = sf.a AND e.b = sf.b
         |ORDER BY e.a, e.b""".stripMargin
    },

    "a_link_prediction" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |  FROM lineitem WHERE l_partkey % 5 = 0),
        |e AS (SELECT DISTINCT x.p AS u, y.p AS v
        |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
        |deg AS (SELECT u AS w, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY u),
        |wts AS (SELECT w,
        |    CAST(round(1000000.0 / ln(CAST(d AS DOUBLE))) AS BIGINT) AS aw
        |  FROM deg WHERE d >= 2 AND d <= 1000),
        |half AS (SELECT e.u, e.v AS w, wts.aw FROM e JOIN wts ON e.v = wts.w),
        |pairs AS (SELECT l.u AS u, r.u AS v, l.aw FROM half l JOIN half r
        |  ON l.w = r.w AND l.u < r.u),
        |cand AS (SELECT u, v, CAST(sum(aw) AS BIGINT) AS aa_q
        |  FROM pairs GROUP BY u, v),
        |adj AS (SELECT u, v FROM e WHERE u < v)
        |SELECT c.u, c.v, c.aa_q FROM cand c
        |LEFT JOIN adj ON c.u = adj.u AND c.v = adj.v
        |WHERE adj.u IS NULL
        |ORDER BY aa_q DESC, c.u, c.v LIMIT 20""".stripMargin,

    "a_scc_parts" -> {
      // full coloring replay: per outer round, 10 monotone min-propagation
      // steps for the forward closure (fixpoint measured at 5 — spent
      // steps are no-ops), the color-restricted edge set, a 10-step
      // forward flood from each color pivot, one-SCC-per-color assignment,
      // residual active set; 3 outer rounds (round 1 resolves the giant
      // SCC)
      val O = 3
      val P = 10
      def outer(k: Int): String = {
        val fprop = (1 to P).map(j =>
          s"""fw${k}_$j AS MATERIALIZED (SELECT t.v, min(t.l) AS l
             |  FROM (SELECT v, l FROM fw${k}_${j - 1}
             |    UNION ALL SELECT ea$k.a AS v, z.l
             |    FROM ea$k JOIN fw${k}_${j - 1} z ON z.v = ea$k.b)
             |    t
             |  GROUP BY t.v)""".stripMargin).mkString(",\n")
        val flood = (1 to P).map(j =>
          s"""r${k}_$j AS MATERIALIZED (SELECT v FROM r${k}_${j - 1}
             |  UNION SELECT ce.b AS v
             |  FROM ce$k ce JOIN r${k}_${j - 1} x ON x.v = ce.a)"""
            .stripMargin).mkString(",\n")
        s"""ea$k AS MATERIALIZED (SELECT e.a, e.b
           |  FROM e JOIN act${k - 1} x ON e.a = x.v
           |         JOIN act${k - 1} y ON e.b = y.v),
           |fw${k}_0 AS MATERIALIZED (SELECT v, v AS l FROM act${k - 1}),
           |$fprop,
           |ce$k AS MATERIALIZED (SELECT ea.a, ea.b FROM ea$k ea
           |  JOIN fw${k}_$P fa ON fa.v = ea.a
           |  JOIN fw${k}_$P fb ON fb.v = ea.b
           |  WHERE fa.l = fb.l),
           |r${k}_0 AS MATERIALIZED (SELECT v FROM fw${k}_$P WHERE v = l),
           |$flood,
           |new$k AS MATERIALIZED (SELECT f.v, f.l AS scc
           |  FROM fw${k}_$P f JOIN r${k}_$P r ON r.v = f.v),
           |act$k AS MATERIALIZED (SELECT v FROM act${k - 1}
           |  EXCEPT SELECT v FROM new$k)""".stripMargin
      }
      val news = (1 to O).map(k => s"SELECT v, scc FROM new$k")
        .mkString("\n    UNION ALL ")
      s"""WITH li AS MATERIALIZED (SELECT l_orderkey AS ok,
         |    l_linenumber AS ln, l_partkey AS p FROM lineitem),
         |e AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM li x JOIN li y ON x.ok = y.ok AND y.ln = x.ln + 1
         |  WHERE x.p <> y.p),
         |verts AS MATERIALIZED (SELECT a AS v FROM e UNION SELECT b FROM e),
         |act0 AS MATERIALIZED (SELECT v FROM verts),
         |${(1 to O).map(outer).mkString(",\n")}
         |SELECT verts.v AS vertex, CAST(COALESCE(n.scc, -1) AS BIGINT)
         |    AS scc_id
         |FROM verts LEFT JOIN ($news) n ON n.v = verts.v
         |ORDER BY vertex""".stripMargin
    },

    "a_mst_suppliers" -> {
      // full Borůvka replay: per round, (w, u, v)-argmin per component
      // (window mirror of the engine's min-struct), 2-cycle break toward
      // the smaller label, then exactly 10 pointer-doubling jumps (2^10 >
      // |components| at BOTH the sf0.01 gate and the sf0.1 depth run, so
      // every chain reaches its root — the engine's early-exit fixpoint
      // lands on the same labels). 10 rounds ≥ ⌈log₂ n⌉; spent rounds
      // select nothing and are no-ops.
      val R = 10
      val J = 10
      def round(k: Int): String = {
        val jumps = (1 to J).map(j =>
          s"""p${k}_$j AS MATERIALIZED (SELECT x.c, y.p
             |  FROM p${k}_${j - 1} x JOIN p${k}_${j - 1} y ON x.p = y.c)"""
            .stripMargin).mkString(",\n")
        s"""lab$k AS MATERIALIZED (SELECT e.u, e.v, e.w, cu.c AS cu,
           |    cv.c AS cv
           |  FROM e JOIN comp${k - 1} cu ON cu.vx = e.u
           |         JOIN comp${k - 1} cv ON cv.vx = e.v
           |  WHERE cu.c <> cv.c),
           |sel$k AS MATERIALIZED (SELECT c, w, u, v, t FROM (
           |    SELECT c, w, u, v, t,
           |      row_number() OVER (PARTITION BY c ORDER BY w, u, v) AS rn
           |    FROM (SELECT cu AS c, w, u, v, cv AS t FROM lab$k
           |          UNION ALL SELECT cv, w, u, v, cu FROM lab$k))
           |  WHERE rn = 1),
           |hook$k AS MATERIALIZED (SELECT x.c,
           |    CASE WHEN y.t = x.c AND x.t > x.c THEN x.c ELSE x.t END AS p
           |  FROM sel$k x LEFT JOIN sel$k y ON x.t = y.c),
           |p${k}_0 AS MATERIALIZED (SELECT cs.c, COALESCE(hook$k.p, cs.c) AS p
           |  FROM (SELECT DISTINCT c FROM comp${k - 1}) cs
           |  LEFT JOIN hook$k USING (c)),
           |$jumps,
           |comp$k AS MATERIALIZED (SELECT comp${k - 1}.vx, p${k}_$J.p AS c
           |  FROM comp${k - 1} JOIN p${k}_$J ON comp${k - 1}.c = p${k}_$J.c)"""
          .stripMargin
      }
      val sels = (1 to R).map(k => s"SELECT u, v, w FROM sel$k")
        .mkString("\n  UNION ")
      s"""WITH $supplierGraphSql,
         |comp0 AS MATERIALIZED (SELECT vx, vx AS c FROM verts),
         |${(1 to R).map(round).mkString(",\n")}
         |SELECT u AS id_a, v AS id_b, w AS w_q FROM (
         |  $sels)
         |ORDER BY id_a, id_b""".stripMargin
    },

    "a_mis_suppliers" -> {
      // Luby replay: per round the active-subgraph neighbor-minimum of
      // md5 priorities (collision-free at this cardinality, so the md5
      // order IS the engine's (md5, vertex) struct order), winners beat
      // their minimum or have no live neighbors, winners ∪ dominated
      // deactivate. 12 rounds ≫ the observed convergence; spent rounds
      // are no-ops on the empty active set.
      val R = 12
      def round(k: Int): String =
        s"""nm$k AS MATERIALIZED (SELECT ed.a AS vx,
           |    min(md5(CAST(ed.b AS VARCHAR))) AS m
           |  FROM ed JOIN act${k - 1} x ON ed.a = x.vx
           |          JOIN act${k - 1} y ON ed.b = y.vx
           |  GROUP BY ed.a),
           |win$k AS MATERIALIZED (SELECT x.vx
           |  FROM act${k - 1} x LEFT JOIN nm$k ON nm$k.vx = x.vx
           |  WHERE nm$k.vx IS NULL OR md5(CAST(x.vx AS VARCHAR)) < nm$k.m),
           |dom$k AS MATERIALIZED (SELECT DISTINCT ed.b AS vx
           |  FROM ed JOIN win$k w ON ed.a = w.vx),
           |act$k AS MATERIALIZED (SELECT vx FROM act${k - 1}
           |  EXCEPT SELECT vx FROM win$k EXCEPT SELECT vx FROM dom$k)"""
          .stripMargin
      val wins = (1 to R).map(k => s"SELECT vx, $k AS rnd FROM win$k")
        .mkString("\n  UNION ALL ")
      s"""WITH $supplierGraphSql,
         |ed AS MATERIALIZED (SELECT u AS a, v AS b FROM e
         |  UNION ALL SELECT v, u FROM e),
         |act0 AS MATERIALIZED (SELECT vx FROM verts),
         |${(1 to R).map(round).mkString(",\n")},
         |wr AS ($wins)
         |SELECT verts.vx AS vertex,
         |  CAST(COALESCE(wr.rnd, 0) AS BIGINT) AS mis_round
         |FROM verts LEFT JOIN wr ON wr.vx = verts.vx
         |ORDER BY vertex""".stripMargin
    },

    "a_pagerank_parts" -> {
      // one damped integer round: rK = 150000 + (85 * Σ r_{K-1}//d) // 100;
      // SUM widens to HUGEINT in DuckDB — all arithmetic stays integral and
      // the final CAST to BIGINT restores Spark's type exactly
      def round(k: Int): String =
        s"""c$k AS (SELECT e.b AS vv, SUM(r${k - 1}.r // deg.d) AS s
           |  FROM e JOIN deg ON e.a = deg.a JOIN r${k - 1} ON r${k - 1}.v = e.a
           |  GROUP BY e.b),
           |r$k AS (SELECT v.v,
           |    CAST(150000 + (85 * COALESCE(c$k.s, 0)) // 100 AS BIGINT) AS r
           |  FROM v LEFT JOIN c$k ON c$k.vv = v.v)""".stripMargin
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |    FROM lineitem),
         |e AS (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY a),
         |v AS (SELECT a AS v FROM e UNION SELECT b FROM e),
         |r0 AS (SELECT v, CAST(1000000 AS BIGINT) AS r FROM v),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT v AS part_id, r AS rank_micro FROM r3
         |ORDER BY rank_micro DESC, part_id LIMIT 20""".stripMargin
    },

    "a_ppr_parts" -> {
      // one damped personalized round: teleport only to the seed flag
      def pround(k: Int): String =
        s"""c$k AS (SELECT e.b AS vv, SUM(r${k - 1}.r // deg.d) AS s
           |  FROM e JOIN deg ON e.a = deg.a JOIN r${k - 1} ON r${k - 1}.v = e.a
           |  GROUP BY e.b),
           |r$k AS (SELECT v.v,
           |    CAST(v.sd * 150000 + (85 * COALESCE(c$k.s, 0)) // 100 AS BIGINT) AS r
           |  FROM v LEFT JOIN c$k ON c$k.vv = v.v)""".stripMargin
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |    FROM lineitem),
         |e AS (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY a),
         |v AS (SELECT v, CASE WHEN v % 53 = 0 THEN 1 ELSE 0 END AS sd
         |  FROM (SELECT a AS v FROM e UNION SELECT b FROM e)),
         |r0 AS (SELECT v, CAST(sd * 1000000 AS BIGINT) AS r FROM v),
         |${pround(1)},
         |${pround(2)},
         |${pround(3)}
         |SELECT v AS part_id, r AS rank_micro FROM r3
         |ORDER BY rank_micro DESC, part_id LIMIT 20""".stripMargin
    },

    "a_communities" -> {
      // one synchronous round: count neighbor labels, window-argmax with
      // (count desc, label asc), isolated vertices keep their own label
      def lpRound(k: Int): String =
        s"""c$k AS (SELECT e.b AS vv, l.lab, count(*) AS c
           |  FROM e JOIN l${k - 1} l ON l.v = e.a GROUP BY e.b, l.lab),
           |w$k AS (SELECT vv, lab FROM (
           |    SELECT vv, lab,
           |      row_number() OVER (PARTITION BY vv ORDER BY c DESC, lab) AS rn
           |    FROM c$k) WHERE rn = 1),
           |l$k AS (SELECT v.v, COALESCE(w$k.lab, v.v) AS lab
           |  FROM v LEFT JOIN w$k ON w$k.vv = v.v)""".stripMargin
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |    FROM lineitem),
         |e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |v AS (SELECT a AS v FROM e0 UNION SELECT b FROM e0),
         |e AS (SELECT a, b FROM e0 UNION ALL SELECT v, v FROM v),
         |l0 AS (SELECT v, v AS lab FROM v),
         |${lpRound(1)},
         |${lpRound(2)},
         |${lpRound(3)}
         |SELECT v AS part_id, CAST(lab AS BIGINT) AS community FROM l3
         |ORDER BY part_id""".stripMargin
    },

    "a_degree_powerlaw" ->
      """WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
        |    FROM lineitem),
        |e AS (SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
        |deg AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS d
        |  FROM e GROUP BY a),
        |ext AS (SELECT CAST(min(d) AS BIGINT) AS dmin,
        |    CAST(max(d) AS BIGINT) AS dmax,
        |    CAST(count(*) AS BIGINT) AS n FROM deg),
        |s AS (SELECT n, dmin, dmax,
        |    CAST(sum(CAST(round(ln(CAST(d AS DOUBLE) / CAST(dmin AS DOUBLE))
        |      * 1000000) AS BIGINT)) AS BIGINT) AS sum_ln_q
        |  FROM deg CROSS JOIN ext GROUP BY n, dmin, dmax)
        |SELECT n AS n_vertices, dmin AS d_min, dmax AS d_max, sum_ln_q,
        |  CAST(CASE WHEN sum_ln_q <= 0 THEN 0
        |    ELSE 1000000 + (n * 1000000000000) // sum_ln_q END AS BIGINT)
        |    AS alpha_q
        |FROM s""".stripMargin,

    "a_conductance" -> {
      // a_communities' unrolled LPA labels, then directed cut / volume
      def lpRound(k: Int): String =
        s"""c$k AS (SELECT e.b AS vv, l.lab, count(*) AS c
           |  FROM e JOIN l${k - 1} l ON l.v = e.a GROUP BY e.b, l.lab),
           |w$k AS (SELECT vv, lab FROM (
           |    SELECT vv, lab,
           |      row_number() OVER (PARTITION BY vv ORDER BY c DESC, lab) AS rn
           |    FROM c$k) WHERE rn = 1),
           |l$k AS (SELECT v.v, COALESCE(w$k.lab, v.v) AS lab
           |  FROM v LEFT JOIN w$k ON w$k.vv = v.v)""".stripMargin
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |    FROM lineitem),
         |e0 AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |v AS (SELECT a AS v FROM e0 UNION SELECT b FROM e0),
         |e AS (SELECT a, b FROM e0 UNION ALL SELECT v, v FROM v),
         |l0 AS (SELECT v, v AS lab FROM v),
         |${lpRound(1)},
         |${lpRound(2)},
         |${lpRound(3)},
         |lab AS MATERIALIZED (SELECT v, lab FROM l3),
         |deg AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS d
         |  FROM e0 GROUP BY a),
         |vol AS MATERIALIZED (SELECT lab, CAST(sum(d) AS BIGINT) AS vol
         |  FROM deg JOIN lab USING (v) GROUP BY lab),
         |tot AS (SELECT CAST(sum(vol) AS BIGINT) AS tv FROM vol),
         |cut AS (SELECT la.lab, CAST(count(*) AS BIGINT) AS cut
         |  FROM e0 JOIN lab la ON la.v = e0.a JOIN lab lb ON lb.v = e0.b
         |  WHERE la.lab <> lb.lab GROUP BY la.lab)
         |SELECT vol.lab AS community, vol,
         |  COALESCE(cut, 0) AS cut_edges,
         |  CAST(CASE WHEN LEAST(vol, tv - vol) = 0 THEN 0
         |    ELSE (COALESCE(cut, 0) * 1000000) // LEAST(vol, tv - vol)
         |    END AS BIGINT) AS conductance_q
         |FROM vol LEFT JOIN cut ON cut.lab = vol.lab CROSS JOIN tot
         |ORDER BY community""".stripMargin
    },

    "a_kcore" -> {
      // one synchronous peel round: degrees over the surviving symmetric
      // edge set, survivors = deg >= 20, edges keep only survivor pairs
      def peel(r: Int): String =
        s"""d$r AS (SELECT a AS v, count(*) AS d FROM e${r - 1} GROUP BY a),
           |s$r AS (SELECT v FROM d$r WHERE d >= 20),
           |e$r AS (SELECT e.a, e.b FROM e${r - 1} e
           |  JOIN s$r sa ON e.a = sa.v JOIN s$r sb ON e.b = sb.v)""".stripMargin
      s"""WITH cp AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS c,
         |    CAST(l_partkey AS BIGINT) + 1000000000 AS p
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |e0 AS (SELECT c AS a, p AS b FROM cp UNION ALL SELECT p, c FROM cp),
         |${peel(1)},
         |${peel(2)},
         |${peel(3)},
         |${peel(4)},
         |fin AS (SELECT a AS v, CAST(count(*) AS BIGINT) AS deg
         |  FROM e4 GROUP BY a)
         |SELECT CASE WHEN v >= 1000000000 THEN 'part' ELSE 'cust' END AS side,
         |  CAST(CASE WHEN v >= 1000000000 THEN v - 1000000000 ELSE v END
         |    AS BIGINT) AS node_id,
         |  deg
         |FROM fin ORDER BY side, node_id""".stripMargin
    },

    "a_hits" -> {
      // one HITS round: authorities sum in-hubs then max-normalize to the
      // micro-unit scale (integer multiply, truncating //); hubs likewise
      def hround(r: Int): String =
        s"""ar$r AS (SELECT cp.v, SUM(h${r - 1}.h) AS ar
           |  FROM cp JOIN h${r - 1} ON cp.u = h${r - 1}.u GROUP BY cp.v),
           |am$r AS (SELECT max(ar) AS m FROM ar$r),
           |a$r AS (SELECT v, (ar * 1000000) // m AS a
           |  FROM ar$r CROSS JOIN am$r),
           |hr$r AS (SELECT cp.u, SUM(a$r.a) AS hr
           |  FROM cp JOIN a$r ON cp.v = a$r.v GROUP BY cp.u),
           |hm$r AS (SELECT max(hr) AS m FROM hr$r),
           |h$r AS (SELECT u, (hr * 1000000) // m AS h
           |  FROM hr$r CROSS JOIN hm$r)""".stripMargin
      s"""WITH cp AS (SELECT DISTINCT CAST(o_custkey AS BIGINT) AS u,
         |    CAST(l_partkey AS BIGINT) + 1000000000 AS v
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |h0 AS (SELECT DISTINCT u, CAST(1000000 AS BIGINT) AS h FROM cp),
         |${hround(1)},
         |${hround(2)},
         |${hround(3)},
         |auth AS (SELECT 'auth' AS role,
         |    CAST(v - 1000000000 AS BIGINT) AS node_id,
         |    CAST(a AS BIGINT) AS score
         |  FROM a3 ORDER BY a DESC, v LIMIT 20),
         |hub AS (SELECT 'hub' AS role, CAST(u AS BIGINT) AS node_id,
         |    CAST(h AS BIGINT) AS score
         |  FROM h3 ORDER BY h DESC, u LIMIT 20)
         |SELECT * FROM auth UNION ALL SELECT * FROM hub
         |ORDER BY role, score DESC, node_id""".stripMargin
    },

    "a_bootstrap_means" -> {
      val cuts = Seq(385749L, 771499L, 964373L, 1028665L, 1044738L,
        1047952L, 1048488L, 1048565L)
      val wCase = cuts.zipWithIndex
        .map { case (c, k) => s"WHEN u < $c THEN $k" }
        .mkString("CASE ", " ", " ELSE 8 END")
      s"""WITH b AS (SELECT l_returnflag, l_orderkey, l_linenumber,
         |    l_quantity, r.rep
         |  FROM lineitem CROSS JOIN (SELECT unnest(range(0, 50)) AS rep) r),
         |h AS (SELECT l_returnflag, rep, l_quantity,
         |    ((l_orderkey * 2654435761 + l_linenumber * 97 + rep) % 1048576
         |      * 2654435761 + 12345) % 1048576 AS u
         |  FROM b),
         |w AS (SELECT l_returnflag, rep, l_quantity,
         |    CAST($wCase AS BIGINT) AS w FROM h),
         |m AS (SELECT l_returnflag, CAST(rep AS INTEGER) AS rep,
         |    CAST(sum(w) AS BIGINT) AS n_eff,
         |    ${stable("CAST(w AS DOUBLE) * l_quantity")} AS sum_w
         |  FROM w GROUP BY 1, 2)
         |SELECT l_returnflag, rep, n_eff,
         |  sum_w / CAST(n_eff AS DOUBLE) AS boot_mean
         |FROM m ORDER BY l_returnflag, rep""".stripMargin
    },

    "a_spearman" -> {
      s"""WITH b AS (SELECT l_returnflag AS f,
         |    CAST(l_quantity AS DOUBLE) AS x, l_extendedprice AS y
         |  FROM lineitem),
         |r AS (SELECT f,
         |    CAST(rank() OVER (PARTITION BY f ORDER BY x) AS DOUBLE)
         |      + (CAST(count(*) OVER (PARTITION BY f, x) AS DOUBLE)
         |        - CAST(1.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE) AS rx,
         |    CAST(rank() OVER (PARTITION BY f ORDER BY y) AS DOUBLE)
         |      + (CAST(count(*) OVER (PARTITION BY f, y) AS DOUBLE)
         |        - CAST(1.0 AS DOUBLE)) / CAST(2.0 AS DOUBLE) AS ry
         |  FROM b),
         |m AS (SELECT f, CAST(count(*) AS BIGINT) AS n,
         |    ${stable("rx")} AS sx, ${stable("ry")} AS sy,
         |    ${stable("rx * ry")} AS sxy,
         |    ${stable("rx * rx")} AS sxx, ${stable("ry * ry")} AS syy
         |  FROM r GROUP BY f)
         |SELECT f AS l_returnflag, n,
         |  (sxy - sx * sy / CAST(n AS DOUBLE))
         |    / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
         |      * (syy - sy * sy / CAST(n AS DOUBLE))) AS spearman
         |FROM m ORDER BY l_returnflag""".stripMargin
    },

    "a_ridge_check" -> {
      def det3(a: String, b: String, c: String, d: String, e: String,
          f: String, g: String, h: String, i: String) =
        s"$a * ($e * $i - $f * $h) - $b * ($d * $i - $f * $g)" +
          s" + $c * ($d * $h - $e * $g)"
      val (e0, i0) = ("(s11 + lambda)", "(s22 + lambda)")
      val det = det3("nd", "s1", "s2", "s1", e0, "s12", "s2", "s12", i0)
      val d0 = det3("sy", "s1", "s2", "s1y", e0, "s12", "s2y", "s12", i0)
      val d1 = det3("nd", "sy", "s2", "s1", "s1y", "s12", "s2", "s2y", i0)
      val d2 = det3("nd", "s1", "sy", "s1", e0, "s1y", "s2", "s12", "s2y")
      s"""WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    ${stable("CAST(l_quantity AS DOUBLE)")} AS s1,
         |    ${stable("CAST(l_discount AS DOUBLE)")} AS s2,
         |    ${stable("CAST(l_extendedprice AS DOUBLE)")} AS sy,
         |    ${stable("CAST(l_quantity AS DOUBLE) * CAST(l_quantity AS DOUBLE)")} AS s11,
         |    ${stable("CAST(l_quantity AS DOUBLE) * CAST(l_discount AS DOUBLE)")} AS s12,
         |    ${stable("CAST(l_discount AS DOUBLE) * CAST(l_discount AS DOUBLE)")} AS s22,
         |    ${stable("CAST(l_quantity AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)")} AS s1y,
         |    ${stable("CAST(l_discount AS DOUBLE) * CAST(l_extendedprice AS DOUBLE)")} AS s2y
         |  FROM lineitem),
         |g AS (SELECT m.*, CAST(n AS DOUBLE) AS nd, l.lambda
         |  FROM m, (SELECT unnest([CAST(0.0 AS DOUBLE),
         |    CAST(1000.0 AS DOUBLE), CAST(100000.0 AS DOUBLE)]) AS lambda) l)
         |SELECT lambda, n,
         |  ($d0) / ($det) AS beta0,
         |  ($d1) / ($det) AS beta1,
         |  ($d2) / ($det) AS beta2
         |FROM g ORDER BY lambda""".stripMargin
    },

    "a_chi2_independence" ->
      """WITH cells AS (SELECT o_orderpriority AS r, o_orderstatus AS c,
        |    CAST(count(*) AS BIGINT) AS n_obs
        |  FROM orders GROUP BY 1, 2),
        |rt AS (SELECT r, CAST(sum(n_obs) AS BIGINT) AS rt FROM cells GROUP BY r),
        |ct AS (SELECT c, CAST(sum(n_obs) AS BIGINT) AS ct FROM cells GROUP BY c),
        |tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM cells)
        |SELECT cells.r AS o_orderpriority, cells.c AS o_orderstatus, n_obs,
        |  CAST(round(CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
        |    / CAST(n AS DOUBLE) * 1e6) AS BIGINT) AS exp_q,
        |  CAST(round((CAST(n_obs AS DOUBLE) - CAST(rt.rt AS DOUBLE)
        |      * CAST(ct.ct AS DOUBLE) / CAST(n AS DOUBLE))
        |    * (CAST(n_obs AS DOUBLE) - CAST(rt.rt AS DOUBLE)
        |      * CAST(ct.ct AS DOUBLE) / CAST(n AS DOUBLE))
        |    / (CAST(rt.rt AS DOUBLE) * CAST(ct.ct AS DOUBLE)
        |      / CAST(n AS DOUBLE)) * 1e6) AS BIGINT) AS chi_q
        |FROM cells JOIN rt ON rt.r = cells.r JOIN ct ON ct.c = cells.c
        |CROSS JOIN tot
        |ORDER BY o_orderpriority, o_orderstatus""".stripMargin,

    "a_bfs_layers" -> {
      // one min-propagation round: candidates = neighbor dist + 1, min
      // with the previous frame (SQL min ignores nulls in both engines)
      def bround(k: Int): String =
        s"""c$k AS (SELECT e.b AS v, d.dist + 1 AS dist
           |  FROM e JOIN d${k - 1} d ON d.v = e.a WHERE d.dist IS NOT NULL),
           |d$k AS (SELECT v, min(dist) AS dist FROM (
           |  SELECT * FROM d${k - 1} UNION ALL SELECT * FROM c$k)
           |  GROUP BY v)""".stripMargin
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |    FROM lineitem),
         |e AS (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |verts AS (SELECT a AS v FROM e UNION SELECT b FROM e),
         |sd AS (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS v FROM part
         |  WHERE p_partkey % 101 = 0),
         |d0 AS (SELECT verts.v,
         |    CASE WHEN sd.v IS NOT NULL THEN CAST(0 AS BIGINT) END AS dist
         |  FROM verts LEFT JOIN sd ON sd.v = verts.v),
         |${bround(1)},
         |${bround(2)},
         |${bround(3)}
         |SELECT v AS part_id, CAST(dist AS BIGINT) AS dist FROM d3
         |ORDER BY part_id""".stripMargin
    },

    "a_rfm_segments" -> {
      // per-dim boundary: value at rank 1 + floor(f·(N−1)) — the
      // Selection.exactQuantiles lower-interpolation convention
      def dimBounds(tag: String, expr: String): String =
        s"""r$tag AS (SELECT v, row_number() OVER (ORDER BY v) AS rn
           |  FROM (SELECT CAST($expr AS DOUBLE) AS v FROM base)),
           |b$tag AS (SELECT
           |  max(CASE WHEN rn = 1 + CAST(floor(0.2 * (n - 1)) AS BIGINT)
           |    THEN v END) AS b1,
           |  max(CASE WHEN rn = 1 + CAST(floor(0.4 * (n - 1)) AS BIGINT)
           |    THEN v END) AS b2,
           |  max(CASE WHEN rn = 1 + CAST(floor(0.6 * (n - 1)) AS BIGINT)
           |    THEN v END) AS b3,
           |  max(CASE WHEN rn = 1 + CAST(floor(0.8 * (n - 1)) AS BIGINT)
           |    THEN v END) AS b4
           |  FROM r$tag CROSS JOIN nn)""".stripMargin
      s"""WITH anchor AS (SELECT max(o_orderdate) AS a FROM orders),
         |base AS (SELECT o_custkey AS custkey,
         |    CAST(datediff('day', CAST(max(o_orderdate) AS DATE),
         |      CAST(a AS DATE)) AS BIGINT) AS recency,
         |    CAST(count(*) AS BIGINT) AS frequency,
         |    CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
         |      AS BIGINT) AS cents
         |  FROM orders CROSS JOIN anchor GROUP BY o_custkey, a),
         |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
         |${dimBounds("r", "recency")},
         |${dimBounds("f", "frequency")},
         |${dimBounds("m", "cents")},
         |scored AS (SELECT custkey, recency, frequency, cents,
         |  5 - ((recency > br.b1)::INT + (recency > br.b2)::INT
         |     + (recency > br.b3)::INT + (recency > br.b4)::INT) AS r_score,
         |  1 + ((frequency > bf.b1)::INT + (frequency > bf.b2)::INT
         |     + (frequency > bf.b3)::INT + (frequency > bf.b4)::INT) AS f_score,
         |  1 + ((cents > bm.b1)::INT + (cents > bm.b2)::INT
         |     + (cents > bm.b3)::INT + (cents > bm.b4)::INT) AS m_score
         |  FROM base CROSS JOIN br CROSS JOIN bf CROSS JOIN bm)
         |SELECT custkey, recency, frequency, cents,
         |  CAST(r_score AS INTEGER) AS r_score,
         |  CAST(f_score AS INTEGER) AS f_score,
         |  CAST(m_score AS INTEGER) AS m_score,
         |  CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS rfm_code
         |FROM scored ORDER BY custkey""".stripMargin
    },

    "a_betweenness" -> {
      // forward: per-layer path counts (sum over parents), frontier =
      // candidates minus visited; backward: integer dependency recursion
      s"""WITH op AS MATERIALIZED (SELECT DISTINCT l_orderkey AS ok,
         |    l_partkey AS p FROM lineitem),
         |e AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |sd AS (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS seed
         |  FROM part WHERE p_partkey % 101 = 0),
         |l0 AS MATERIALIZED (SELECT seed, seed AS v,
         |  CAST(1 AS BIGINT) AS sigma FROM sd),
         |c1 AS (SELECT l.seed, e.b AS v, CAST(sum(l.sigma) AS BIGINT) AS sigma
         |  FROM l0 l JOIN e ON e.a = l.v GROUP BY 1, 2),
         |l1 AS MATERIALIZED (SELECT c1.seed, c1.v, c1.sigma FROM c1
         |  LEFT JOIN l0 ON l0.seed = c1.seed AND l0.v = c1.v
         |  WHERE l0.v IS NULL),
         |c2 AS (SELECT l.seed, e.b AS v, CAST(sum(l.sigma) AS BIGINT) AS sigma
         |  FROM l1 l JOIN e ON e.a = l.v GROUP BY 1, 2),
         |vis1 AS (SELECT seed, v FROM l0 UNION ALL SELECT seed, v FROM l1),
         |l2 AS MATERIALIZED (SELECT c2.seed, c2.v, c2.sigma FROM c2
         |  LEFT JOIN vis1 ON vis1.seed = c2.seed AND vis1.v = c2.v
         |  WHERE vis1.v IS NULL),
         |c3 AS (SELECT l.seed, e.b AS v, CAST(sum(l.sigma) AS BIGINT) AS sigma
         |  FROM l2 l JOIN e ON e.a = l.v GROUP BY 1, 2),
         |vis2 AS (SELECT seed, v FROM vis1 UNION ALL SELECT seed, v FROM l2),
         |l3 AS MATERIALIZED (SELECT c3.seed, c3.v, c3.sigma FROM c3
         |  LEFT JOIN vis2 ON vis2.seed = c3.seed AND vis2.v = c3.v
         |  WHERE vis2.v IS NULL),
         |d3 AS (SELECT seed, v, sigma, CAST(0 AS BIGINT) AS delta FROM l3),
         |t2 AS (SELECT e.a, nx.seed,
         |    CAST(sum(((1000000 + nx.delta) * 1000000) // nx.sigma)
         |      AS BIGINT) AS tsum
         |  FROM d3 nx JOIN e ON e.b = nx.v GROUP BY 1, 2),
         |d2 AS MATERIALIZED (SELECT l.seed, l.v, l.sigma,
         |    COALESCE((l.sigma * t2.tsum) // 1000000, 0) AS delta
         |  FROM l2 l LEFT JOIN t2 ON t2.seed = l.seed AND t2.a = l.v),
         |t1 AS (SELECT e.a, nx.seed,
         |    CAST(sum(((1000000 + nx.delta) * 1000000) // nx.sigma)
         |      AS BIGINT) AS tsum
         |  FROM d2 nx JOIN e ON e.b = nx.v GROUP BY 1, 2),
         |d1 AS (SELECT l.seed, l.v, l.sigma,
         |    COALESCE((l.sigma * t1.tsum) // 1000000, 0) AS delta
         |  FROM l1 l LEFT JOIN t1 ON t1.seed = l.seed AND t1.a = l.v)
         |SELECT v AS part_id, CAST(count(*) AS BIGINT) AS n_seeds,
         |  CAST(sum(delta) AS BIGINT) AS bc_q
         |FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2)
         |GROUP BY v ORDER BY part_id""".stripMargin
    },

    "a_hyperanf" -> {
      // exact cumulative pair counts replayed per h; the register estimate
      // must sit inside the ±15% band (deterministic → stable flag)
      def hround(k: Int): String =
        s"""c$k AS (SELECT d.seed, e.b AS v, d.dist + 1 AS dist
           |  FROM e JOIN d${k - 1} d ON d.v = e.a),
           |d$k AS (SELECT seed, v, min(dist) AS dist FROM (
           |  SELECT * FROM d${k - 1} UNION ALL SELECT * FROM c$k)
           |  GROUP BY seed, v)""".stripMargin
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |    FROM lineitem),
         |e AS (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |sd AS (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS seed
         |  FROM part WHERE p_partkey % 101 = 0),
         |d0 AS (SELECT seed, seed AS v, CAST(0 AS BIGINT) AS dist FROM sd),
         |${hround(1)},
         |${hround(2)},
         |${hround(3)},
         |bd AS MATERIALIZED (SELECT dist, CAST(count(*) AS BIGINT) AS c
         |  FROM d3 GROUP BY dist)
         |SELECT CAST(h.h AS INTEGER) AS h,
         |  CAST(sum(bd.c) AS BIGINT) AS n_pairs,
         |  CAST(1 AS BIGINT) AS est_ok
         |FROM (SELECT unnest(range(0, 4)) AS h) h
         |JOIN bd ON bd.dist <= h.h GROUP BY h.h ORDER BY h""".stripMargin
    },

    "a_neighborhood_fn" -> {
      def hround(k: Int): String =
        s"""c$k AS (SELECT d.seed, e.b AS v, d.dist + 1 AS dist
           |  FROM e JOIN d${k - 1} d ON d.v = e.a),
           |d$k AS (SELECT seed, v, min(dist) AS dist FROM (
           |  SELECT * FROM d${k - 1} UNION ALL SELECT * FROM c$k)
           |  GROUP BY seed, v)""".stripMargin
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |    FROM lineitem),
         |e AS (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |sd AS (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS seed
         |  FROM part WHERE p_partkey % 101 = 0),
         |d0 AS (SELECT seed, seed AS v, CAST(0 AS BIGINT) AS dist FROM sd),
         |${hround(1)},
         |${hround(2)},
         |${hround(3)},
         |bd AS MATERIALIZED (SELECT dist, CAST(count(*) AS BIGINT) AS c
         |  FROM d3 GROUP BY dist),
         |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM bd),
         |per AS (SELECT h.h, CAST(sum(bd.c) AS BIGINT) AS n_pairs
         |  FROM (SELECT unnest(range(0, 4)) AS h) h
         |  JOIN bd ON bd.dist <= h.h GROUP BY h.h)
         |SELECT CAST(h AS INTEGER) AS h, n_pairs,
         |  CAST((n_pairs * 1000000) // n_total AS BIGINT) AS frac_q
         |FROM per CROSS JOIN tot ORDER BY h""".stripMargin
    },

    "a_harmonic_centrality" -> {
      // per-seed min-propagation round: the a_bfs_layers recurrence with
      // the seed id carried through every frame
      def hround(k: Int): String =
        s"""c$k AS (SELECT d.seed, e.b AS v, d.dist + 1 AS dist
           |  FROM e JOIN d${k - 1} d ON d.v = e.a),
           |d$k AS (SELECT seed, v, min(dist) AS dist FROM (
           |  SELECT * FROM d${k - 1} UNION ALL SELECT * FROM c$k)
           |  GROUP BY seed, v)""".stripMargin
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |    FROM lineitem),
         |e AS (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |sd AS (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS seed
         |  FROM part WHERE p_partkey % 101 = 0),
         |d0 AS (SELECT seed, seed AS v, CAST(0 AS BIGINT) AS dist
         |  FROM sd),
         |${hround(1)},
         |${hround(2)},
         |${hround(3)}
         |SELECT v AS part_id, CAST(count(*) AS BIGINT) AS n_sources,
         |  CAST(sum(1000000 // dist) AS BIGINT) AS h_micro
         |FROM d3 WHERE dist > 0 GROUP BY v ORDER BY part_id""".stripMargin
    },

    "a_label_spread" -> {
      // one damped per-class diffusion round (the PPR recurrence with the
      // class as a grouping column)
      def sround(k: Int): String =
        s"""c$k AS (SELECT e.b AS v, r.l, SUM(r.m // deg.d) AS s
           |  FROM e JOIN deg ON deg.a = e.a
           |  JOIN r${k - 1} r ON r.v = e.a GROUP BY e.b, r.l),
           |r$k AS (SELECT v, l, CAST(sum(m) AS BIGINT) AS m FROM (
           |  SELECT v, l, CAST(150000 AS BIGINT) AS m FROM sd
           |  UNION ALL SELECT v, l, (85 * s) // 100 FROM c$k)
           |  GROUP BY v, l)""".stripMargin
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |    FROM lineitem),
         |e AS (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY a),
         |verts AS (SELECT a AS v FROM e UNION SELECT b FROM e),
         |sd AS (SELECT DISTINCT CAST(p_partkey AS BIGINT) AS v,
         |    CAST(p_partkey % 3 AS BIGINT) AS l FROM part
         |  WHERE p_partkey % 29 = 0),
         |r0 AS (SELECT v, l, CAST(1000000 AS BIGINT) AS m FROM sd),
         |${sround(1)},
         |${sround(2)},
         |${sround(3)},
         |win AS (SELECT v, l AS label, m AS mass FROM (
         |  SELECT v, l, m, row_number() OVER (PARTITION BY v
         |    ORDER BY m DESC, l) AS rn FROM r3) WHERE rn = 1)
         |SELECT verts.v AS part_id, win.label, win.mass
         |FROM verts LEFT JOIN win ON win.v = verts.v
         |ORDER BY part_id""".stripMargin
    },

    "a_modularity" -> {
      // LPA rounds identical to a_communities' oracle, then the Newman
      // terms over the raw (self-vote-free) graph
      def lpRound(k: Int): String =
        s"""c$k AS (SELECT e.b AS vv, l.lab, count(*) AS c
           |  FROM e JOIN l${k - 1} l ON l.v = e.a GROUP BY e.b, l.lab),
           |w$k AS (SELECT vv, lab FROM (
           |    SELECT vv, lab,
           |      row_number() OVER (PARTITION BY vv ORDER BY c DESC, lab) AS rn
           |    FROM c$k) WHERE rn = 1),
           |l$k AS (SELECT v.v, COALESCE(w$k.lab, v.v) AS lab
           |  FROM v LEFT JOIN w$k ON w$k.vv = v.v)""".stripMargin
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |    FROM lineitem),
         |e0 AS (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |v AS (SELECT a AS v FROM e0 UNION SELECT b FROM e0),
         |e AS (SELECT a, b FROM e0 UNION ALL SELECT v, v FROM v),
         |l0 AS (SELECT v, v AS lab FROM v),
         |${lpRound(1)},
         |${lpRound(2)},
         |${lpRound(3)},
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS e2 FROM e0),
         |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM e0 GROUP BY a),
         |degc AS (SELECT CAST(l.lab AS BIGINT) AS c,
         |    CAST(sum(deg.d) AS BIGINT) AS deg_c
         |  FROM deg JOIN l3 l ON l.v = deg.a GROUP BY 1),
         |intra AS (SELECT CAST(la.lab AS BIGINT) AS c,
         |    CAST(count(*) AS BIGINT) AS intra2
         |  FROM e0 JOIN l3 la ON la.v = e0.a JOIN l3 lb ON lb.v = e0.b
         |  WHERE la.lab = lb.lab GROUP BY 1)
         |SELECT degc.c AS community, COALESCE(intra2, 0) AS intra2, deg_c,
         |  CAST(round((CAST(COALESCE(intra2, 0) AS DOUBLE) / CAST(e2 AS DOUBLE)
         |    - (CAST(deg_c AS DOUBLE) / CAST(e2 AS DOUBLE))
         |      * (CAST(deg_c AS DOUBLE) / CAST(e2 AS DOUBLE))) * 1e8)
         |    AS BIGINT) AS term_q
         |FROM degc LEFT JOIN intra ON intra.c = degc.c CROSS JOIN tot
         |ORDER BY community""".stripMargin
    },

    "a_assortativity" -> {
      s"""WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
         |    FROM lineitem),
         |e AS (SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM op x JOIN op y ON x.ok = y.ok AND x.p <> y.p),
         |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY a),
         |p AS (SELECT CAST(dx.d AS DOUBLE) AS x, CAST(dy.d AS DOUBLE) AS y
         |  FROM e JOIN deg dx ON dx.a = e.a JOIN deg dy ON dy.a = e.b),
         |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    ${stable("x")} AS sx, ${stable("y")} AS sy,
         |    ${stable("x * y")} AS sxy,
         |    ${stable("x * x")} AS sxx, ${stable("y * y")} AS syy
         |  FROM p)
         |SELECT n,
         |  (sxy - sx * sy / CAST(n AS DOUBLE))
         |    / sqrt((sxx - sx * sx / CAST(n AS DOUBLE))
         |      * (syy - sy * sy / CAST(n AS DOUBLE))) AS assortativity
         |FROM m""".stripMargin
    },

    "a_walk_corpus" ->
      s"""WITH $walkCtes
         |SELECT start, walk, step, vertex FROM walks
         |ORDER BY start, walk, step""".stripMargin,

    "a_skipgram_pairs" ->
      s"""WITH $walkCtes
         |SELECT x.vertex AS center, y.vertex AS context,
         |  CAST(count(*) AS BIGINT) AS n_pairs
         |FROM walks x JOIN walks y
         |  ON x.start = y.start AND x.walk = y.walk AND x.step <> y.step
         |  AND abs(x.step - y.step) <= 2
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "a_skyline_parts" ->
      """SELECT p_size, p_retailprice, p_partkey
        |FROM part p
        |WHERE NOT EXISTS (SELECT 1 FROM part q
        |  WHERE q.p_size >= p.p_size AND q.p_retailprice >= p.p_retailprice
        |    AND (q.p_size > p.p_size OR q.p_retailprice > p.p_retailprice))
        |ORDER BY p_size DESC, p_retailprice DESC, p_partkey""".stripMargin,

    "a_regression_stats" -> {
      def stable(e: String) =
        s"CAST(CAST(SUM(CAST($e AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
      s"""WITH b AS (SELECT l_returnflag,
         |    CAST(l_quantity AS DOUBLE) AS x, l_extendedprice AS y
         |  FROM lineitem),
         |m AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |    ${stable("x")} AS sx, ${stable("y")} AS sy,
         |    ${stable("x * y")} AS sxy,
         |    ${stable("x * x")} AS sxx, ${stable("y * y")} AS syy
         |  FROM b GROUP BY l_returnflag),
         |d AS (SELECT l_returnflag, n, sx, sy,
         |    sxy - sx * sy / CAST(n AS DOUBLE) AS cov_n,
         |    sxx - sx * sx / CAST(n AS DOUBLE) AS var_x_n,
         |    syy - sy * sy / CAST(n AS DOUBLE) AS var_y_n
         |  FROM m),
         |e AS (SELECT l_returnflag, n,
         |    cov_n / sqrt(var_x_n * var_y_n) AS corr,
         |    cov_n / var_x_n AS slope, sx, sy
         |  FROM d)
         |SELECT l_returnflag, n, corr, slope,
         |  (sy - slope * sx) / CAST(n AS DOUBLE) AS intercept
         |FROM e ORDER BY l_returnflag""".stripMargin
    },

    "a_item_cosine" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |    FROM lineitem),
        |pc AS (SELECT pk, CAST(count(*) AS BIGINT) AS c FROM li GROUP BY pk),
        |pairs AS (SELECT x.pk AS i, y.pk AS j, CAST(count(*) AS BIGINT) AS co
        |  FROM li x JOIN li y ON x.ok = y.ok AND x.pk != y.pk
        |  GROUP BY 1, 2),
        |sc AS (SELECT i, j, co,
        |    CAST((CAST(1000000000000 AS HUGEINT) * co * co)
        |      // (CAST(ci.c AS HUGEINT) * cj.c) AS BIGINT) AS cos2_q
        |  FROM pairs
        |  JOIN pc ci ON i = ci.pk
        |  JOIN pc cj ON j = cj.pk),
        |r AS (SELECT *, row_number() OVER (PARTITION BY i
        |    ORDER BY cos2_q DESC, j) AS rank FROM sc)
        |SELECT i AS part_id, j AS neighbor_id, cos2_q,
        |  CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 3 ORDER BY part_id, rank""".stripMargin,

    "a_basket_lift" ->
      """WITH ob AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS b
        |    FROM lineitem JOIN part ON l_partkey = p_partkey),
        |tot AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM ob),
        |bc AS (SELECT b, CAST(count(*) AS BIGINT) AS cb FROM ob GROUP BY b),
        |pr AS (SELECT x.b AS b1, y.b AS b2, CAST(count(*) AS BIGINT) AS pair_n
        |  FROM ob x JOIN ob y ON x.ok = y.ok AND x.b < y.b GROUP BY x.b, y.b)
        |SELECT b1, b2, pair_n,
        |  CAST(round(CAST(pair_n AS DOUBLE) * CAST(n_orders AS DOUBLE)
        |    / (CAST(c1.cb AS DOUBLE) * CAST(c2.cb AS DOUBLE)) * 1000000)
        |    AS BIGINT) AS lift_q
        |FROM pr CROSS JOIN tot
        |JOIN bc c1 ON c1.b = pr.b1
        |JOIN bc c2 ON c2.b = pr.b2
        |ORDER BY pair_n DESC, b1, b2 LIMIT 20""".stripMargin,

    "a_price_quantiles" ->
      """WITH r AS (
        |  SELECT o_orderstatus, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice, o_orderkey) AS rn,
        |    COUNT(*) OVER (PARTITION BY o_orderstatus) AS n
        |  FROM orders)
        |SELECT o_orderstatus,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN o_totalprice END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN o_totalprice END) AS p90
        |FROM r GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "g_grouping_sets" ->
      s"""SELECT COALESCE(y, -1) AS y,
         |  COALESCE(o_orderstatus, 'ALL') AS o_orderstatus, n, total_sales
         |FROM (
         |  SELECT CAST(year(o_orderdate) AS INTEGER) AS y, o_orderstatus,
         |    COUNT(*) AS n, ${stable("o_totalprice")} AS total_sales
         |  FROM orders
         |  GROUP BY GROUPING SETS ((y, o_orderstatus), (y), ()))
         |ORDER BY y, o_orderstatus""".stripMargin)
}
