package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Cms

/** Sketch / approximate-aggregation surface: HyperLogLog++ distinct counts,
  * single-pass frequent items, and quantile sketches. At 100 TB these
  * replace exact distinct/percentile computations whose state would not fit
  * an executor; each is map-side-combinable so the shuffle carries sketch
  * bytes, not values.
  *
  * Verification pattern: approximate answers are not SQL-reproducible, so
  * each query emits the EXACT companion (oracle-computable) next to a
  * bounds check the sketch's published guarantee must satisfy — the gate
  * hash-matches both.
  */
object SketchQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    // HLL++ distinct customers per priority: rsd 2% configured, checked
    // against the exact count at ±5%.
    "a_approx_distinct" -> ((s, dir) =>
      Tables.load(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(countDistinct(col("o_custkey")).as("exact_custs"),
          approx_count_distinct(col("o_custkey"), rsd = 0.02).as("__approx"))
        .select(col("o_orderpriority"), col("exact_custs"),
          when(abs(col("__approx") - col("exact_custs"))
            .cast("double") / col("exact_custs") <= 0.05, 1)
            .otherwise(0).as("approx_ok"))
        .orderBy(col("o_orderpriority"))),

    // SpaceSaving heavy hitters (Metwally et al. 2005) — the bounded-memory
    // one-pass top-k-by-frequency summary that merges across partitions
    // (Agarwal et al. mergeable-summaries construction). Capacity 64 far
    // exceeds the distinct event-type count, so the summary runs in its
    // EXACT regime (every err 0, counts equal the true frequencies) and the
    // oracle is a plain GROUP BY; at 100 TB the same aggregate holds 64
    // entries per partition and the ε = 1/capacity bound takes over.
    "a_heavy_hitters" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
      ev.agg(org.apache.spark.sql.graftx.SpaceSavingExpressions
          .spaceSaving(col("event_type"), 64).as("__hh"))
        .select(explode(col("__hh")).as("__e"))
        .select(col("__e.key").as("event_type"), col("__e.cnt").as("est_count"),
          col("__e.err").as("max_err"))
        .orderBy(col("est_count").desc, col("event_type"))
    }),

    // Single-pass frequent items at support 0.1: the algorithm guarantees a
    // SUPERSET of the true heavy hitters, so every event type above 10%
    // frequency must appear — n_missing is 0 iff the guarantee holds.
    "t_freq_items" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events").select(col("event_type"))
      val counts = ev.groupBy(col("event_type")).agg(count(lit(1)).as("__n"))
      val total = ev.agg(count(lit(1)).as("__c"))
      val truth = counts.crossJoin(total)
        .filter(col("__n") > col("__c") * 0.1)
        .select(col("event_type"))
      val items = ev.stat.freqItems(Seq("event_type"), 0.1)
        .select(explode(col("event_type_freqItems")).as("__item"))
      val missing = truth.join(items, truth("event_type") === items("__item"),
        "left_anti").agg(count(lit(1)).as("n_missing"))
      val nTrue = truth.agg(count(lit(1)).as("n_true_hh"))
      nTrue.crossJoin(missing) // 1-row × 1-row
    }),

    // Partitioned HLL roll-up (DataSketches): build one HLL sketch per
    // source shard, then union the SKETCHES — never the raw ids — into the
    // global distinct count. This is the mergeable form the per-group
    // approx_count_distinct can't give you: shard sketches persist and
    // later periods/partitions combine in O(sketch bytes). Gates: each
    // shard estimate and the union estimate within ±5% of exact (lgk=14
    // gives ~0.8% rse; doc_ids are unique so exact = row count).
    "a_hll_union" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val perSource = docs.groupBy(col("source"))
        .agg(hll_sketch_agg(col("doc_id"), lit(14)).as("__sk"),
          count(lit(1)).as("exact_docs"))
      val union = perSource
        .agg(hll_sketch_estimate(hll_union_agg(col("__sk")))
          .as("__uest"), sum(col("exact_docs")).as("__tot"))
        .select(when(abs(col("__uest") - col("__tot")).cast("double") /
          col("__tot") <= 0.05, 1).otherwise(0).as("union_ok"))
      perSource
        .select(col("source"), col("exact_docs"),
          when(abs(hll_sketch_estimate(col("__sk")) - col("exact_docs"))
            .cast("double") / col("exact_docs") <= 0.05, 1)
            .otherwise(0).as("shard_ok"))
        .crossJoin(union) // 1-row union gate
        .orderBy(col("source"))
    }),

    // Count-min sketch point estimates for the mod-7 supplier keys, next to
    // the exact counts. CMS never undercounts (ge_ok is a hard guarantee);
    // the overcount check uses 3× the Markov bound e·N/width, giving a
    // per-probe failure probability ≤ (3e)^-depth ≈ 2.5e-5 — and the
    // xxhash64 rows are deterministic, so a green check is green forever.
    "a_cms_counts" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").select(col("l_suppkey"))
      val sketch = Cms.build(li, col("l_suppkey"))
      val exact = li.filter(pmod(col("l_suppkey"), lit(7)) === 0)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("exact_cnt"))
        .select(col("l_suppkey").as("k"), col("exact_cnt"))
      val est = Cms.estimate(sketch, exact.select(col("k")))
      val total = li.agg(count(lit(1)).as("__n"))
      exact.join(est, Seq("k")).crossJoin(total) // 1-row total
        .select(col("k").as("suppkey"), col("exact_cnt"),
          when(col("est") >= col("exact_cnt"), 1).otherwise(0).as("ge_ok"),
          when((col("est") - col("exact_cnt")).cast("double") <=
            lit(3.0 * math.E) * col("__n") / lit(1024.0), 1)
            .otherwise(0).as("bound_ok"))
        .orderBy(col("suppkey"))
    }),

    // Quantile sketch with a rank-based check (the sketch's guarantee is on
    // RANK, not value): the fraction of rows ≤ the approximate p50 must sit
    // within 0.5 ± 0.01 per group. Accuracy 10000 bounds rank error at
    // n/10000 — orders of magnitude inside the window at any tested sf.
    "a_approx_quantiles" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_totalprice"))
      val appr = o.groupBy(col("o_orderstatus"))
        .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(10000))
          .as("__p50"), count(lit(1)).as("n_orders"))
      o.join(appr, Seq("o_orderstatus"))
        .groupBy(col("o_orderstatus"))
        .agg(max(col("n_orders")).as("n_orders"),
          (count(when(col("o_totalprice") <= col("__p50"), 1))
            .cast("double") / max(col("n_orders"))).as("__frac"))
        .select(col("o_orderstatus"), col("n_orders"),
          when(col("__frac").between(0.49, 0.51), 1).otherwise(0)
            .as("rank_ok"))
        .orderBy(col("o_orderstatus"))
    }),

    // EXACT distributed order statistics (two-scan selection): the value
    // at rank 1+⌊f·(N−1)⌋ for seven fractions over lineitem prices — the
    // audit-grade complement to the rank-bounded sketch above. Pass 1
    // ships only a 4096-bucket histogram to the driver; pass 2 walks
    // distinct values inside the targeted buckets. The oracle's global
    // row_number sort is exactly the plan this operator exists to avoid.
    "a_exact_quantiles" -> ((s, dir) =>
      graft.operators.Selection.exactQuantiles(
          Tables.load(s, dir, "lineitem"), "l_extendedprice",
          Seq(0.0, 0.01, 0.25, 0.5, 0.75, 0.99, 1.0))
        .orderBy(col("frac"))),

    // Theta-sketch SET ALGEBRA over the distinct customer sets of two order
    // statuses: one pass builds a per-status sketch (map-side combinable,
    // raw custkeys never shuffle), then union/intersection/difference run
    // on the kilobyte summaries. Both sets are far inside the 2^14 exact
    // regime at gate scales, so every estimate is value-exact against the
    // oracle's real set operations; at 100 TB the same plan degrades to
    // ~0.8% rse instead of failing.
    "a_theta_ops" -> ((s, dir) => {
      import org.apache.spark.sql.graftx.ThetaExpressions._
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderstatus").isin("F", "O"))
        .select(col("o_orderstatus").as("st"), col("o_custkey"))
      o.groupBy(col("st")).agg(thetaAgg(col("o_custkey")).as("sk"))
        .groupBy().pivot("st", Seq("F", "O")).agg(first(col("sk")))
        .select(
          thetaEstimate(col("F")).as("n_f"),
          thetaEstimate(col("O")).as("n_o"),
          thetaEstimate(thetaUnion(col("F"), col("O"))).as("n_union"),
          thetaEstimate(thetaIntersect(col("F"), col("O"))).as("n_both"),
          thetaEstimate(thetaDiff(col("F"), col("O"))).as("n_f_only"))
    }))

  override def oracleSql: Map[String, String] = Map(
    "a_approx_distinct" ->
      """SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS exact_custs,
        |  CAST(1 AS INTEGER) AS approx_ok
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "a_heavy_hitters" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS est_count,
        |  CAST(0 AS BIGINT) AS max_err
        |FROM events GROUP BY event_type
        |ORDER BY est_count DESC, event_type""".stripMargin,

    "t_freq_items" ->
      """WITH t AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
        |tot AS (SELECT COUNT(*) AS c FROM events)
        |SELECT (SELECT COUNT(*) FROM t, tot WHERE n > 0.1 * c) AS n_true_hh,
        |  CAST(0 AS BIGINT) AS n_missing""".stripMargin,

    "a_hll_union" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_docs,
        |  CAST(1 AS INTEGER) AS shard_ok, CAST(1 AS INTEGER) AS union_ok
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "a_cms_counts" ->
      """SELECT l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS exact_cnt,
        |  CAST(1 AS INTEGER) AS ge_ok, CAST(1 AS INTEGER) AS bound_ok
        |FROM lineitem WHERE l_suppkey % 7 = 0
        |GROUP BY l_suppkey ORDER BY suppkey""".stripMargin,

    "a_approx_quantiles" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(1 AS INTEGER) AS rank_ok
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,

    "a_exact_quantiles" ->
      """WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
        |    FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v),
        |r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v),
        |f AS (SELECT CAST(p AS DOUBLE) AS frac FROM (VALUES (0.0),
        |    (0.01), (0.25), (0.5), (0.75), (0.99), (1.0)) t(p)),
        |t AS (SELECT frac, CAST(1 + floor(frac
        |      * CAST(n - 1 AS DOUBLE)) AS BIGINT) AS rank
        |  FROM f, n)
        |SELECT frac, rank, x AS value FROM t JOIN r ON r.rn = t.rank
        |ORDER BY frac""".stripMargin,

    "a_theta_ops" ->
      """WITH f AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
        |     o AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT
        |  (SELECT COUNT(*) FROM f) AS n_f,
        |  (SELECT COUNT(*) FROM o) AS n_o,
        |  (SELECT COUNT(*) FROM (SELECT o_custkey FROM f UNION SELECT o_custkey FROM o)) AS n_union,
        |  (SELECT COUNT(*) FROM f WHERE o_custkey IN (SELECT o_custkey FROM o)) AS n_both,
        |  (SELECT COUNT(*) FROM f WHERE o_custkey NOT IN (SELECT o_custkey FROM o)) AS n_f_only""".stripMargin)
}
