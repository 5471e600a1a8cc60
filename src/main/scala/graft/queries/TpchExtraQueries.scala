package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Aggregations.sumStable

/** Second wave of TPC-H-shaped analytics, adapted to the synthetic star
  * schema (no partsupp table — supplier↔part relationships come from
  * lineitem; nation names are NATION_k; brands Brand#1..25).
  *
  * Scale posture per query: q6 is a pure scan+filter+agg (predicates and
  * 3-column pruning push into parquet); q7/q10 join facts on their keys and
  * broadcast only fixed-size dims (nation); q14/q16/q19 join lineitem⋈part
  * with no hint — part grows with SF, so AQE picks broadcast vs shuffle
  * from runtime sizes; q15's scalar max is a 1-row broadcast by
  * construction.
  */
object TpchExtraQueries extends QueryPack {

  private val stable = "CAST(CAST(SUM(CAST(%s AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
  private val discPrice = "l_extendedprice * (1 - l_discount)"

  override def queries: Map[String, Query] = Map(
    // Q6: forecast revenue change — scan-only aggregate, the pushdown
    // showcase (shipdate + discount + quantity predicates all reach the
    // parquet reader; only 3 columns scanned).
    "q6_forecast_revenue" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sumStable(col("l_extendedprice") * col("l_discount"))
          .as("revenue"), count(lit(1)).as("n_lines"))),

    // Q7: volume shipping between two regions (supplier region ↔ customer
    // region, both directions), by shipment year. Region-level rather than
    // nation-level so every sf — including the 6k-row smoke set — has
    // qualifying trade lines.
    "q7_volume_shipping" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
      val c = Tables.load(s, dir, "customer")
      val sup = Tables.load(s, dir, "supplier")
      def natRegion(nk: String, out: String) =
        Tables.load(s, dir, "nation")
          .join(Tables.load(s, dir, "region"),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey").as(nk), col("r_name").as(out))
      val n1 = natRegion("s_nk", "supp_region")
      val n2 = natRegion("c_nk", "cust_region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        // no hint on supplier: it grows with SF (10k×SF rows), so AQE must
        // pick broadcast vs shuffle from runtime size; nation⋈region is
        // fixed-size (25 rows) and broadcasts.
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(n1), sup("s_nationkey") === n1("s_nk"))
        .join(broadcast(n2), c("c_nationkey") === n2("c_nk"))
        .filter((col("supp_region") === "ASIA" && col("cust_region") === "EUROPE") ||
          (col("supp_region") === "EUROPE" && col("cust_region") === "ASIA"))
        .groupBy(col("supp_region"), col("cust_region"),
          year(col("l_shipdate")).as("l_year"))
        .agg(sumStable(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
    }),

    // Q10: top 20 customers by returned-item revenue in one quarter.
    "q10_returned_items" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      val c = Tables.load(s, dir, "customer")
      val n = Tables.load(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sumStable(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // Q14: promo revenue share — division of two stable sums over one
    // lineitem⋈part pass.
    "q14_promo_revenue" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-09-01").cast("timestamp"))
      val p = Tables.load(s, dir, "part")
      val dp = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li.join(p, li("l_partkey") === p("p_partkey"))
        .agg((lit(100.0) *
          sumStable(when(col("p_type") === "PROMO", dp).otherwise(lit(0.0))) /
          sumStable(dp)).as("promo_pct"),
          count(lit(1)).as("n_lines"))
    }),

    // Q15: top supplier(s) — revenue per supplier over a window, keep those
    // equal to the scalar max (both engines derive the max from identical
    // stable sums, so the double equality is exact).
    "q15_top_supplier" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sumStable(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("__mx"))
      val sup = Tables.load(s, dir, "supplier")
      // mx is 1 row by construction — safe to broadcast at any SF; supplier
      // grows with SF, so its join strategy is left to AQE.
      rev.join(broadcast(mx), rev("total_revenue") === mx("__mx"))
        .join(sup, rev("l_suppkey") === sup("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    }),

    // Q16: distinct suppliers per (brand, type, size) bucket for parts
    // outside an excluded brand/type, selected sizes — supplier↔part pairs
    // come from lineitem (no partsupp in this schema).
    "q16_supplier_cnt" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "MEDIUM" &&
          col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
      val li = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
      li.join(p, li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    }),

    // Q19: disjunctive brand/size/quantity predicate bands — the classic
    // "OR of conjunctions" that must still plan as ONE equi-join on
    // partkey with the disjunction as a post-join filter, not three scans.
    "q19_banded_revenue" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part")
      li.join(p, li("l_partkey") === p("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#13" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(sumStable(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_lines"))
    }))

  override def oracleSql: Map[String, String] = Map(
    "q6_forecast_revenue" ->
      s"""SELECT ${stable.format("l_extendedprice * l_discount")} AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
         |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q7_volume_shipping" ->
      s"""SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
         |  CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |  ${stable.format(discPrice)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
         |WHERE (r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
         |   OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA')
         |GROUP BY supp_region, cust_region, l_year
         |ORDER BY supp_region, cust_region, l_year""".stripMargin,

    "q10_returned_items" ->
      s"""SELECT c_custkey, c_name, c_acctbal, n_name,
         |  ${stable.format(discPrice)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q14_promo_revenue" ->
      s"""SELECT 100.0 * ${stable.format(
             s"CASE WHEN p_type = 'PROMO' THEN $discPrice ELSE 0 END")}
         |  / ${stable.format(discPrice)} AS promo_pct,
         |  COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
         |  AND l_shipdate < TIMESTAMP '1996-09-01 00:00:00'""".stripMargin,

    "q15_top_supplier" ->
      s"""WITH rev AS (
         |  SELECT l_suppkey, ${stable.format(discPrice)} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
         |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q16_supplier_cnt" ->
      """SELECT p_brand, p_type, p_size,
        |  COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

    "q19_banded_revenue" ->
      s"""SELECT ${stable.format(discPrice)} AS revenue, COUNT(*) AS n_lines
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 5
         |       AND l_quantity BETWEEN 1 AND 11)
         |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 10
         |       AND l_quantity BETWEEN 10 AND 20)
         |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15
         |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin)
}
