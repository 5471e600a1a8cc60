package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Aggregations.sumStable

/** Third wave of TPC-H-shaped analytics — the six shapes (Q2, Q8, Q9, Q11,
  * Q12, Q20) not yet covered, adapted to the synthetic star schema. There is
  * no partsupp table and lineitem has no shipmode/commitdate/receiptdate, so
  * each query keeps the ORIGINAL's optimizer-relevant structure (correlated
  * min subquery, two-nation market share, HAVING against a scalar aggregate
  * of the same subtree, nested IN + per-group share) on the columns that do
  * exist.
  *
  * Scale posture: dimension tables that are fixed-size (nation, region, and
  * 1-row scalar aggregates) are broadcast explicitly; part/supplier grow with
  * SF so their join strategy is left to AQE; every date/type filter sits
  * directly on the scan so it pushes into parquet.
  */
object TpchFinalQueries extends QueryPack {

  private val stable = "CAST(CAST(SUM(CAST(%s AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
  private val discPrice = "l_extendedprice * (1 - l_discount)"

  override def queries: Map[String, Query] = Map(
    // Q2 shape: cheapest supplier per part within a region, expressed as a
    // correlated MIN subquery that Catalyst must decorrelate into an
    // aggregate join (per-row execution would re-scan lineitem per part).
    // Price comparisons are on STORED doubles (min, no arithmetic) so the
    // equality is exact across engines.
    "q2_min_price_supplier" -> ((s, dir) => {
      Seq("part", "supplier", "lineitem", "nation", "region")
        .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql(
        """SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
          |  l.l_extendedprice AS min_price
          |FROM part p, supplier s, lineitem l, nation n, region r
          |WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
          |  AND p.p_size = 14 AND s.s_nationkey = n.n_nationkey
          |  AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
          |  AND l.l_extendedprice = (
          |    SELECT min(l2.l_extendedprice)
          |    FROM lineitem l2, supplier s2, nation n2, region r2
          |    WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
          |      AND s2.s_nationkey = n2.n_nationkey
          |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
          |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
          |LIMIT 100""".stripMargin)
    }),

    // Q8 shape: one nation's market share inside a region's market for a
    // part type, by order year — the 8-table join with nation appearing
    // twice under different roles (customer side restricted to ASIA,
    // supplier side carried into the share numerator).
    "q8_mkt_share" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = Tables.load(s, dir, "customer")
      val p = Tables.load(s, dir, "part").filter(col("p_type") === "PROMO")
      val sup = Tables.load(s, dir, "supplier")
      val custAsia = Tables.load(s, dir, "nation")
        .join(Tables.load(s, dir, "region"),
          col("n_regionkey") === col("r_regionkey"))
        .filter(col("r_name") === "ASIA")
        .select(col("n_nationkey").as("c_nk"))
      val suppNat = Tables.load(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(custAsia), c("c_nationkey") === col("c_nk"))
        // part and supplier grow with SF — no hint, AQE sizes them.
        .join(p, li("l_partkey") === p("p_partkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(suppNat), sup("s_nationkey") === col("s_nk"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((sumStable(when(col("supp_nation") === "NATION_7", vol)
            .otherwise(lit(0.0))) / sumStable(vol)).as("mkt_share"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("o_year"))
    }),

    // Q9 shape: profit by supplier nation × year over a name-pattern part
    // slice; supply cost proxied by retail price (no partsupp) so profit =
    // disc price − 10% of retail value of the shipped quantity.
    "q9_profit_by_nation" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val p = Tables.load(s, dir, "part").filter(col("p_name").contains("red"))
      val sup = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("p_retailprice") * col("l_quantity") * lit(0.1)
      li.join(p, li("l_partkey") === p("p_partkey"))
        .join(sup, li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("l_shipdate")).as("o_year"))
        .agg(sumStable(profit).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    }),

    // Q11 shape: parts whose inventory value (from one nation's suppliers)
    // exceeds a scalar aggregate of the SAME grouped subtree — the original
    // compares against a fixed fraction of the total; a multiple of the
    // mean is used here so the predicate stays selective-but-nonempty at
    // every SF (a fixed fraction degenerates as |part| grows).
    "q11_important_parts" -> ((s, dir) => {
      val suppN3 = Tables.load(s, dir, "supplier")
        .join(broadcast(Tables.load(s, dir, "nation")
          .filter(col("n_name") === "NATION_3")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val li = Tables.load(s, dir, "lineitem")
      val value = li.join(suppN3, li("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sumStable(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("value"))
      // Stable re-sum of the per-part doubles keeps the mean identical
      // across engines regardless of merge order; 1 row → broadcast.
      val thr = value.agg(
        (sumStable(col("value")) / count(lit(1))).as("__avg"))
      value.join(broadcast(thr))
        .filter(col("value") > lit(2) * col("__avg"))
        .select(col("l_partkey"), col("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    }),

    // Q12 shape: late-shipment priority counts — conditional integer
    // aggregation after an orders⋈lineitem join, grouped on a low-cardinality
    // line attribute (no shipmode column; returnflag plays its role, and
    // "late" is shipdate > orderdate + 60 days).
    "q12_late_priority" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      val o = Tables.load(s, dir, "orders")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // Q20 shape: suppliers holding an outsized share of any PROMO part's
    // shipped quantity — nested IN over part plus a per-(part,supplier)
    // aggregate compared against the part's total via a windowed sum over
    // the grouped result (the decorrelated form of the original's
    // correlated HAVING subquery). Quantities are integral doubles, so the
    // sums are exact in any merge order.
    "q20_top_share_suppliers" -> ((s, dir) => {
      Seq("part", "supplier", "lineitem", "nation")
        .foreach(t => Tables.load(s, dir, t).createOrReplaceTempView(t))
      s.sql(
        """SELECT s_suppkey, s_name
          |FROM supplier JOIN nation ON s_nationkey = n_nationkey
          |WHERE n_name = 'NATION_3' AND s_suppkey IN (
          |  SELECT l_suppkey FROM (
          |    SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty,
          |      SUM(SUM(l_quantity)) OVER (PARTITION BY l_partkey)
          |        AS total_qty
          |    FROM lineitem
          |    WHERE l_partkey IN
          |      (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
          |    GROUP BY l_suppkey, l_partkey)
          |  WHERE qty > CAST(0.1 AS DOUBLE) * total_qty)
          |ORDER BY s_suppkey""".stripMargin)
    }))

  override def oracleSql: Map[String, String] = Map(
    "q2_min_price_supplier" ->
      """SELECT DISTINCT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
        |  l.l_extendedprice AS min_price
        |FROM part p, supplier s, lineitem l, nation n, region r
        |WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
        |  AND p.p_size = 14 AND s.s_nationkey = n.n_nationkey
        |  AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
        |  AND l.l_extendedprice = (
        |    SELECT min(l2.l_extendedprice)
        |    FROM lineitem l2, supplier s2, nation n2, region r2
        |    WHERE l2.l_partkey = p.p_partkey AND s2.s_suppkey = l2.l_suppkey
        |      AND s2.s_nationkey = n2.n_nationkey
        |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        |ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
        |LIMIT 100""".stripMargin,

    "q8_mkt_share" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  ${stable.format(
               s"CASE WHEN n2.n_name = 'NATION_7' THEN $discPrice ELSE 0 END")}
         |  / ${stable.format(discPrice)} AS mkt_share,
         |  COUNT(*) AS n_lines
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE r_name = 'ASIA' AND p_type = 'PROMO'
         |  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
         |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
         |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q9_profit_by_nation" ->
      s"""SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
         |  ${stable.format(
               s"$discPrice - p_retailprice * l_quantity * CAST(0.1 AS DOUBLE)")}
         |  AS sum_profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_name LIKE '%red%'
         |GROUP BY 1, 2
         |ORDER BY 1, 2 DESC""".stripMargin,

    "q11_important_parts" ->
      s"""WITH v AS (
         |  SELECT l_partkey, ${stable.format(discPrice)} AS value
         |  FROM lineitem
         |  JOIN supplier ON l_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  WHERE n_name = 'NATION_3'
         |  GROUP BY l_partkey)
         |SELECT l_partkey, value FROM v
         |WHERE value > 2 * (
         |  SELECT ${stable.format("value")} / COUNT(*) FROM v)
         |ORDER BY value DESC, l_partkey""".stripMargin,

    "q12_late_priority" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q20_top_share_suppliers" ->
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_3' AND s_suppkey IN (
        |  SELECT l_suppkey FROM (
        |    SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty,
        |      SUM(SUM(l_quantity)) OVER (PARTITION BY l_partkey)
        |        AS total_qty
        |    FROM lineitem
        |    WHERE l_partkey IN
        |      (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        |    GROUP BY l_suppkey, l_partkey)
        |  WHERE qty > CAST(0.1 AS DOUBLE) * total_qty)
        |ORDER BY s_suppkey""".stripMargin)
}
