package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Aggregations.{avgStable, sumStable}

/** Scan + filter + wide aggregation over the biggest table — the flagship
  * shape for 100 TB batch analytics: the shipdate filter and 7-column
  * projection push into the parquet scan, the aggregation runs partial+final
  * around a single exchange on low-cardinality keys.
  */
object TpchQueries extends QueryPack {

  override def queries: Map[String, Query] = Map(
    "q1_agg" -> ((s, dir) =>
      Tables.load(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumStable(col("l_quantity")).as("sum_qty"),
          sumStable(col("l_extendedprice")).as("sum_base_price"),
          sumStable(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          sumStable(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax"))).as("sum_charge"),
          avgStable(col("l_quantity")).as("avg_qty"),
          avgStable(col("l_extendedprice")).as("avg_price"),
          avgStable(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))))

  private def stable(expr: String) =
    s"CAST(CAST(SUM(CAST($expr AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"

  override def oracleSql: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${stable("l_quantity")} AS sum_qty,
         |  ${stable("l_extendedprice")} AS sum_base_price,
         |  ${stable("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
         |  ${stable("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
         |  ${stable("l_quantity")} / COUNT(l_quantity) AS avg_qty,
         |  ${stable("l_extendedprice")} / COUNT(l_extendedprice) AS avg_price,
         |  ${stable("l_discount")} / COUNT(l_discount) AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
