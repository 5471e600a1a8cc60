package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Merge

/** Snapshot-merge / SCD queries over the customer dimension. The "new
  * snapshot" is derived deterministically from the stored table — drop the
  * mod-97 keys, bump acctbal on the mod-11 keys, re-key the mod-113 slice as
  * inserts — and the SAME derivation is spelled out in the oracle SQL, so
  * DuckDB rebuilds the identical snapshot and the comparison is value-exact
  * (delta classes, version rows, validity dates, current flags).
  */
object MergeQueries extends QueryPack {

  private val asOf = "2024-06-01"

  private def snapshot(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
    c.filter(pmod(col("c_custkey"), lit(97)) =!= 0)
      .withColumn("c_acctbal",
        when(pmod(col("c_custkey"), lit(11)) === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))
      .unionByName(c.filter(pmod(col("c_custkey"), lit(113)) === 0)
        .withColumn("c_custkey", col("c_custkey") + 1000000L))
  }

  private val snapSql =
    """snap AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    CASE WHEN c_custkey % 11 = 0 THEN c_acctbal + 100.0
      |         ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment
      |  FROM customer WHERE c_custkey % 97 <> 0
      |  UNION ALL
      |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 113 = 0),
      |delta AS (
      |  SELECT coalesce(c.c_custkey, s.c_custkey) AS c_custkey,
      |    CASE WHEN c.c_custkey IS NULL THEN 'inserted'
      |         WHEN s.c_custkey IS NULL THEN 'deleted'
      |         WHEN c.c_acctbal <> s.c_acctbal THEN 'updated'
      |         ELSE 'unchanged' END AS change_type
      |  FROM customer c FULL JOIN snap s ON c.c_custkey = s.c_custkey)""".stripMargin

  override def queries: Map[String, Query] = Map(
    // CDC classification: full-outer key join + content-hash compare.
    // The oracle compares the one column the derivation can change; the
    // operator hashes EVERY non-key column — agreeing classes prove the
    // hash fires exactly when content changed.
    "p_snapshot_delta" -> ((s, dir) =>
      Merge.snapshotDelta(Tables.load(s, dir, "customer"),
        snapshot(s, dir), Seq("c_custkey"))
        .orderBy(col("c_custkey"))),

    // Type-2 history after one snapshot apply: updated/deleted keys close
    // their 1990 version at asOf, updated/inserted keys open a new one,
    // unchanged rows pass through open — every leg value-checked.
    "p_scd2_customers" -> ((s, dir) => {
      val seed = Tables.load(s, dir, "customer")
        .withColumn("valid_from", lit("1990-01-01").cast("date"))
        .withColumn("valid_to", lit(null).cast("date"))
        .withColumn("is_current", lit(1))
      Merge.scd2Apply(seed, snapshot(s, dir), Seq("c_custkey"),
        lit(asOf))
        // open versions project the conventional high date for the gate:
        // a NULL date crosses the two engines as None-vs-NaT dtype noise
        .withColumn("valid_to",
          coalesce(col("valid_to"), lit("9999-12-31").cast("date")))
        .orderBy(col("c_custkey"), col("valid_from"))
    }))

  override def oracleSql: Map[String, String] = Map(
    "p_snapshot_delta" ->
      s"""WITH $snapSql
         |SELECT c_custkey, change_type FROM delta ORDER BY c_custkey""".stripMargin,

    "p_scd2_customers" ->
      s"""WITH $snapSql
         |SELECT c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal,
         |  c.c_mktsegment, DATE '1990-01-01' AS valid_from,
         |  CASE WHEN d.change_type IN ('updated', 'deleted')
         |       THEN DATE '$asOf' ELSE DATE '9999-12-31' END AS valid_to,
         |  CAST(CASE WHEN d.change_type IN ('updated', 'deleted') THEN 0
         |       ELSE 1 END AS INTEGER) AS is_current
         |FROM customer c JOIN delta d ON c.c_custkey = d.c_custkey
         |UNION ALL
         |SELECT s.c_custkey, s.c_name, s.c_nationkey, s.c_acctbal,
         |  s.c_mktsegment, DATE '$asOf', DATE '9999-12-31',
         |  CAST(1 AS INTEGER)
         |FROM snap s JOIN delta d ON s.c_custkey = d.c_custkey
         |WHERE d.change_type IN ('updated', 'inserted')
         |ORDER BY c_custkey, valid_from""".stripMargin)
}
