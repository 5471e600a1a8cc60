package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, StringType}

/** Gold-layer aggregations — reference `src/glue_jobs/silver_to_gold.py:16-80`.
  *
  * Each is a multi-key hash aggregation that Spark plans as partial+final
  * `HashAggregate` around one exchange; `countDistinct` adds an Expand — exact
  * for oracle parity, with `approxDistinct=true` as the documented 100 TB
  * scale path (HLL, no Expand, one pass).
  *
  * Money math: the reference sums `double` (`bronze_to_silver.py:124`), whose
  * result depends on partition merge order. For deterministic cross-engine
  * results we sum on DECIMAL(38,10) — exact, associative, identical in any
  * engine — and surface the final value as double. At 100 TB this also removes
  * run-to-run drift in gold tables.
  */
object Aggregations {

  private val Dec = DecimalType(38, 10)

  /** Order-insensitive sum of a double column, surfaced as double.
    *
    * The decimal→double hop goes via string: engines differ in how they cast
    * int128-backed decimals to double (DuckDB divides after an int→double
    * round, Java BigDecimal converts correctly rounded — 1-2 ulp apart), but
    * every engine's string→double parse is correctly rounded, so
    * decimal→string→double is bit-identical everywhere.
    */
  def sumStable(c: Column): Column =
    sum(c.cast(Dec)).cast(StringType).cast(DoubleType)

  /** Order-insensitive average: exact decimal sum, IEEE double division. */
  def avgStable(c: Column): Column = sumStable(c) / count(c)

  /** Pearson correlation from the five decimal-stable moment sums (`n`,
    * `sx`, `sy`, `sxy`, `sxx`, `syy` columns). The IEEE operation ORDER
    * here is load-bearing — every oracle mirrors this exact chain — so
    * all consumers (regression stats, assortativity, Spearman-of-ranks)
    * share it instead of re-typing it.
    */
  def pearsonFromMoments(n: Column, sx: Column, sy: Column, sxy: Column,
      sxx: Column, syy: Column): Column = {
    val nd = n.cast(DoubleType)
    (sxy - sx * sy / nd) /
      org.apache.spark.sql.functions.sqrt(
        (sxx - sx * sx / nd) * (syy - sy * sy / nd))
  }

  /** The 6 shared measures of A1/A2 (`silver_to_gold.py:20-28,38-46`). */
  private def measures(approxDistinct: Boolean): Seq[Column] = Seq(
    count(col("transaction_id")).as("transaction_count"),
    sumStable(col("amount")).as("total_amount"),
    avgStable(col("amount")).as("avg_amount"),
    min(col("amount")).as("min_amount"),
    max(col("amount")).as("max_amount"),
    (if (approxDistinct) approx_count_distinct(col("transaction_id"))
     else countDistinct(col("transaction_id"))).as("unique_transactions"))

  /** A1 — daily per-customer aggregation (`silver_to_gold.py:16-32`). */
  def daily(silver: DataFrame, approxDistinct: Boolean = false): DataFrame =
    silver.groupBy(col("year"), col("month"), col("day"), col("customer_id"))
      .agg(measures(approxDistinct).head, measures(approxDistinct).tail: _*)
      .withColumn("aggregation_level", lit("daily"))

  /** A2 — monthly per-customer aggregation (`silver_to_gold.py:34-50`). */
  def monthly(silver: DataFrame, approxDistinct: Boolean = false): DataFrame =
    silver.groupBy(col("year"), col("month"), col("customer_id"))
      .agg(measures(approxDistinct).head, measures(approxDistinct).tail: _*)
      .withColumn("aggregation_level", lit("monthly"))

  /** A3 — customer lifetime insights (`silver_to_gold.py:52-80`): lifetime
    * count/sum/avg, first/last transaction timestamps, multi-column
    * `countDistinct(year, month, day)` for active days, tenure via `datediff`,
    * CASE segmentation.
    */
  def customerInsights(silver: DataFrame, approxDistinct: Boolean = false): DataFrame =
    silver.groupBy(col("customer_id"))
      .agg(
        count(col("transaction_id")).as("lifetime_transactions"),
        sumStable(col("amount")).as("lifetime_value"),
        avgStable(col("amount")).as("avg_transaction_amount"),
        min(col("transaction_date")).as("first_transaction_date"),
        max(col("transaction_date")).as("last_transaction_date"),
        (if (approxDistinct) approx_count_distinct(concat_ws("-", col("year"), col("month"), col("day")))
         else countDistinct(col("year"), col("month"), col("day"))).as("active_days"))
      .withColumn("customer_tenure_days",
        datediff(col("last_transaction_date"), col("first_transaction_date")))
      .withColumn("customer_segment", Derivations.customerSegment(col("lifetime_value")))
}
