package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Derived-column operators — reference `src/glue_jobs/bronze_to_silver.py:44-45`
  * (quality metadata) and `:53-71` (`add_derived_columns`).
  *
  * Everything here is a scalar expression: stays inside whole-stage codegen,
  * no shuffle, no UDF.
  */
object Derivations {

  /** E4 — constant quality score (`bronze_to_silver.py:44`). */
  def withQualityScore(df: DataFrame, score: Double = 1.0): DataFrame =
    df.withColumn("data_quality_score", lit(score))

  /** E5 — processing timestamp (`bronze_to_silver.py:45`). `clock=None` uses
    * `current_timestamp()` like the reference; tests inject a fixed clock for
    * golden-hash stability.
    */
  def withProcessedTimestamp(df: DataFrame, clock: Option[java.sql.Timestamp] = None): DataFrame =
    df.withColumn("processed_timestamp",
      clock.map(t => lit(t)).getOrElse(current_timestamp()))

  /** E6 — calendar-part extraction (`bronze_to_silver.py:57-60`). These become
    * the silver partition columns, so they must be derived before the write.
    */
  def withDateParts(df: DataFrame, ts: String = "transaction_date"): DataFrame =
    df.withColumn("year", year(col(ts)))
      .withColumn("month", month(col(ts)))
      .withColumn("day", dayofmonth(col(ts)))
      .withColumn("hour", hour(col(ts)))

  /** E7 — CASE bucketing of amount (`bronze_to_silver.py:62-65`). Strict `<`
    * boundaries: 100 and 1000 land in the NEXT bucket.
    */
  def amountCategory(amount: Column): Column =
    when(amount < 100, "small")
      .when(amount < 1000, "medium")
      .otherwise("large")

  def withAmountCategory(df: DataFrame, c: String = "amount"): DataFrame =
    df.withColumn("amount_category", amountCategory(col(c)))

  /** E8 — integrality test via cast round-trip (`bronze_to_silver.py:67-69`):
    * `amount == CAST(amount AS LONG)` (truncation-toward-zero, not rounding).
    */
  def integralityTag(amount: Column): Column =
    when(amount === amount.cast(LongType), "whole_number").otherwise("decimal")

  def withIntegralityTag(df: DataFrame, c: String = "amount"): DataFrame =
    df.withColumn("transaction_type_derived", integralityTag(col(c)))

  /** E10 — customer-value segmentation (`silver_to_gold.py:71-76`). Strict `>`
    * boundaries: exactly 10000 is medium, exactly 5000 is low.
    */
  def customerSegment(lifetimeValue: Column): Column =
    when(lifetimeValue > 10000, "high_value")
      .when(lifetimeValue > 5000, "medium_value")
      .otherwise("low_value")
}
