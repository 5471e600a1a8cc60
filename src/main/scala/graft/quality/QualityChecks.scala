package graft.quality

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** The real implementation of the reference's EMPTY quality files
  * (`src/glue_jobs/data_quality_checks.py` and
  * `src/lambda_functions/data_validation.py` are both 0 bytes — SURVEY.md
  * §5.1): observed metrics that ride along with the write pass, plus
  * invariant assertions computed in a single aggregation.
  */
object QualityChecks {

  /** Attach an Observation counting rows + basic amount stats on the SAME
    * pass as the downstream action — replaces the reference's extra
    * `count()` scans (`bronze_to_silver.py:30,47,118` each re-ran the plan).
    */
  def observeCounts(df: DataFrame): (DataFrame, Observation) = {
    val obs = Observation()
    val observed = df.observe(obs,
      count(lit(1)).as("row_count"),
      sum(when(col("amount").isNull, 1).otherwise(0)).as("null_amounts"),
      min(col("amount")).as("min_amount"),
      max(col("amount")).as("max_amount"))
    (observed, obs)
  }

  /** Silver invariants (SURVEY.md §5.2.3), all evaluated in ONE aggregation
    * pass. Returns (invariant name → holds).
    */
  def silverInvariants(silver: DataFrame): Map[String, Boolean] = {
    val row = silver.agg(
      (count(lit(1)) === countDistinct(col("transaction_id")))
        .as("unique_transaction_ids"),
      (sum(when(col("transaction_id").isNull || col("customer_id").isNull ||
        col("amount").isNull || col("transaction_date").isNull, 1)
        .otherwise(0)) === 0).as("required_non_null"),
      (coalesce(min(col("amount")), lit(1.0)) > 0).as("amounts_positive"),
      (sum(when(col("year").isNull || col("month").isNull ||
        col("day").isNull, 1).otherwise(0)) === 0).as("partition_keys_non_null"))
      .collect()(0)
    row.schema.fieldNames.map(f => f -> row.getAs[Boolean](f)).toMap
  }

  /** Cross-table conservation: gold aggregates must re-add to silver totals
    * (daily Σ == monthly Σ == customer Σ, within decimal-exact equality
    * because all sums are DECIMAL-stable).
    */
  def conservationHolds(daily: DataFrame, monthly: DataFrame,
      customer: DataFrame): Boolean = {
    def total(df: DataFrame, c: String): java.math.BigDecimal =
      df.agg(sum(col(c).cast("decimal(38,10)"))).collect()(0)
        .getDecimal(0)
    val d = total(daily, "total_amount")
    val m = total(monthly, "total_amount")
    val c = total(customer, "lifetime_value")
    d.compareTo(m) == 0 && m.compareTo(c) == 0
  }
}
