package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Cleaning operators — reference `src/glue_jobs/bronze_to_silver.py:26-51`
  * (`clean_transaction_data`) and `:123-133` (type hardening + partition
  * guards).
  *
  * All operators are narrow or single-shuffle and express as Catalyst plans so
  * predicate pushdown / column pruning keep working at 100 TB: the not-null and
  * range filters reach the file scan as `PushedFilters`.
  */
object Cleaning {

  /** P1 — distinct-by-key dedup keeping one arbitrary row per key
    * (`bronze_to_silver.py:33`). One hash-partition shuffle on the key;
    * map-side partial aggregation bounds the exchange.
    */
  def dedupArbitrary(df: DataFrame, key: String): DataFrame =
    df.dropDuplicates(key)

  /** Deterministic dedup variant (for golden tests / oracle parity): keep the
    * first row per key under an explicit ordering. Same single shuffle as P1
    * (window partitionBy key).
    */
  def dedupDeterministic(df: DataFrame, key: String, order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** P2 — conjunctive not-null guard on required columns
    * (`bronze_to_silver.py:35-40`). Pushed to the scan.
    */
  def requireNonNull(df: DataFrame, cols: Seq[String]): DataFrame =
    df.filter(cols.map(col(_).isNotNull).reduce(_ && _))

  /** P3 — positive-amount range predicate (`bronze_to_silver.py:42`). */
  def positiveAmount(df: DataFrame, c: String = "amount"): DataFrame =
    df.filter(col(c) > 0)

  /** P4/P5 — partition-key guard before partitioned writes
    * (`bronze_to_silver.py:131-133`, `silver_to_gold.py:135-136`).
    */
  def partitionKeyGuard(df: DataFrame, keys: Seq[String]): DataFrame =
    requireNonNull(df, keys)

  /** E1–E3 — type hardening (`bronze_to_silver.py:123-126`): string→timestamp
    * parse that NULLs on failure (rows then dropped by the partition guard —
    * this silent-drop semantics is part of the contract), amount→double,
    * ids→string. `try_to_timestamp`, because under Spark 4's default ANSI
    * mode a plain `to_timestamp` would throw on malformed input instead of
    * nulling (the reference ran pre-ANSI Spark 3.3).
    */
  def hardenTypes(df: DataFrame, tsFormat: String = "yyyy-MM-dd HH:mm:ss"): DataFrame =
    df.withColumn("transaction_date",
      try_to_timestamp(col("transaction_date"), lit(tsFormat)))
      .withColumn("amount", col("amount").cast(DoubleType))
      .withColumn("customer_id", col("customer_id").cast(StringType))
      .withColumn("transaction_id", col("transaction_id").cast(StringType))
}
