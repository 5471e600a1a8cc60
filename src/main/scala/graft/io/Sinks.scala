package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Sink writers (SURVEY.md §2.1 S4-S7): parquet + snappy, hive-style
  * partition layout matching the reference
  * (`bronze_to_silver.py:138-143`, `silver_to_gold.py:139-149`).
  *
  * Silver appends (incremental history); gold overwrites (full recompute is
  * the reference's idempotent late-data story). Static partition-overwrite
  * mode is kept deliberately — the reference replaces the whole gold root,
  * not just touched partitions (SURVEY.md §7.4 risk 5).
  */
object Sinks {

  /** S4 — silver: append, 3-level partitioning. At scale, y/m/d partitioning
    * gives consumers partition pruning and bounds single-write file counts.
    */
  def writeSilver(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Append)
      .partitionBy("year", "month", "day")
      .option("compression", "snappy")
      .parquet(path)

  /** S5 — gold daily: overwrite, partitioned year/month. */
  def writeGoldDaily(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy("year", "month")
      .option("compression", "snappy")
      .parquet(path)

  /** S6 — gold monthly: overwrite, partitioned year. */
  def writeGoldMonthly(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy("year")
      .option("compression", "snappy")
      .parquet(path)

  /** S7 — gold customer insights: overwrite, unpartitioned. */
  def writeGoldCustomer(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
      .parquet(path)
}
