package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{current_timestamp, lit}
import org.apache.spark.storage.StorageLevel

import graft.config.PipelineConfig
import graft.io.{Sinks, Sources}
import graft.ops.Aggregations

/** Silver → gold job: three independent aggregations from one silver scan
  * (reference `src/glue_jobs/silver_to_gold.py:main`).
  *
  * The reference scans silver three times with no cache (SURVEY.md §4.3
  * anti-pattern); here the cleaned projection is persisted MEMORY_AND_DISK
  * across the fan-out and unpersisted after — at 100 TB that's one scan of
  * the fact table instead of three (with only the ~7 referenced columns
  * cached, thanks to column pruning before the persist point).
  */
object SilverToGold {

  def run(spark: SparkSession, cfg: PipelineConfig): Unit = {
    val silver = Sources.silverParquet(spark, cfg.silverPath)
    // P7 — empty-input short-circuit (silver_to_gold.py:122-124)
    if (silver.isEmpty) return
    val projected = silver.select("transaction_id", "customer_id", "amount",
      "transaction_date", "year", "month", "day")
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val createdAt = cfg.clock.map(t => lit(t)).getOrElse(current_timestamp())
      val daily = Aggregations.daily(projected, cfg.approxDistinct)
        .withColumn("created_at", createdAt)
        .filter("year IS NOT NULL AND month IS NOT NULL") // P5 guard
      val monthly = Aggregations.monthly(projected, cfg.approxDistinct)
        .withColumn("created_at", createdAt)
        .filter("year IS NOT NULL")
      val customer = Aggregations.customerInsights(projected, cfg.approxDistinct)
        .withColumn("created_at", createdAt)
      Sinks.writeGoldDaily(daily, cfg.goldDailyPath)
      Sinks.writeGoldMonthly(monthly, cfg.goldMonthlyPath)
      Sinks.writeGoldCustomer(customer, cfg.goldCustomerPath)
    } finally projected.unpersist()
  }
}
