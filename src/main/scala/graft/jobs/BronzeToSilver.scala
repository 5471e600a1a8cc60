package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.config.PipelineConfig
import graft.io.{Sinks, Sources}
import graft.ops.{Cleaning, Derivations}
import graft.quality.QualityChecks

/** Bronze → silver job: the full cleaning + derivation composition
  * (reference `src/glue_jobs/bronze_to_silver.py:main`, `:73-152`).
  *
  * The whole job is ONE lazy plan ending in one partitioned write — the
  * reference's three separate `count()` actions re-executed the bronze scan
  * three times (SURVEY.md §4.3); here counts ride along as observed metrics
  * on the same pass.
  */
object BronzeToSilver {

  val requiredColumns: Seq[String] =
    Seq("transaction_id", "customer_id", "amount", "transaction_date")

  /** Pure transform: bronze rows → silver rows. Composable with either the
    * batch reader or a foreachBatch micro-batch (incremental mode).
    */
  def transform(bronze: DataFrame,
      clock: Option[java.sql.Timestamp] = None): DataFrame = {
    val hardened = Cleaning.hardenTypes(
      bronze.drop("_corrupt_record"))
    val deduped = Cleaning.dedupArbitrary(hardened, "transaction_id")
    val filtered = Cleaning.positiveAmount(
      Cleaning.requireNonNull(deduped, requiredColumns))
    val derived =
      Derivations.withIntegralityTag(
        Derivations.withAmountCategory(
          Derivations.withDateParts(
            Derivations.withProcessedTimestamp(
              Derivations.withQualityScore(filtered), clock))))
    Cleaning.partitionKeyGuard(derived, Seq("year", "month", "day"))
  }

  /** Run batch mode: read all of bronze, write silver, return quality
    * metrics. (Incremental mode lives in
    * [[graft.streaming.IncrementalIngest]].)
    */
  def run(spark: SparkSession, cfg: PipelineConfig): Map[String, Long] = {
    val bronze = Sources.bronzeJson(spark, cfg.rawPath)
    // P6 — empty-input short-circuit (bronze_to_silver.py:118-121)
    if (bronze.isEmpty) return Map("initial_count" -> 0L, "final_count" -> 0L,
      "corrupt_count" -> 0L)
    // Both observations ride the single write pass. The corrupt count must be
    // observed BEFORE transform drops the column — and a standalone
    // corrupt-only count query is disallowed by Spark anyway
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN).
    val obsIn = org.apache.spark.sql.Observation()
    val observedIn = bronze.observe(obsIn,
      org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("initial_count"),
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.when(
          col("_corrupt_record").isNotNull, 1L).otherwise(0L))
        .as("corrupt_count"))
    val (observedOut, obsOut) =
      QualityChecks.observeCounts(transform(observedIn, cfg.clock))
    Sinks.writeSilver(observedOut, cfg.silverPath)
    Map(
      "initial_count" -> obsIn.get("initial_count").asInstanceOf[Long],
      "corrupt_count" -> obsIn.get("corrupt_count").asInstanceOf[Long],
      "final_count" -> obsOut.get("row_count").asInstanceOf[Long])
  }
}
