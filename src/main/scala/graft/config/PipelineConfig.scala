package graft.config

import java.sql.Timestamp

/** Typed pipeline configuration — replaces the reference's stringly job args
  * and terraform variables (`bronze_to_silver.py:77-91`, `silver_to_gold.py:
  * 89-103`, O6 in SURVEY.md §2.6).
  *
  * `clock`: None → `current_timestamp()` like the reference; tests inject a
  * fixed instant so golden outputs hash stably.
  */
case class PipelineConfig(
    rawPath: String,
    silverPath: String,
    goldPath: String,
    checkpointPath: String = "",
    clock: Option[Timestamp] = None,
    incremental: Boolean = false,
    approxDistinct: Boolean = false) {
  def goldDailyPath: String = s"$goldPath/daily_aggregations"
  def goldMonthlyPath: String = s"$goldPath/monthly_aggregations"
  def goldCustomerPath: String = s"$goldPath/customer_insights"
}

object PipelineConfig {

  /** `--key value` / `--flag` parser (reference parses argv by hand in both
    * jobs; one shared typed parser here).
    */
  def fromArgs(args: Array[String]): PipelineConfig = {
    val kv = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      require(a.startsWith("--"), s"unexpected argument: $a")
      val key = a.drop(2)
      if (i + 1 < args.length && !args(i + 1).startsWith("--")) {
        kv(key) = args(i + 1); i += 2
      } else { kv(key) = "true"; i += 1 }
    }
    PipelineConfig(
      rawPath = kv.getOrElse("raw-path",
        sys.error("--raw-path is required")),
      silverPath = kv.getOrElse("silver-path",
        sys.error("--silver-path is required")),
      goldPath = kv.getOrElse("gold-path",
        sys.error("--gold-path is required")),
      checkpointPath = kv.getOrElse("checkpoint-path", ""),
      clock = kv.get("fixed-clock").map(Timestamp.valueOf),
      incremental = kv.get("incremental").contains("true"),
      approxDistinct = kv.get("approx-distinct").contains("true"))
  }
}
