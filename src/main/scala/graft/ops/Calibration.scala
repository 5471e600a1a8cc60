package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier calibration screens (reliability diagram + expected
  * calibration error, the standard "is the score a probability" check run
  * before a model's scores gate data selection). Scores are integer
  * micro-nat LOG-ODDS; bins are fixed logit-space edges chosen so each
  * bin is a predicted-probability decile, and each bin's confidence is
  * the decile MIDPOINT in micro-units — the fixed-bin convention keeps
  * every statistic exact-integer (no per-row sigmoid, whose libm exp
  * differs across engines).
  */
object Calibration {

  /** Decile bin edges in micro-nat logit space: round(ln(p/(1−p))·10⁶)
    * for p = 0.1 … 0.9 — computed once here and embedded verbatim in the
    * oracle SQL, so both engines compare against identical integers.
    */
  val decileEdgesQ: Seq[Long] =
    (1 to 9).map(i => Math.round(math.log(i / (10.0 - i)) * 1e6))

  /** Decile midpoints in micro-probability units: bin b spans
    * (b/10, (b+1)/10) ⇒ midpoint (2b+1)·50000.
    */
  val decileMidsQ: Seq[Long] = (0 to 9).map(b => (2 * b + 1) * 50000L)

  /** Reliability bins: (`bin`, `n_docs`, `n_pos`, `conf_q`, `posrate_q`,
    * `gap_w_q`) per non-empty decile, with posrate_q the exact truncated
    * per-bin positive rate and gap_w_q = n_docs·|posrate_q − conf_q| (the
    * count-weighted ECE term). One map-combinable aggregation.
    */
  def reliabilityBins(scored: DataFrame, scoreQ: String,
      label: Column): DataFrame = {
    val bin = decileEdgesQ
      .map(e => when(col(scoreQ) >= e, 1).otherwise(0))
      .reduce(_ + _)
    scored.select(bin.cast("int").as("bin"), label.cast("long").as("p"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("p")).as("n_pos"))
      .withColumn("conf_q",
        element_at(typedlit(decileMidsQ), col("bin") + 1))
      .withColumn("posrate_q", expr("(1000000 * n_pos) div n_docs"))
      .withColumn("gap_w_q",
        col("n_docs") * abs(col("posrate_q") - col("conf_q")))
  }

  /** Scalar expected calibration error over [[reliabilityBins]]:
    * ece_q = (Σ_b gap_w_q) div N — one row (`n_docs`, `ece_q`).
    */
  def ece(scored: DataFrame, scoreQ: String, label: Column): DataFrame =
    reliabilityBins(scored, scoreQ, label)
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("gap_w_q")).as("__g"))
      .select(col("n_docs"), expr("__g div n_docs").as("ece_q"))
}
