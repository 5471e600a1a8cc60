package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD) statistics for data-quality screening: unlike
  * mean/stddev, the median and the median absolute deviation don't move
  * when a batch of corrupt extreme values lands — the estimator the
  * anomaly gate itself must be robust to the anomalies it hunts.
  *
  * Exactness: every statistic here is an ORDER STATISTIC of actual data
  * values (the same row_number/ceil(n·0.5) mechanism as the exact
  * positional quantiles in `a_price_quantiles`), and the only arithmetic
  * is one IEEE subtract (deviation) and one multiply (k·MAD) — so the
  * flagged set is bit-identical across engines, partitionings, and
  * retries. No float summation anywhere.
  */
object Robust {

  /** Per-key robust outlier screen: median, MAD, and the count of rows
    * whose absolute deviation exceeds `k`·MAD.
    *
    * Scale posture: two ranking passes (MAD is definitionally a second
    * median over deviations — irreducible), each a per-key window sort,
    * so per-key cost is one reducer sorting that key's rows. Exact
    * medians therefore want keys whose groups fit a reducer
    * (high-cardinality keys, or bounded groups like per-type event
    * domains); for a LOW-cardinality key over a 100 TB fact, screen on a
    * hash-sample or switch the center/spread to the mergeable quantile
    * sketch (`a_approx_quantiles`) — the flagging comparison is unchanged.
    * The deviation frame is staged once (localCheckpoint) so the second
    * pass and the final rollup don't recompute the join; at cluster scale
    * swap the stage for persist(DISK_ONLY). `idCol` breaks rank ties so
    * results don't depend on partition order.
    */
  def madOutlierStats(df: DataFrame, keyCol: String, valueCol: String,
      idCol: String, k: Double = 3.0): DataFrame = {
    val wr = Window.partitionBy(col(keyCol)).orderBy(col(valueCol), col(idCol))
    val wp = Window.partitionBy(col(keyCol))
    val med = df
      .withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wp))
      .groupBy(col(keyCol))
      .agg(max(when(col("__rn") === ceil(col("__n") * 0.5), col(valueCol)))
        .as("med"))
    val dev = df.select(col(keyCol), col(valueCol), col(idCol))
      .join(med, Seq(keyCol))
      .withColumn("__dev", abs(col(valueCol) - col("med")))
      .localCheckpoint()
    val wd = Window.partitionBy(col(keyCol)).orderBy(col("__dev"), col(idCol))
    val mad = dev
      .withColumn("__rn", row_number().over(wd))
      .withColumn("__n", count(lit(1)).over(wp))
      .groupBy(col(keyCol))
      .agg(max(when(col("__rn") === ceil(col("__n") * 0.5), col("__dev")))
        .as("mad"))
    dev.join(mad, Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med"),
        max(col("mad")).as("mad"),
        sum((col("__dev") > lit(k) * col("mad")).cast("long")).as("n_outliers"),
        max(col("__dev")).as("max_dev"))
  }
}
