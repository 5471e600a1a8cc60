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

  /** Per-key trimmed mean: drop the lowest and highest ⌊n·trim⌋ rows by
    * value rank and average the middle through the decimal-stable sum.
    * Rank ties break by `idCol`, but the KEPT MULTISET of values is
    * tie-order-independent (boundary ties share the value), so the mean
    * is engine- and partitioning-exact. One per-key window pass.
    * Output: (key, n, n_kept, trimmed_mean).
    */
  def trimmedMean(df: DataFrame, keyCol: String, valueCol: String,
      idCol: String, trim: Double = 0.1): DataFrame = {
    require(trim >= 0 && trim < 0.5, s"trim must be in [0, 0.5), got $trim")
    import graft.ops.Aggregations.sumStable
    val wr = Window.partitionBy(col(keyCol)).orderBy(col(valueCol), col(idCol))
    val wp = Window.partitionBy(col(keyCol))
    df.select(col(keyCol), col(valueCol), col(idCol))
      .withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wp))
      .withColumn("__cut", floor(col("__n").cast("double") * lit(trim)))
      .filter(col("__rn") > col("__cut") && col("__rn") <= col("__n") - col("__cut"))
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n"), count(lit(1)).as("n_kept"),
        (sumStable(col(valueCol)) / count(lit(1))).as("trimmed_mean"))
  }

  /** Winsorized per-key mean: the tail values CLAMP to the trim-boundary
    * order statistics instead of being dropped — the robust-mean variant
    * that keeps n constant (metric pipelines prefer it when counts must
    * reconcile across reports, where [[trimmedMean]] changes the
    * denominator). Boundaries are real data values (rank cut+1 from below,
    * rank n−cut from above, same deterministic (value, id) order as the
    * trim), clamping is exact selection, and the mean goes through the
    * decimal-stable sum — engine-exact end to end. One window pass + one
    * aggregation; per-key state is O(1).
    */
  def winsorizedMean(df: DataFrame, keyCol: String, valueCol: String,
      idCol: String, trim: Double = 0.1): DataFrame = {
    require(trim >= 0 && trim < 0.5, s"trim must be in [0, 0.5), got $trim")
    import graft.ops.Aggregations.sumStable
    val wr = Window.partitionBy(col(keyCol)).orderBy(col(valueCol), col(idCol))
    val wp = Window.partitionBy(col(keyCol))
    df.select(col(keyCol), col(valueCol), col(idCol))
      .withColumn("__rn", row_number().over(wr))
      .withColumn("__n", count(lit(1)).over(wp))
      .withColumn("__cut", floor(col("__n").cast("double") * lit(trim)))
      .withColumn("__lo",
        max(when(col("__rn") === col("__cut") + 1, col(valueCol))).over(wp))
      .withColumn("__hi",
        max(when(col("__rn") === col("__n") - col("__cut"), col(valueCol)))
          .over(wp))
      .withColumn("__w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        max(col("__lo")).as("lo_bound"), max(col("__hi")).as("hi_bound"),
        (sumStable(col("__w")) / count(lit(1))).as("winsorized_mean"))
  }

  /** Per-key Gini concentration index of a non-negative integer measure —
    * the data-balance diagnostic (how unevenly are characters/tokens
    * spread across a source's documents): G = Σᵢ (2i − n − 1)·x₍ᵢ₎ /
    * (n·Σx) over the ascending value ranks i = 1..n, reported in integer
    * micro-units (round(10⁶·G)). The numerator and denominator are exact
    * integer sums — rank-tie order cannot change them (tied rows share
    * the value, and Σ(2i−n−1) over a tie block depends only on the
    * block's position set) — and the single division + round is IEEE,
    * so the report is engine-exact. G = 0 ⇔ perfectly even; → 1 as one
    * row holds everything. Zero-total keys report 0.
    */
  def giniIndex(df: DataFrame, keyCol: String, valueCol: String,
      idCol: String): DataFrame = {
    val wr = Window.partitionBy(col(keyCol)).orderBy(col("__x"), col(idCol))
    df.select(col(keyCol), col(valueCol).cast("long").as("__x"), col(idCol))
      .withColumn("__rn", row_number().over(wr).cast("long"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"),
        sum((lit(2L) * col("__rn") - lit(1L)) * col("__x")).as("__wx"))
      .select(col(keyCol), col("n"),
        when(col("__sx") === 0L, 0L).otherwise(
          // Σ(2i−n−1)x = Σ(2i−1)x − n·Σx — both terms exact integer sums
          round(((col("__wx") - col("n") * col("__sx")).cast("double") /
            (col("n") * col("__sx")).cast("double")) * lit(1e6)).cast("long"))
          .as("gini_q"))
  }
}
