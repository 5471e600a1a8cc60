package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed selection (k-th order statistics) in two scans —
  * the scalable replacement for a global sort when only a handful of
  * exact quantiles is needed (approx sketches answer "roughly the
  * median"; audits and SLA cuts need THE value).
  *
  * Pass 1 range-buckets the column and ships only the ≤`buckets`-row
  * histogram to the driver (bounded model state, the k-means-k
  * convention); the driver's prefix sums turn each requested rank into a
  * (bucket, local-rank) target. Pass 2 aggregates DISTINCT values inside
  * only the targeted buckets and walks each bucket's cumulative counts
  * with a bucket-partitioned window — parallel across buckets, sized by
  * distinct-values-per-bucket, never by N. A global
  * `row_number().over(Window.orderBy(v))` — the one-reducer full sort —
  * appears only in the DuckDB oracle.
  *
  * Selection-by-value is tie-agnostic: equal values make the k-th VALUE
  * well-defined whatever order ties shuffle in, so no tie-break column is
  * needed anywhere.
  *
  * Heavily skewed data can still concentrate distinct values in one
  * bucket; `buckets` bounds that second-pass width, and a recursive
  * re-split of a fat bucket is the standard escalation if a profile shows
  * one (not needed at current scales).
  */
object Selection {

  /** Exact values at quantile fractions `f`, defined as order statistic
    * rank 1 + ⌊f·(N−1)⌋ (the lower-interpolation convention — always an
    * actual data value, never an average of two).
    *
    * Output: (`frac`, `rank`, `value`), one row per requested fraction.
    */
  def exactQuantiles(df: DataFrame, valueCol: String,
      fractions: Seq[Double], buckets: Int = 4096): DataFrame = {
    require(fractions.nonEmpty, "need at least one fraction")
    require(fractions.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must lie in [0, 1]")
    require(buckets >= 2, "need at least two buckets")
    val spark = df.sparkSession
    import spark.implicits._
    val v = df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .localCheckpoint() // scanned twice: histogram, then bucket probe
    val stats = v.agg(count(lit(1)), min(col("v")), max(col("v"))).head()
    val n = stats.getLong(0)
    require(n > 0, "no non-null values to select from")
    val lo = stats.getDouble(1)
    val hi = stats.getDouble(2)
    val ranks = fractions.map(f =>
      1L + math.floor(f * (n - 1).toDouble).toLong)
    if (lo == hi)
      return fractions.zip(ranks).map { case (f, k) => (f, k, lo) }
        .toDF("frac", "rank", "value")
    val width = (hi - lo) / buckets
    def bucketOf = least(greatest(
      floor((col("v") - lit(lo)) / lit(width)).cast("long"), lit(0L)),
      lit(buckets - 1L))
    // pass 1: ≤ buckets rows to the driver
    val hist = v.groupBy(bucketOf.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cumBefore = (0 until buckets).scanLeft(0L) {
      case (acc, b) => acc + hist.getOrElse(b.toLong, 0L)
    } // cumBefore(b) = rows in buckets < b
    def targetOf(k: Long): (Long, Long) = {
      // cumBefore(i) = rows in buckets [0, i): rank k lives in the last
      // bucket whose prefix is still below k
      val b = cumBefore.lastIndexWhere(_ < k)
      (b.toLong, k - cumBefore(b))
    }
    val targets = fractions.zip(ranks).map { case (f, k) =>
      val (b, local) = targetOf(k)
      (f, k, b, local)
    }
    val neededBuckets = targets.map(_._3).distinct
    // pass 2: distinct-value counts inside targeted buckets only
    val wcum = Window.partitionBy(col("b")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = v.withColumn("b", bucketOf)
      .filter(col("b").isin(neededBuckets: _*))
      .groupBy(col("b"), col("v")).agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wcum))
    val tdf = broadcast(targets
      .toDF("frac", "rank", "b", "local"))
    cum.join(tdf, Seq("b"))
      .filter(col("cum") - col("c") < col("local") &&
        col("local") <= col("cum"))
      .select(col("frac"), col("rank"), col("v").as("value"))
  }
}
