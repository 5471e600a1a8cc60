package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy re-identification screens beyond k-anonymity / l-diversity
  * (which the `x_k_anonymity` gate reports): t-CLOSENESS (Li, Li,
  * Venkatasubramanian, ICDE 2007) — a quasi-identifier group is t-close
  * when the distance between its SENSITIVE-attribute distribution and the
  * global one is at most t, closing the attribute-disclosure gap
  * l-diversity leaves open (a group can be l-diverse yet skewed enough
  * that membership alone leaks the sensitive value).
  */
object Privacy {

  /** Per-QI-group t-closeness for an ORDERED sensitive attribute, using
    * the paper's ordered-distance form: EMD(P, Q) = (Σᵢ |cumP(i) −
    * cumQ(i)|) / (m − 1) over the m globally-observed sensitive values in
    * order. Computed EXACTLY in integers: the cumulative difference at
    * value i is (Aᵢ·N − Bᵢ·n_g) / (n_g·N) for group cumulative count Aᵢ,
    * global cumulative count Bᵢ, group size n_g, total N — so
    * t_q = ⌊10⁶ · Σᵢ|Aᵢ·N − Bᵢ·n_g| / (n_g·N·(m−1))⌋ is one integer
    * floor division per group and both engines agree bit-for-bit.
    * Single-valued domains (m = 1) are trivially 0-close.
    *
    * Scale shape: one groupBy to the (QI, value) count table (map-side
    * combinable — the only corpus-width pass), then everything operates
    * on |QI groups| × m rows: the global value table broadcasts, the
    * per-group cumulative runs as a window over ≤ m rows per group.
    * Output: one row per QI group (qi..., n, t_q).
    */
  def tCloseness(df: DataFrame, qiCols: Seq[String],
      sensitive: String): DataFrame = {
    require(qiCols.nonEmpty)
    val qi = qiCols.map(col)
    // (QI, value) counts — the one full-data pass
    val counts = df.groupBy(qi :+ col(sensitive).as("__v"): _*)
      .agg(count(lit(1)).as("__c"))
      .localCheckpoint() // feeds the global table AND the matrix
    // global value table: ordered cumulative counts + N + m
    val globalVals = counts.groupBy(col("__v"))
      .agg(sum(col("__c")).as("__gc"))
      .withColumn("__gcum",
        sum(col("__gc")).over(Window.orderBy(col("__v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint() // tiny: one row per sensitive value
    val totals = globalVals.agg(sum(col("__gc")).as("__n"),
      count(lit(1)).as("__m"))
    // group × value matrix (absent values count 0), group cumulatives
    val groups = counts.groupBy(qi: _*).agg(sum(col("__c")).as("__ng"))
    val matrix = groups
      .crossJoin(broadcast(globalVals.select(col("__v"), col("__gcum"))))
      .join(counts, qiCols :+ "__v", "left")
      .select(qi ++ Seq(col("__ng"), col("__v"), col("__gcum"),
        coalesce(col("__c"), lit(0L)).as("__c")): _*)
    val wg = Window.partitionBy(qi: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    matrix.withColumn("__acum", sum(col("__c")).over(wg))
      .crossJoin(broadcast(totals))
      .groupBy(qi :+ col("__ng") :+ col("__n") :+ col("__m"): _*)
      .agg(sum(abs(col("__acum") * col("__n") -
        col("__gcum") * col("__ng"))).as("__tnum"))
      .select(qi ++ Seq(col("__ng").as("n"), expr(
        "CAST(CASE WHEN __m > 1 THEN (1000000 * __tnum) " +
          "div (__ng * __n * (__m - 1)) ELSE 0 END AS BIGINT)")
        .as("t_q")): _*)
  }
}
