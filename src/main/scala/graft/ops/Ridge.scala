package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Aggregations.sumStable

/** Closed-form ridge regression (Hoerl-Kennard 1970) for two features plus
  * an intercept, solved from the normal equations (XᵀX + λI')β = Xᵀy with
  * the intercept unregularized (I' zeroes its diagonal entry — the
  * standard convention: shrinking the mean prediction to 0 is never
  * wanted).
  *
  * Architecture: ONE scan reduces the data to the nine Gram/moment sums
  * through the decimal-stable sum (order-insensitive — bit-identical on
  * any partitioning), then every λ is a pure 1-row PROJECTION solving the
  * 3×3 system by Cramer's rule in a fixed IEEE expression shape. Adding a
  * λ to the grid costs zero additional scans — the classic "sufficient
  * statistics once, hyperparameter sweep free" shape that at 100 TB is
  * the difference between one pass and one pass per λ. λ = 0 degenerates
  * to exact OLS.
  *
  * Determinism: decimal sums + a fixed Cramer operation order mean the
  * coefficients are reproducible bit-for-bit cross-engine; the oracle
  * retypes the identical determinant formula.
  */
object Ridge {

  /** det of [[a,b,c],[d,e,f],[g,h,i]] in the canonical cofactor order —
    * the one expression shape both engines evaluate.
    */
  def det3(a: Column, b: Column, c: Column, d: Column, e: Column, f: Column,
      g: Column, h: Column, i: Column): Column =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

  /** One row per λ: `(lambda, n, beta0, beta1, beta2)` for
    * y ~ beta0 + beta1·x1 + beta2·x2.
    */
  def fit2(df: DataFrame, x1Col: String, x2Col: String, yCol: String,
      lambdas: Seq[Double]): DataFrame = {
    require(lambdas.nonEmpty, "at least one lambda")
    val x1 = col(x1Col).cast("double")
    val x2 = col(x2Col).cast("double")
    val y = col(yCol).cast("double")
    val m = df.agg(
      count(lit(1)).as("n"),
      sumStable(x1).as("s1"), sumStable(x2).as("s2"),
      sumStable(y).as("sy"),
      sumStable(x1 * x1).as("s11"), sumStable(x1 * x2).as("s12"),
      sumStable(x2 * x2).as("s22"),
      sumStable(x1 * y).as("s1y"), sumStable(x2 * y).as("s2y"))
    val withLam = m.withColumn("lambda",
      explode(array(lambdas.map(lit(_)): _*)))
    val nD = col("n").cast("double")
    val (b0, b1, b2) = (col("sy"), col("s1y"), col("s2y"))
    val (e0, i0) = (col("s11") + col("lambda"), col("s22") + col("lambda"))
    val det = det3(nD, col("s1"), col("s2"),
      col("s1"), e0, col("s12"),
      col("s2"), col("s12"), i0)
    val d0 = det3(b0, col("s1"), col("s2"),
      b1, e0, col("s12"),
      b2, col("s12"), i0)
    val d1 = det3(nD, b0, col("s2"),
      col("s1"), b1, col("s12"),
      col("s2"), b2, i0)
    val d2 = det3(nD, col("s1"), b0,
      col("s1"), e0, b1,
      col("s2"), col("s12"), b2)
    withLam.select(col("lambda"), col("n"),
      (d0 / det).as("beta0"), (d1 / det).as("beta1"), (d2 / det).as("beta2"))
  }
}
