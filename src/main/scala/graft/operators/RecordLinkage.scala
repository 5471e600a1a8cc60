package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fellegi-Sunter probabilistic record linkage (JASA 1969): score candidate
  * pairs by the likelihood-ratio odds that they refer to the same entity.
  *
  * Each comparison field contributes m/u when the pair AGREES on it and
  * (1-m)/(1-u) when it disagrees, where m = P(agree | match) is a
  * caller-supplied prior and u = P(agree | non-match) is estimated from the
  * data as the chance-agreement rate of a random pair (with replacement):
  * u = Σ_v (count_v / n)² — the exact frequency identity, computed from one
  * tiny per-field aggregation rather than any pair sampling. The pair score
  * is the PRODUCT of the per-field factors (the likelihood ratio itself, not
  * its log): a fixed-order IEEE double product, so scores are bit-identical
  * across engines and partitionings — no transcendental in the chain.
  *
  * Scale posture: candidates come from equi-join BLOCKING on `blockCol`
  * (the standard linkage trade — recall is bounded by the blocking key, cost
  * by the block sizes: per-block work is quadratic, so blocks must be
  * density-bounded the way DBSCAN cells are; compose multiple passes with
  * different keys for multi-key blocking). The u/n statistics ride along as
  * a broadcast 1-row frame; count squares go through DECIMAL(38,0) so a
  * hot value's cnt² cannot overflow a long at billion-row scale. The
  * `minOdds` filter sits directly on the joined projection, so nothing
  * below threshold survives the stage.
  */
object RecordLinkage {

  /** Pairs within `blockCol` blocks scoring at least `minOdds`.
    * `fields` = (comparison column, m-prior, 1-m written as an exact
    * literal — callers pass e.g. (f, 0.95, 0.05) so both engines parse the
    * same decimal text instead of one computing 1-m). Agreement is
    * null-safe equality. Output: (id_a, id_b, n_agree, odds).
    */
  def fsPairOdds(df: DataFrame, idCol: String, blockCol: String,
      fields: Seq[(String, Double, Double)], minOdds: Double): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field")
    val nFrame = df.agg(count(lit(1)).as("__n"))
    // per-field chance-agreement mass Σ cnt_v² (DECIMAL(38,0) — exact)
    val uFrames = fields.map { case (f, _, _) =>
      df.groupBy(col(f)).agg(count(lit(1)).as("__c"))
        .agg(sum(col("__c").cast(DecimalType(19, 0))
          * col("__c").cast(DecimalType(19, 0))).as(s"__sq_$f"))
    }
    val stats = uFrames.foldLeft(nFrame)((acc, u) => acc.crossJoin(u))
    def uOf(f: String): Column =
      col(s"__sq_$f").cast("double") /
        (col("__n").cast("double") * col("__n").cast("double"))
    val a = df.select(col(idCol).as("id_a") +: col(blockCol).as("__blk") +:
      fields.map { case (f, _, _) => col(f).as(s"__a_$f") }: _*)
    val b = df.select(col(idCol).as("id_b") +: col(blockCol).as("__blk") +:
      fields.map { case (f, _, _) => col(f).as(s"__b_$f") }: _*)
    val factors = fields.map { case (f, m, mDis) =>
      val u = uOf(f)
      when(col(s"__a_$f") <=> col(s"__b_$f"), lit(m) / u)
        .otherwise(lit(mDis) / (lit(1.0) - u))
    }
    val agrees = fields.map { case (f, _, _) =>
      (col(s"__a_$f") <=> col(s"__b_$f")).cast("int")
    }
    a.join(b, Seq("__blk"))
      .filter(col("id_a") < col("id_b"))
      .crossJoin(broadcast(stats)) // 1-row statistics frame
      .select(col("id_a"), col("id_b"),
        agrees.reduceLeft(_ + _).as("n_agree"),
        factors.reduceLeft(_ * _).as("odds"))
      .filter(col("odds") >= lit(minOdds))
  }
}
