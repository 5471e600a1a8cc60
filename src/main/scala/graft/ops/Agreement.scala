package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inter-annotator agreement over vote columns — the chance-corrected
  * reliability screens a labeling pipeline runs before trusting its
  * annotators (human or labeling-function): Cohen's kappa (1960) for
  * pairs, Fleiss' kappa (1971) for the whole panel. Votes are +1 / -1
  * with 0 = abstain. Every statistic is EXACT INTEGER arithmetic on
  * count aggregates (the chance terms are rationals — numerator and
  * denominator carried separately until one final truncating division),
  * so results are bit-identical across engines and partitionings.
  */
object Agreement {

  /** Pairwise Cohen's kappa: for each unordered column pair, restricted
    * to items where BOTH vote, kappa = (p_o − p_e)/(1 − p_e) with the
    * empirical marginal chance term. Cleared denominators:
    * kappa = (agree·n − (a₊b₊ + a₋b₋)) / (n² − (a₊b₊ + a₋b₋)), reported
    * in truncated micro-units (0 when the denominator is 0 — degenerate
    * marginals make kappa undefined).
    *
    * Scale (r12): the panel is a handful of FIXED columns, so all
    * |cols|·(|cols|−1)/2 pairs' 6 counters ride ONE map-combinable
    * aggregation over the votes frame — no melt, no item-id self-join
    * (the former shape scanned the votes plan twice through the join and
    * shuffled the melted rows by item; this shape shuffles |pairs|·6
    * longs total, whatever the item count). Pairs that never co-vote
    * aggregate n = 0 and are dropped — exactly the rows the former
    * inner join never produced.
    *
    * Output: (`lf_a`, `lf_b`, `n_items`, `n_agree`, `kappa_q`).
    */
  def cohenKappaPairs(votes: DataFrame, id: String,
      cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two annotators")
    // unordered pairs under the NAME order — the same (lf_a < lf_b) the
    // melted self-join produced
    val pairs = (for {
      a <- cols; b <- cols if a < b
    } yield (a, b)).sortBy(identity)
    def v(c: String) = col(c).cast("int")
    val counters = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      val both = v(a) =!= 0 && v(b) =!= 0
      Seq(
        sum(when(both, 1L).otherwise(0L)).as(s"n_$i"),
        sum(when(both && v(a) === v(b), 1L).otherwise(0L)).as(s"agree_$i"),
        sum(when(both && v(a) === 1, 1L).otherwise(0L)).as(s"ap_$i"),
        sum(when(both && v(a) === -1, 1L).otherwise(0L)).as(s"am_$i"),
        sum(when(both && v(b) === 1, 1L).otherwise(0L)).as(s"bp_$i"),
        sum(when(both && v(b) === -1, 1L).otherwise(0L)).as(s"bm_$i"))
    }
    val one = votes.agg(counters.head, counters.tail: _*)
    val rows = pairs.zipWithIndex.map { case ((a, b), i) =>
      struct(lit(a).as("lf_a"), lit(b).as("lf_b"),
        coalesce(col(s"n_$i"), lit(0L)).as("n"),
        coalesce(col(s"agree_$i"), lit(0L)).as("agree"),
        coalesce(col(s"ap_$i"), lit(0L)).as("ap"),
        coalesce(col(s"am_$i"), lit(0L)).as("am"),
        coalesce(col(s"bp_$i"), lit(0L)).as("bp"),
        coalesce(col(s"bm_$i"), lit(0L)).as("bm"))
    }
    one.select(explode(array(rows: _*)).as("p"))
      .select(col("p.*"))
      .filter(col("n") > 0) // pairs with no co-voting item: the old inner
                            // join emitted no row for them
      .select(col("lf_a"), col("lf_b"), col("n").as("n_items"),
        col("agree").as("n_agree"),
        // widened through DECIMAL(38,0): 10⁶·n² passes int64 at ~3M
        // co-voting items and BIGINT would wrap silently (the t_filter_auc
        // regime); div on decimals truncates toward zero and returns
        // BIGINT, so the output type and rounding law are unchanged
        expr("""CASE WHEN CAST(n AS DECIMAL(38,0)) * n
            - (CAST(ap AS DECIMAL(38,0)) * bp
               + CAST(am AS DECIMAL(38,0)) * bm) = 0 THEN CAST(0 AS BIGINT)
          ELSE (1000000 * (CAST(agree AS DECIMAL(38,0)) * n
              - (CAST(ap AS DECIMAL(38,0)) * bp
                 + CAST(am AS DECIMAL(38,0)) * bm)))
            div (CAST(n AS DECIMAL(38,0)) * n
              - (CAST(ap AS DECIMAL(38,0)) * bp
                 + CAST(am AS DECIMAL(38,0)) * bm)) END""").as("kappa_q"))
  }

  /** Fleiss' kappa over the full panel, restricted to items where ALL k
    * columns vote. With per-item category counts n_i± and category totals
    * T±: S1 = Σᵢ Σ_c n_ic(n_ic−1), and after clearing the common Nk
    * factor, kappa = (S1·Nk − (k−1)(T₊² + T₋²)) /
    * ((k−1)·((Nk)² − T₊² − T₋²)) — one map-combinable aggregation.
    *
    * Output: one row (`n_items`, `s1`, `t_pos`, `t_neg`, `kappa_q`).
    */
  def fleissKappa(votes: DataFrame, cols: Seq[String]): DataFrame = {
    val k = cols.size
    require(k >= 2, "need at least two annotators")
    val full = votes.filter(cols.map(c => col(c) =!= 0).reduce(_ && _))
    val np = cols.map(c => when(col(c) === 1, 1L).otherwise(0L))
      .reduce(_ + _)
    full.select(np.as("np"), (lit(k.toLong) - np).as("nm"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("np") * (col("np") - 1) + col("nm") * (col("nm") - 1))
          .as("s1"),
        sum(col("np")).as("t_pos"), sum(col("nm")).as("t_neg"))
      .select(col("n_items"), col("s1"), col("t_pos"), col("t_neg"),
        // same DECIMAL(38,0) widening as cohenKappaPairs — 10⁶·(Nk)²
        // wraps int64 at ~750k fully-voted items for k=4
        expr(s"""CASE WHEN ($k - 1)
            * ((CAST(n_items AS DECIMAL(38,0)) * $k) * (n_items * $k)
              - CAST(t_pos AS DECIMAL(38,0)) * t_pos
              - CAST(t_neg AS DECIMAL(38,0)) * t_neg) = 0
            THEN CAST(0 AS BIGINT)
          ELSE (1000000 * (CAST(s1 AS DECIMAL(38,0)) * n_items * $k
              - ($k - 1) * (CAST(t_pos AS DECIMAL(38,0)) * t_pos
                + CAST(t_neg AS DECIMAL(38,0)) * t_neg)))
            div (($k - 1)
              * ((CAST(n_items AS DECIMAL(38,0)) * $k) * (n_items * $k)
                - CAST(t_pos AS DECIMAL(38,0)) * t_pos
                - CAST(t_neg AS DECIMAL(38,0)) * t_neg)) END""")
          .as("kappa_q"))
  }
}
