package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Stupid Backoff bigram language-model scoring (Brants, Popat, Xu, Och,
  * Dean, "Large Language Models in Machine Translation", EMNLP 2007) —
  * the backoff scheme that paper introduces specifically for DISTRIBUTED
  * count-based LMs: no discounting or normalization pass (which would need
  * global passes per order), just relative frequencies with a fixed 0.4
  * backoff factor:
  *
  *   S(w₂|w₁) = c(w₁w₂)/c(w₁)   if the bigram was seen
  *            = 0.4 · c(w₂)/N   else if w₂ was seen
  *            = (0.4 · 0.4)/N   else (OOV floor: one more backoff step
  *                               onto a uniform-mass stand-in)
  *
  * Where [[CharLm]] and [[NaiveBayes]] fold their BOUNDED models into the
  * plan as literals, this model is CORPUS-SIZED (the bigram table grows
  * with the training data), so it stays a distributed table end to end:
  * scoring is two narrow hash joins (bigram key, then unigram key) plus a
  * per-doc map-side-combinable sum — the shape the Brants paper runs at
  * trillions of tokens. Hot function-word keys skew the probe side only;
  * AQE's skew-join split handles them without a plan change.
  *
  * Exactness contract: each scored bigram quantizes to integer micro-nats
  * via `round(ln(S) · 10⁶)` with the ln applied to an IEEE division chain
  * spelled identically in the oracle, so per-doc scores are integer sums.
  */
object NgramLm {

  /** Adjacent-pair structs of a token array: zip of the drop-last and
    * drop-first slices (slice lengths clamp to 0 on short arrays, so docs
    * with < 2 tokens yield an empty pair array).
    */
  private def bigramStructs(toks: org.apache.spark.sql.Column) =
    arrays_zip(
      slice(toks, lit(1), greatest(size(toks) - 1, lit(0))).as("w1"),
      slice(toks, lit(2), greatest(size(toks) - 1, lit(0))).as("w2"))

  /** Count tables from the training slice: bigrams (w1, w2, c12),
    * unigrams (tok, c), and the total token count N.
    */
  def counts(train: DataFrame, text: String): (DataFrame, DataFrame, Long) = {
    val toks = train.select(TextFunctions.tokens(col(text)).as("__toks"))
    val uni = toks.select(explode(col("__toks")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val bi = toks
      .select(explode(bigramStructs(col("__toks"))).as("__p"))
      .select(col("__p.w1"), col("__p.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val n = Option(toks.agg(sum(size(col("__toks")))).head().get(0))
      .fold(0L)(_.asInstanceOf[Long])
    require(n > 0,
      "Stupid Backoff needs a non-empty training slice (0 tokens seen)")
    (bi, uni, n)
  }

  /** Per-document INTERPOLATED KNESER-NEY bigram score (Kneser & Ney,
    * ICASSP 1995; Chen & Goodman, CSL 1999 — the standard n-gram
    * smoothing Stupid Backoff trades away for distributability):
    *
    *   P(w₂|w₁) = max(c(w₁w₂) − D, 0)/c(w₁)
    *              + D·N₁₊(w₁·)/c(w₁) · P_cont(w₂)     c(w₁) > 0
    *            = P_cont(w₂)                            unseen context
    *   P_cont(w₂) = N₁₊(·w₂)/T,  floored at 1/T for never-continuing w₂
    *
    * with fixed discount D, N₁₊(w₁·)/N₁₊(·w₂) the distinct-continuation /
    * distinct-history type counts, and T the total distinct bigram types.
    * For a seen context whose continuations are all in-vocabulary the
    * probabilities sum EXACTLY to 1 (Σ np(w₂) = T telescopes the
    * interpolation mass) — the normalization Stupid Backoff lacks.
    *
    * The punchline for the distributed setting: every model statistic
    * (context totals, both type counts, T) derives from the ONE bigram
    * count table by map-side-combinable aggregations — no extra corpus
    * pass vs Stupid Backoff — and scoring stays three narrow hash joins
    * against corpus-sized tables plus a per-doc sum. Same micro-nat
    * integer quantization contract as [[score]].
    *
    * Output: (`id`, `n_bi`, `sum_q`); < 2-token documents score (0, 0).
    */
  def scoreKneserNey(docs: DataFrame, id: String, text: String,
      biIn: DataFrame, discount: Double = 0.75): DataFrame = {
    // the bigram table feeds FOUR consumers (ctx, prec, the T count, the
    // scoring join) — checkpoint once so the training corpus is not
    // re-tokenized and re-shuffled per consumer
    val bi = biIn.localCheckpoint()
    val ctx = bi.groupBy(col("w1"))
      .agg(sum(col("c12")).as("__c1"), count(lit(1)).as("__n1p"))
    val prec = bi.groupBy(col("w2")).agg(count(lit(1)).as("__np"))
    val t = bi.count() // one model scalar, like counts()'s N
    require(t > 0,
      "Kneser-Ney needs a non-empty bigram table (0 bigram types seen)")
    val bg = docs
      .select(col(id), TextFunctions.tokens(col(text)).as("__toks"))
      .select(col(id), explode(bigramStructs(col("__toks"))).as("__p"))
      .select(col(id), col("__p.w1"), col("__p.w2"))
    val scored = bg
      .join(bi, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(prec, Seq("w2"), "left")
      .withColumn("__pc",
        coalesce(col("__np"), lit(1L)).cast("double") / lit(t.toDouble))
      .withColumn("__s",
        when(col("__c1").isNotNull,
          greatest(coalesce(col("c12"), lit(0L)).cast("double")
              - lit(discount), lit(0.0)) / col("__c1").cast("double")
            + lit(discount) * col("__n1p").cast("double")
              / col("__c1").cast("double") * col("__pc"))
        .otherwise(col("__pc")))
      .withColumn("__q", round(log(col("__s")) * lit(1e6)).cast("long"))
    val per = scored.groupBy(col(id))
      .agg(count(lit(1)).as("n_bi"), sum(col("__q")).as("sum_q"))
    docs.select(col(id)).join(per, Seq(id), "left")
      .select(col(id), coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("sum_q"), lit(0L)).as("sum_q"))
  }

  /** Per-document Stupid Backoff score: (doc_id, n_bi, sum_q) with sum_q
    * the integer micro-nat sum over the doc's bigrams. Documents with
    * fewer than two tokens score (0, 0).
    */
  def score(docs: DataFrame, id: String, text: String,
      bi: DataFrame, uni: DataFrame, n: Long): DataFrame = {
    val bg = docs
      .select(col(id), TextFunctions.tokens(col(text)).as("__toks"))
      .select(col(id), explode(bigramStructs(col("__toks"))).as("__p"))
      .select(col(id), col("__p.w1"), col("__p.w2"))
    val scored = bg
      .join(bi, Seq("w1", "w2"), "left")
      .join(uni.select(col("tok").as("w1"), col("c").as("__c1")),
        Seq("w1"), "left")
      .join(uni.select(col("tok").as("w2"), col("c").as("__c2")),
        Seq("w2"), "left")
      .withColumn("__s",
        when(col("c12").isNotNull,
          col("c12").cast("double") / col("__c1").cast("double"))
        .when(col("__c2").isNotNull,
          lit(0.4) * col("__c2").cast("double") / lit(n.toDouble))
        .otherwise(lit(0.4) * lit(0.4) / lit(n.toDouble)))
      .withColumn("__q", round(log(col("__s")) * lit(1e6)).cast("long"))
    val per = scored.groupBy(col(id))
      .agg(count(lit(1)).as("n_bi"), sum(col("__q")).as("sum_q"))
    docs.select(col(id)).join(per, Seq(id), "left")
      .select(col(id), coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("sum_q"), lit(0L)).as("sum_q"))
  }
}
