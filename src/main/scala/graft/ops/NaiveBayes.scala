package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multinomial Naive Bayes reference-corpus classifier — the CCNet /
  * fastText curation recipe: train a linear bag-of-words classifier that
  * separates a small curated "reference" slice (Wikipedia in the published
  * pipelines) from the general crawl, then keep crawl documents the
  * classifier scores reference-like. NB is the count-based member of that
  * family, which makes it exactly distributable: training is counting.
  *
  * Division of labor at 100 TB (the charLM/BPE/k-means pattern):
  *  - TRAINING is one corpus pass: explode → `groupBy(token)` with map-side
  *    partial aggregation. The vocabulary is then CAPPED to the top-V tokens
  *    by global count (deterministic `(count desc, token asc)` order — the
  *    fastText vocabulary-pruning step), so everything collected to the
  *    driver is ≤ V + 2·V + 2 rows no matter the corpus size.
  *  - SCORING — the pass that touches all 100 TB — is a ZERO-SHUFFLE
  *    projection: the ≤V-entry per-class log-prob tables fold back into the
  *    plan as literal maps, and each document's class scores are a
  *    higher-order `aggregate` over its token array. No explode, no join,
  *    no shuffle; text never leaves its input partition.
  *
  * Exactness contract with the oracle (the t_charlm_score trick):
  * log-probabilities are quantized to integer MICRO-NATS at train time
  * (`round(ln(p) · 10⁶)`), so a document's class score is an integer SUM —
  * summation-order-free and engine-exact. Smoothing is add-one over
  * `vocab ∪ {OOV}`: an in-vocab token absent from a class scores
  * `ln(1/(tot_c+V+1))`; a token outside the capped vocabulary scores the
  * class's single pooled OOV estimate `ln((oov_c+1)/(tot_c+V+1))`.
  */
object NaiveBayes {

  /** Trained model: per-class token→micro-nat-log-prob tables over the
    * capped vocabulary, per-class OOV log-probs, and class log-priors.
    * Total size ≤ 2·(V+2) entries regardless of corpus size.
    */
  final case class Model(
      posTable: Map[String, Long], negTable: Map[String, Long],
      posOov: Long, negOov: Long,
      posPrior: Long, negPrior: Long)

  private def q(num: Long, den: Long): Long =
    // HALF_UP away from zero — the repo-wide (and DuckDB round()) tie
    // convention; Math.round is half-up toward +∞, which diverges on
    // negative .5 boundaries
    java.math.BigDecimal.valueOf(Math.log(num.toDouble / den.toDouble) * 1e6)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  /** One corpus pass + bounded driver work. `label` must be a boolean
    * Column (true = reference class); `text` the raw text column name.
    */
  def train(corpus: DataFrame, text: String, label: Column,
      vocabSize: Int): Model = {
    val toks = corpus
      .select(label.as("pos"), explode(TextFunctions.tokens(col(text))).as("tok"))
    // per-(class, token) counts: |vocab|·2 rows distributed, never collected
    val counts = toks.groupBy(col("tok"))
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("nn"))
      .localCheckpoint() // staged: vocab cut + totals read it, not the corpus
    // capped vocabulary: top-V by global count, deterministic tie-break
    val vocab = counts
      .orderBy((col("np") + col("nn")).desc, col("tok"))
      .limit(vocabSize)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val inVocab = vocab.map(_._1).toSet
    // class token totals (in-vocab + pooled OOV) — 1 row
    val t = counts.agg(sum(col("np")).as("tp"), sum(col("nn")).as("tn")).head()
    val (totP, totN) = (Option(t.get(0)).fold(0L)(_ => t.getLong(0)),
      Option(t.get(1)).fold(0L)(_ => t.getLong(1)))
    val ivP = vocab.map(_._2).sum; val ivN = vocab.map(_._3).sum
    val (oovP, oovN) = (totP - ivP, totN - ivN)
    // doc-count priors — 1 row
    val d = corpus.agg(sum(when(label, 1L).otherwise(0L)).as("dp"),
      count(lit(1)).as("n")).head()
    val n = d.getLong(1)
    require(n > 0, "Naive Bayes needs a non-empty training corpus")
    val dp = Option(d.get(0)).fold(0L)(_.asInstanceOf[Long])
    val v = inVocab.size // may be < vocabSize on tiny corpora
    val denP = totP + v + 1; val denN = totN + v + 1
    Model(
      posTable = vocab.map { case (tk, np, _) => tk -> q(np + 1, denP) }.toMap,
      negTable = vocab.map { case (tk, _, nn) => tk -> q(nn + 1, denN) }.toMap,
      posOov = q(oovP + 1, denP), negOov = q(oovN + 1, denN),
      posPrior = q(dp + 1, n + 2), negPrior = q(n - dp + 1, n + 2))
  }

  /** Zero-shuffle scoring projection: for each row adds integer columns
    * `n_toks`, `sum_ref_q`, `sum_other_q`, `margin_q` (priors folded in)
    * and `pred` (1 = reference class). The model rides the plan as two
    * literal maps (≤V entries each) inside codegen'd higher-order
    * functions — no explode, no join, no shuffle.
    */
  def score(docs: DataFrame, text: String, model: Model): DataFrame = {
    // ONE higher-order aggregate folds (count, ref-sum, other-sum) in a
    // single struct accumulator, so the regex normalize/tokenize chain
    // evaluates ONCE per row — three separate columns would re-tokenize
    // per column (ArrayAggregate is CodegenFallback, so codegen CSE can't
    // share the subtree across expressions)
    val mPos = typedlit(model.posTable)
    val mNeg = typedlit(model.negTable)
    val acc0 = struct(lit(0L).as("n"), lit(0L).as("r"), lit(0L).as("o"))
    val folded = aggregate(TextFunctions.tokens(col(text)), acc0,
      (acc, tk) => struct(
        (acc.getField("n") + 1L).as("n"),
        (acc.getField("r") +
          coalesce(element_at(mPos, tk), lit(model.posOov))).as("r"),
        (acc.getField("o") +
          coalesce(element_at(mNeg, tk), lit(model.negOov))).as("o")))
    docs
      .withColumn("__s", folded)
      .withColumn("n_toks", col("__s.n"))
      .withColumn("sum_ref_q", col("__s.r"))
      .withColumn("sum_other_q", col("__s.o"))
      .withColumn("margin_q",
        col("sum_ref_q") + lit(model.posPrior)
          - col("sum_other_q") - lit(model.negPrior))
      .withColumn("pred", (col("margin_q") >= 0).cast("long"))
      .drop("__s")
  }
}
