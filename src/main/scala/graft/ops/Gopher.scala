package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.defaultStopwords

/** Gopher-style document quality filters (Rae et al. 2021 §A1.1, adapted
  * to this corpus): every signal is an exact integer — word count, word
  * chars, alpha-word and stopword hits, and the repetition signals
  * (most-frequent word / most-frequent bigram counts). The pass/fail
  * gate uses CROSS-MULTIPLIED integer comparisons instead of float
  * ratios, so both engines decide identically with no epsilon. Scale
  * shape: tokenization is staged once (one materialization), then two
  * narrow (doc_id, term) explode→count→max aggregations with map-side
  * partials — no wide rows past the explode.
  *
  * Factored out of the `t_gopher_filters` gate so the composed pretrain
  * pipeline ([[graft.jobs.PretrainCorpus]]) reuses the identical law.
  */
object Gopher {

  /** Per-document quality statistics + the pass/fail decision:
    * (id, n_words, word_chars, n_alpha_words, n_stop_words,
    * top_word_count, top_bigram_count, quality_pass).
    */
  def report(docs: DataFrame, id: String = "doc_id",
      text: String = "text"): DataFrame = {
    val rawToks = when(length(trim(col(text))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(text)), "\\s+"))
    // stage: tokenize ONCE (CollapseProject would otherwise re-inline the
    // split into every element_at/size reference downstream)
    val base = docs.select(col(id), rawToks.as("toks"))
      .select(col(id), col("toks"),
        size(col("toks")).cast("long").as("n_words"),
        aggregate(transform(col("toks"), t => length(t).cast("long")),
          lit(0L), (a, x) => a + x).as("word_chars"),
        size(filter(col("toks"), t => t.rlike("[a-z]")))
          .cast("long").as("n_alpha_words"),
        size(filter(col("toks"), t => t.isin(defaultStopwords.map(lit(_)): _*)))
          .cast("long").as("n_stop_words"))
      .localCheckpoint()
    val topWord = base.select(col(id), explode(col("toks")).as("w"))
      .groupBy(col(id), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col(id)).agg(max(col("c")).as("top_word_count"))
    val bigramArr = when(size(col("toks")) >= 2,
      transform(sequence(lit(1), size(col("toks")) - 1),
        i => concat_ws(" ", element_at(col("toks"), i),
          element_at(col("toks"), i + 1))))
      .otherwise(array().cast("array<string>"))
    val topBigram = base.select(col(id), explode(bigramArr).as("b"))
      .groupBy(col(id), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col(id)).agg(max(col("c")).as("top_bigram_count"))
    base.join(topWord, Seq(id), "left")
      .join(topBigram, Seq(id), "left")
      .select(col(id), col("n_words"), col("word_chars"),
        col("n_alpha_words"), col("n_stop_words"),
        coalesce(col("top_word_count"), lit(0L)).as("top_word_count"),
        coalesce(col("top_bigram_count"), lit(0L)).as("top_bigram_count"))
      .withColumn("quality_pass",
        (col("n_words") >= 20 && col("n_words") <= 100000 &&
          col("word_chars") >= col("n_words") * 2 &&
          col("word_chars") <= col("n_words") * 12 &&
          col("n_alpha_words") * 10 >= col("n_words") * 8 &&
          col("n_stop_words") >= 1 &&
          col("top_bigram_count") * 10 <= col("n_words")).cast("int"))
  }
}
