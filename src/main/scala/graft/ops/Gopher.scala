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

  /** The FULL Gopher repetition battery (Rae et al. 2021 §A1.1 — the
    * filters [[report]]'s top-word/bigram counts abbreviate), every value
    * an exact integer micro-fraction (q = ⌊10⁶·part/whole⌋ — no IEEE
    * division anywhere, so both engines agree bit-for-bit):
    *
    *  - `dup_line_q`: chars in pseudo-lines (fixed `lineTokens`-token
    *    chunks, the corpus fixture's line convention) whose VALUE occurs
    *    more than once in the doc, over total line chars;
    *  - `top{2,3,4}_q`: count(most frequent n-gram) × charlen(gram) over
    *    the doc's space-joined char total (ties: lexicographically
    *    smallest gram — the published screens threshold these, so the
    *    occurrence-count × length proxy is the stated law);
    *  - `dup{5..10}_q`: chars of TOKENS covered by at least one
    *    occurrence of a duplicated n-gram, over total token chars —
    *    position-union coverage, so overlapping occurrences never
    *    double-count (the paper's "taking care not to count characters
    *    in overlapping n-grams more than once").
    *
    * Scale shape: one tokenize pass staged, then the n-gram statistics
    * run STACKED — a single generator emits (n, gram) for every n at
    * once (n=2..4 for the top-gram counts, n=5..10 for the coverages),
    * so the dup filter, the position-union distinct, and the
    * token-length join each shuffle ONE frame instead of one per n.
    * Explodes carry ≤ Σn_tok rows across the stacked n values, coverage
    * carries ≤ n·dup-occurrences positions; everything is map-side
    * combinable groupBys, nothing quadratic. At 100 TB these are the
    * same per-doc screens as [[report]], run once at ingest.
    */
  def repetitionReport(docs: DataFrame, id: String = "doc_id",
      text: String = "text", lineTokens: Int = 7): DataFrame = {
    require(lineTokens > 0)
    val rawToks = when(length(trim(col(text))) === 0,
      array().cast("array<string>"))
      .otherwise(split(trim(col(text)), "\\s+"))
    val base = docs.select(col(id), rawToks.as("toks"))
      .localCheckpoint() // one tokenize pass feeds all ten statistics
    val totals = base.select(col(id),
      aggregate(transform(col("toks"), t => length(t).cast("long")),
        lit(0L), (a, x) => a + x).as("tok_chars"),
      length(concat_ws(" ", col("toks"))).cast("long").as("joined_chars"))
    // pseudo-lines: value-duplicate chars over total line chars
    val nLines = ((size(col("toks")) + (lineTokens - 1)) / lineTokens)
      .cast("int")
    val lineArr = when(nLines === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nLines - 1),
        i => concat_ws(" ", slice(col("toks"), i * lineTokens + 1,
          lit(lineTokens)))))
    val dupLine = base.select(col(id), explode(lineArr).as("__line"))
      .groupBy(col(id), col("__line")).agg(count(lit(1)).as("__c"))
      .groupBy(col(id)).agg(
        sum(when(col("__c") > 1, col("__c") * length(col("__line")))
          .otherwise(0L)).as("__dup"),
        sum(col("__c") * length(col("__line"))).as("__tot"))
      .select(col(id), expr(
        "CAST(CASE WHEN __tot > 0 THEN (1000000 * __dup) div __tot " +
          "ELSE 0 END AS BIGINT)").as("dup_line_q"))
    // the n-gram array for a COLUMN n (sequence(0, negative) would count
    // DOWN, so short docs must short-circuit to the empty array)
    def gramArrN(n: org.apache.spark.sql.Column) =
      when(size(col("toks")) < n, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, n))))
    // most-frequent n-gram for ALL n in [2,4], ONE stacked pass: explode
    // the n values, emit (n, gram) from a single generator, count once,
    // take the per-(doc, n) argmin of (-count, gram) — count desc, gram
    // asc tie-break, the same law the per-n passes stated — then fold the
    // three rows per doc into columns with conditional aggregates
    val topGrams = base
      .select(col(id), col("toks"),
        explode(array((2 to 4).map(lit(_)): _*)).as("__n"))
      .select(col(id), col("__n"), explode(gramArrN(col("__n"))).as("__g"))
      .groupBy(col(id), col("__n"), col("__g"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(id), col("__n"))
      .agg(min(struct((-col("__c")).as("nc"), col("__g").as("g")))
        .as("__top"))
    val topCharAggs = (2 to 4).map(n => max(when(col("__n") === n,
      (-col("__top.nc") * length(col("__top.g"))).cast("long")))
      .as(s"__topchars$n"))
    val tops = topGrams.groupBy(col(id))
      .agg(topCharAggs.head, topCharAggs.tail: _*)
    // duplicated-n-gram TOKEN coverage (position union) for ALL n in
    // [5,10], ONE stacked pass: a single posexplode emits (n, pos, gram);
    // the dup filter, the position-union distinct, and the token-length
    // join each run ONCE over the stacked frame instead of six times —
    // one shuffle set for the six coverages, the per-n law unchanged
    val pos = base
      .select(col(id), col("toks"),
        explode(array((5 to 10).map(lit(_)): _*)).as("__n"))
      .select(col(id), col("__n"),
        posexplode(gramArrN(col("__n"))).as(Seq("__i", "__g")))
    val dupGrams = pos.groupBy(col(id), col("__n"), col("__g"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") > 1)
      .select(col(id), col("__n"), col("__g"))
    val covered = pos.join(dupGrams, Seq(id, "__n", "__g"), "left_semi")
      .select(col(id), col("__n"),
        explode(sequence(col("__i"), col("__i") + col("__n") - 1))
          .as("__t"))
      .distinct()
    val tokLens = base.select(col(id),
      posexplode(col("toks")).as(Seq("__t", "__tok")))
      .select(col(id), col("__t"), length(col("__tok")).cast("long")
        .as("__len"))
    val coverAggs = (5 to 10).map(n =>
      sum(when(col("__n") === n, col("__len")).otherwise(0L))
        .as(s"__cov$n"))
    val covers = covered.join(tokLens, Seq(id, "__t"))
      .groupBy(col(id)).agg(coverAggs.head, coverAggs.tail: _*)
    val withTops = totals.join(dupLine, Seq(id), "left")
      .join(tops, Seq(id), "left")
    val withCovers = withTops.join(covers, Seq(id), "left")
    val topCols = (2 to 4).map(n => expr(
      s"CAST(CASE WHEN joined_chars > 0 THEN " +
        s"(1000000 * coalesce(__topchars$n, 0)) div joined_chars " +
        s"ELSE 0 END AS BIGINT)").as(s"top${n}_q"))
    val covCols = (5 to 10).map(n => expr(
      s"CAST(CASE WHEN tok_chars > 0 THEN " +
        s"(1000000 * coalesce(__cov$n, 0)) div tok_chars " +
        s"ELSE 0 END AS BIGINT)").as(s"dup${n}_q"))
    withCovers.select(col(id) +:
      coalesce(col("dup_line_q"), lit(0L)).as("dup_line_q") +:
      (topCols ++ covCols): _*)
  }
}
