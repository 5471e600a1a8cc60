package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level line deduplication (the C4 cleaning rule: a line that occurs
  * more than once across the whole corpus is kept only at its first
  * occurrence). Web corpora are full of repeated boilerplate — navigation,
  * cookie banners, license footers — and line dedup removes it without
  * dropping the documents that carry it.
  *
  * Scale shape: one explode (doc → lines), ONE shuffle keyed on the line
  * content to pick the global first occurrence (a window over the line key —
  * min-by, no all-pairs anything), and one shuffle back on the doc key to
  * reassemble. Both exchanges carry (line-or-doc key, idx) plus each line
  * exactly once; nothing is quadratic in corpus size and hot lines (the
  * boilerplate that motivates the operator) cost one reducer each O(df)
  * row-number scan, not O(df²).
  */
object LineDedup {

  /** Chunk a whitespace token stream into fixed-width pseudo-lines of
    * `lineTokens` tokens each (the corpus fixture is single-line; real
    * corpora would `split(text, "\n")` instead — same downstream shape).
    * Empty/blank text → empty array.
    */
  def toLines(text: Column, lineTokens: Int): Column = {
    require(lineTokens > 0)
    val toks = when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))
    val nLines = ((size(toks) + lineTokens - 1) / lineTokens).cast("int")
    when(nLines === 0, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), nLines - 1),
        i => concat_ws(" ", slice(toks, i * lineTokens + 1, lit(lineTokens)))))
  }

  /** Number of pseudo-lines [[toLines]] yields — ceil(tokens / lineTokens),
    * computed without materializing the line array.
    */
  def lineCount(text: Column, lineTokens: Int): Column = {
    require(lineTokens > 0)
    val nTok = when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))
    ((nTok + lineTokens - 1) / lineTokens).cast("int")
  }

  /** Keep only the globally-first occurrence of each line: the minimum
    * (docCol, idxCol) — a total order, so the survivor set is deterministic
    * and engine-independent. Input is one row per (doc, idx, line).
    */
  def keepFirstOccurrence(lines: DataFrame, docCol: String, idxCol: String,
      lineCol: String): DataFrame = {
    val w = Window.partitionBy(col(lineCol)).orderBy(col(docCol), col(idxCol))
    lines.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
