package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 page-cleaning rules (Raffel et al. 2020, §2.2 — the filters that
  * produced the C4 corpus from Common Crawl), applied per document over its
  * newline-separated lines:
  *
  *   - a LINE is retained only if it ends in a terminal punctuation mark
  *     (`.` `!` `?` `"`), has at least `minWordsPerLine` words, and does not
  *     mention "javascript" (the boilerplate tell);
  *   - the PAGE is dropped if it contains "lorem ipsum" or a curly brace
  *     (template/code tells), or retains fewer than `minKeptLines` lines.
  *
  * Everything is a per-row array-HOF projection — it fuses into the scan,
  * shuffles nothing at any corpus size, and both sides of every rule are
  * plain string predicates with an exact DuckDB mirror (the `t_c4_rules`
  * oracle), so keep decisions are engine-independent.
  */
object C4Rules {

  /** Per-document report: line counts before/after the line rules, the
    * page-level flags, the final keep decision, and an md5 fingerprint of
    * the retained text (gate sensitivity to every kept byte). `text` is
    * newline-separated; blank text reports 0 lines.
    */
  def lineFilterReport(df: DataFrame, id: String, text: String,
      minWordsPerLine: Int = 5, minKeptLines: Int = 3): DataFrame = {
    val lines = when(length(col(text)) === 0, array().cast("array<string>"))
      .otherwise(split(col(text), "\n"))
    val keepLine = (l: Column) =>
      l.rlike("[.!?\"]\\s*$") &&
        size(split(trim(l), "\\s+")) >= minWordsPerLine &&
        !lower(l).contains("javascript")
    df.select(col(id), lines.as("__lines"),
        lower(col(text)).contains("lorem ipsum").cast("int").as("has_lorem"),
        col(text).contains("{").cast("int").as("has_brace"))
      .select(col(id), size(col("__lines")).as("n_lines"),
        filter(col("__lines"), keepLine).as("__kept"),
        col("has_lorem"), col("has_brace"))
      .select(col(id), col("n_lines"),
        size(col("__kept")).as("n_kept"),
        col("has_lorem"), col("has_brace"),
        (col("has_lorem") === 0 && col("has_brace") === 0 &&
          size(col("__kept")) >= minKeptLines).cast("int").as("page_keep"),
        md5(concat_ws("\n", col("__kept"))).as("kept_fp"))
  }
}
