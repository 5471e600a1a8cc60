package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window passage chunking: split each document into overlapping
  * token windows (the standard unit for retrieval indexing and for
  * fixed-context pretraining slices — distinct from content-defined
  * chunking, which cuts at rolling-hash boundaries, and from sequence
  * packing, which concatenates across documents).
  *
  * Contract (mirrored term-by-term by the DuckDB oracle): tokens are the
  * whitespace split of `trim(text)` (empty text → no tokens), window
  * starts are 0, stride, 2·stride, … strictly below the token count, and
  * chunk i is tokens[start, start+window) clamped at the end — so the tail
  * yields a short final window rather than dropping tokens, and every
  * token is covered by at least one chunk when stride ≤ window.
  *
  * Scale posture: a ZERO-SHUFFLE projection — split once, explode the
  * start sequence, slice per start; all codegen'd built-ins, amplification
  * = ceil(n_tokens/stride) rows per document carrying only the sliced
  * passage. Chunk-level outputs (md5, token counts) are narrow; the
  * passage text itself should be dropped or hashed before any exchange.
  */
object Chunking {

  /** One row per (document, window): `chunk_index`, `start_pos` (token
    * offset), `n_chunk_tokens`, and the `passage` text (space-rejoined).
    */
  def passageWindows(df: DataFrame, id: String, text: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val toks = when(length(trim(col(text))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col(text)), "\\s+"))
    df.select(col(id), toks.as("__toks"), size(toks).as("__n"))
      .select(col(id), col("__toks"),
        explode(sequence(lit(0), greatest(col("__n") - 1, lit(0)),
          lit(stride))).as("__s"))
      .filter(col("__s") < size(col("__toks")))
      .select(col(id),
        expr(s"CAST(__s div $stride AS BIGINT)").as("chunk_index"),
        col("__s").cast("long").as("start_pos"),
        slice(col("__toks"), col("__s") + 1, lit(window)).as("__chunk"))
      .select(col(id), col("chunk_index"), col("start_pos"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        array_join(col("__chunk"), " ").as("passage"))
  }
}
