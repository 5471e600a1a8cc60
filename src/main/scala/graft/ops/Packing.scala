package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining: documents are concatenated in a
  * deterministic order and chunked into fixed token-budget bins (the
  * GPT-style concat-and-chunk layout — no padding waste, documents may span
  * a bin boundary and the trainer masks across it).
  *
  * Packing is per SHARD (`shardCol`), not global: a single global ordering
  * would funnel the whole corpus through one sort partition. Real pipelines
  * pack within shards (a file, a source, a date partition) — each shard's
  * layout is independent, so the window sort parallelizes across shards and
  * a 100 TB corpus packs as thousands of independent per-shard sorts. All
  * arithmetic is integer (running sums and floor division), so two engines
  * agree bit-for-bit.
  */
object Packing {

  /** Assign each document its bin span under sequential concat-and-chunk
    * packing: `pack_start` = tokens preceding it in its shard,
    * `bin_first`/`bin_last` = the budget-sized bins its tokens land in.
    * A document spans `bin_last - bin_first` boundaries.
    */
  def packSequential(df: DataFrame, shardCol: String, orderCol: String,
      tokCol: String, budget: Int): DataFrame = {
    require(budget > 0)
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokCol)).over(w))
      .withColumn("pack_start", (col("__cum") - col(tokCol)).cast("long"))
      .withColumn("bin_first", expr(s"`pack_start` div $budget"))
      // empty docs (tokCol = 0) occupy no bin: clamp bin_last to bin_first
      .withColumn("bin_last",
        greatest(expr(s"(`__cum` - 1) div $budget"), col("bin_first")))
      .drop("__cum")
  }
}
