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

  /** [[packSequential]] without the per-shard single-task window — the
    * production layout for the real crawl shape, where one giant source
    * (CommonCrawl) dwarfs everything and a `partitionBy(source)` window
    * funnels it through one task. Row-for-row EQUAL to `packSequential`
    * (spec- and oracle-proven) by construction:
    *
    *  1. each shard group is RANGE-SPLIT on `orderCol` value into
    *     `numShards` contiguous sub-shards (per-group min/max bounds, one
    *     aggregate + a broadcast join — value-range splitting is exact and
    *     deterministic; balance only affects speed, never the answer);
    *  2. tokens cumulate inside each (shard, sub-shard) — `numShards`
    *     parallel bounded windows per group instead of one unbounded one;
    *  3. each sub-shard's global offset is the prefix sum of the
    *     PER-SUB-SHARD token totals — a window over the aggregate frame
    *     (≤ `numShards` rows per group, never document-sized), broadcast
    *     back.
    *
    * Because sub-shards are contiguous in `orderCol`, offset + local
    * cumsum equals the group-global cumsum, so every `pack_start` /
    * `bin_first` / `bin_last` lands exactly where the window form puts it.
    *
    * Contract (same as the window form's determinism): `orderCol` is
    * numeric and unique within a `shardCol` group; `(max - min + 1) *
    * numShards` must fit a long (any real id space does).
    */
  def packSharded(df: DataFrame, shardCol: String, orderCol: String,
      tokCol: String, budget: Int, numShards: Int = 32): DataFrame = {
    require(budget > 0 && numShards > 0)
    val bounds = df.groupBy(col(shardCol))
      .agg(min(col(orderCol)).cast("long").as("__lo"),
        (max(col(orderCol)).cast("long") - min(col(orderCol)).cast("long") +
          1L).as("__span"))
    val sharded = df
      .join(broadcast(bounds), Seq(shardCol))
      .withColumn("__shard",
        expr(s"((cast(`$orderCol` as bigint) - `__lo`) * $numShards) " +
          s"div `__span`").cast("int"))
      .drop("__lo", "__span")
    val local = Window.partitionBy(col(shardCol), col("__shard"))
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-sub-shard token totals → exclusive prefix sums; ≤ numShards rows
    // per group, so this window is over the AGGREGATE, never the corpus
    val offsets = sharded.groupBy(col(shardCol), col("__shard"))
      .agg(sum(col(tokCol)).cast("long").as("__tot"))
      .withColumn("__off",
        coalesce(sum(col("__tot")).over(
          Window.partitionBy(col(shardCol)).orderBy(col("__shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__tot")
    sharded
      .withColumn("__lcum", sum(col(tokCol)).over(local))
      .join(broadcast(offsets), Seq(shardCol, "__shard"))
      .withColumn("__cum", col("__off") + col("__lcum"))
      .withColumn("pack_start", (col("__cum") - col(tokCol)).cast("long"))
      .withColumn("bin_first", expr(s"`pack_start` div $budget"))
      .withColumn("bin_last",
        greatest(expr(s"(`__cum` - 1) div $budget"), col("bin_first")))
      .drop("__cum", "__lcum", "__off", "__shard")
  }
}
