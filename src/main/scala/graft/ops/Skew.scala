package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins — the classic SALTED JOIN.
  *
  * When a join key has a few dominant values (an `event_type` column with 5
  * values over 10¹¹ rows; a null-heavy foreign key; one celebrity user), a
  * shuffle join sends every row of a hot key to ONE reducer: the stage is
  * as slow as its hottest key, and at 100 TB that reducer spills or dies.
  * Salting rewrites the join key from `k` to `(k, salt)` — the fact side
  * gets a deterministic per-row salt in `[0, buckets)`, the dimension side
  * is replicated `buckets`× with every salt value — so each hot key spreads
  * over `buckets` reducers while the join result is provably unchanged
  * (every fact row still meets exactly one copy of its dimension row).
  *
  * When to reach for this instead of the built-ins:
  *  - AQE's skew-join split (`spark.sql.adaptive.skewJoin`) only splits
  *    SORT-MERGE join partitions, post-shuffle, and only when one side can
  *    stream the split; salting also covers shuffled-hash joins and feeds
  *    downstream per-key aggregations a pre-spread distribution.
  *  - `broadcast(dim)` is the right fix when the dim FITS in memory; salting
  *    is for the regime where the dim side is too big to broadcast but
  *    small enough that `buckets`× replication is cheaper than a hot
  *    reducer (replication cost = (buckets − 1) · |dim|, a map-side
  *    explode of narrow rows — no extra shuffle of the fact side).
  *
  * The salt is `xxhash64(whole row) mod buckets` — deterministic, so task
  * retries and speculative attempts produce identical salts (a `rand()`
  * salt silently breaks exactly-once join semantics under retry).
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Inner equi-join on `keys` with `left`'s hot keys spread over `buckets`
    * reducers; result is identical to `left.join(right, keys)`. `right` is
    * the replicated (dimension) side.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      buckets: Int): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val salted = left.withColumn(SaltCol,
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(buckets.toLong)))
    val replicated = right.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(buckets - 1L))))
    salted.join(replicated, keys :+ SaltCol).drop(SaltCol)
  }

  /** Skew-safe exact distinct count per key: pre-distinct on (key, value)
    * spreads a hot key's duplicate values across reducers BEFORE the
    * per-key count, so the final aggregation sees at most |distinct values|
    * rows per key instead of |rows|. Same result as
    * `groupBy(keys).agg(countDistinct(valueCol))`, which plans an Expand
    * whose post-shuffle groups inherit the raw key skew.
    */
  def distinctCountByKey(df: DataFrame, keys: Seq[String], valueCol: String,
      outCol: String): DataFrame =
    df.select((keys :+ valueCol).map(col): _*)
      .distinct()
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as(outCol))
}
