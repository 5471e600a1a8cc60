package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded per-key top-k reduction over a scored pair stream.
  *
  * Every exhaustive similarity-scoring path (brute-force cosine, ADC over
  * PQ codes, int8 approximate scan) ends with "the k best rows per query".
  * Expressed as `row_number() OVER (PARTITION BY query)` that final step
  * shuffles EVERY scored corpus row to a single reducer per query — the one
  * scale-killer in an otherwise streaming plan (10⁹ corpus rows × each
  * query land on one task). This helper instead aggregates with the k-heap
  * [[org.apache.spark.sql.graftx.BoundedTopKAgg]]: partial heaps fold
  * map-side, so the exchange carries at most partitions·k (double, long)
  * pairs per key and the reducer merges heaps, never raw rows.
  *
  * The result is bit-identical to the window formulation — (score, id) is a
  * total order, so the k-best set is unique regardless of partitioning or
  * fold order — which is what lets the oracle gates keep comparing against
  * row_number-based recomputes exactly.
  */
object TopK {

  /** `scored` reduced to the k best rows per `key`, ranked 1..k: output
    * columns (`key`, `id`, `score`, `rank`), ordered per key by score
    * (descending when `descending`, else ascending), ties to the smaller
    * id — exactly `row_number() OVER (PARTITION BY key ORDER BY score
    * [DESC], id)` ≤ k, with a bounded exchange instead of a full one.
    */
  def perKey(scored: DataFrame, key: String, score: String, id: String,
      k: Int, descending: Boolean): DataFrame =
    scored.groupBy(col(key))
      .agg(org.apache.spark.sql.graftx.TopKExpressions
        .boundedTopK(col(score).cast("double"), col(id).cast("long"), k,
          descending)
        .as("__top"))
      .select(col(key), posexplode(col("__top")).as(Seq("__r", "__p")))
      .select(col(key), col("__p.id").as(id), col("__p.score").as(score),
        (col("__r") + 1).cast("int").as("rank"))
}
