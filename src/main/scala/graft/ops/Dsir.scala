package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (Xie et al., NeurIPS 2023,
  * arXiv:2302.03169): pick pretraining documents whose hashed n-gram bag
  * looks more like a small TARGET domain than like the raw pool. Each
  * document scores log w(x) = Σ_grams [log p̂(bucket) − log q̂(bucket)]
  * where p̂/q̂ are Laplace-smoothed hashed-bigram distributions of the
  * target and raw corpora; the highest-weight documents are selected.
  *
  * Engine-exactness: the hashed feature space is the first 4 md5 hex
  * chars of each bigram (65536 cells — the cross-engine uniform-hash
  * idiom of [[Sampling]]), and each bucket's log-ratio quantizes to
  * integer micro-nats ONCE (the KL/PMI idiom), so per-doc weights are
  * integer sums — bit-identical on any partitioning and any engine.
  *
  * Scale posture (100 TB raw pool): the only corpus-sized frame is the
  * (doc_id, bucket) gram stream, staged once and reused by all three
  * consumers; both count tables and the log-ratio table are bounded by
  * 65536 rows (broadcast to the scoring join), the per-doc sum is a
  * map-side-combinable long aggregation, and selection is top-k by
  * (weight, id) — TakeOrderedAndProject, never a global sort.
  */
object Dsir {

  val HashBuckets = 65536 // 16^4 — 4 md5 hex chars

  /** 4-hex-char hash bucket of a gram string — identical in DuckDB as
    * `substr(md5(g), 1, 4)`.
    */
  def bucketOf(gram: Column): Column =
    substring(md5(gram.cast("binary")), 1, 4)

  /** Per-document importance weight in integer micro-nats:
    * (`id`, `weight_unats`), one row per input document (gramless
    * documents weigh 0). `isTarget` marks the rows whose gram
    * distribution defines p̂; all rows define q̂ and all rows are scored.
    */
  def importanceWeights(docs: DataFrame, id: String, text: String,
      isTarget: Column): DataFrame = {
    val b = lit(HashBuckets.toDouble)
    // the one corpus-sized stage: (id, target-flag, 4-char bucket) per
    // bigram occurrence — reused by the q counts, p counts, and scoring
    val grams = docs.select(col(id).as("__id"),
        isTarget.cast("int").as("__t"),
        explode(org.apache.spark.sql.graftx.VectorExpressions
          .shingleArrAll(col(text), 2)).as("__g"))
      .select(col("__id"), col("__t"), bucketOf(col("__g")).as("__b"))
      .localCheckpoint()
    val q = grams.groupBy(col("__b")).agg(count(lit(1)).as("cq"))
    val p = grams.filter(col("__t") === 1)
      .groupBy(col("__b")).agg(count(lit(1)).as("cp"))
    val tot = q.agg(sum(col("cq")).as("nq"))
      .crossJoin(p.agg(coalesce(sum(col("cp")), lit(0L)).as("np"))) // 1-row
    // per-bucket quantized log-ratio — ≤ 65536 rows, broadcast below.
    // Buckets the target never hits smooth to (0+1)/(np+B), never -∞.
    val ratio = q.join(p, Seq("__b"), "left")
      .withColumn("cp", coalesce(col("cp"), lit(0L)))
      .crossJoin(broadcast(tot))
      .select(col("__b"),
        round(log(
          ((col("cp").cast("double") + lit(1.0)) / (col("np").cast("double") + b)) /
          ((col("cq").cast("double") + lit(1.0)) / (col("nq").cast("double") + b)))
          * lit(1e6)).cast("long").as("unats"))
    val wts = grams.join(broadcast(ratio), Seq("__b"))
      .groupBy(col("__id"))
      .agg(sum(col("unats")).as("weight_unats"))
    docs.select(col(id))
      .join(wts.withColumnRenamed("__id", id), Seq(id), "left")
      .select(col(id), coalesce(col("weight_unats"), lit(0L)).as("weight_unats"))
  }

  /** The `k` highest-weight documents (ties to the smaller id) — the
    * DSIR selection step as a top-k, not a global sort.
    */
  def selectTopK(docs: DataFrame, id: String, text: String,
      isTarget: Column, k: Int): DataFrame =
    importanceWeights(docs, id, text, isTarget)
      .orderBy(col("weight_unats").desc, col(id))
      .limit(k)
}
