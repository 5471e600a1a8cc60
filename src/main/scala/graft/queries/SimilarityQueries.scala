package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Similarity-search queries over the `embeddings` table (64-dim float
  * vectors). Brute-force variants are oracle-checked bit-exactly: both
  * engines cast each float to double and left-fold the products in index
  * order (see VectorFunctions). LSH / IVF variants are approximate scale
  * paths — no SQL oracle; ScalaTest measures their recall against the exact
  * baseline.
  */
object SimilarityQueries extends QueryPack {

  private val k = 10
  private val tau = 0.45

  /** Every ~97th vector plays a query against the full corpus. */
  private def queriesOf(df: org.apache.spark.sql.DataFrame) =
    df.filter(col("vec_id") % 97 === 0)

  private val normSql =
    "sqrt(list_sum(list_transform(range(1, len(embedding) + 1), i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))))"

  private def dotSql(a: String, b: String) =
    s"list_sum(list_transform(range(1, len($a.embedding) + 1), i -> CAST($a.embedding[i] AS DOUBLE) * CAST($b.embedding[i] AS DOUBLE)))"

  override def queries: Map[String, Query] = Map(
    "v_cosine_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, queriesOf(emb), "vec_id", "embedding", k)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Blocked exact all-pairs (no BroadcastNestedLoopJoin): τ=0.45 sits
    // inside the corpus's similarity bulk (background max ≈ 0.4497 at
    // sf0.1), so no LSH gap exists and the exact n²/2 is inherent — the
    // blocked equi-join spreads it across executors with no driver
    // broadcast. Similarity.cosineNearDupLsh is the sub-quadratic path for
    // gapped thresholds (spec-verified on planted high-cosine dups).
    "v_cosine_neardup" -> ((s, dir) =>
      Similarity.cosineNearDupBlocked(Tables.load(s, dir, "embeddings"),
        "vec_id", "embedding", minCosine = tau)
        .orderBy(col("id_a"), col("id_b"))),

    // Approximate variants — rows-only checks; recall vs the exact baseline
    // is asserted in ScalaTest.
    "v_lsh_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      // 2^6 buckets suits the testdata corpus sizes (500-5000 vectors);
      // at cluster scale, bits grows with log2(corpus)/density.
      Similarity.lshTopK(emb, queriesOf(emb), "vec_id", "embedding", k, bits = 6)
        .orderBy(col("query_id"), col("rank"))
    }),

    "v_ivf_topk" -> ((s, dir) => {
      val emb = Tables.load(s, dir, "embeddings")
      Similarity.ivfTopK(emb, queriesOf(emb), "vec_id", "embedding", "label",
        k, dim = 64)
        .orderBy(col("query_id"), col("rank"))
    }))

  override def oracleSql: Map[String, String] = Map(
    "v_cosine_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding, $normSql AS nrm FROM embeddings),
         |q AS (SELECT * FROM e WHERE vec_id % 97 = 0),
         |sims AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    ${dotSql("q", "c")} / (q.nrm * c.nrm) AS cosine_sim
         |  FROM q JOIN e c ON q.vec_id <> c.vec_id),
         |ranked AS (
         |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
         |    ORDER BY cosine_sim DESC, neighbor_id) AS INTEGER) AS rank
         |  FROM sims)
         |SELECT query_id, neighbor_id, cosine_sim, rank FROM ranked
         |WHERE rank <= $k ORDER BY query_id, rank""".stripMargin,

    "v_cosine_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding, $normSql AS nrm FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${dotSql("a", "b")} / (a.nrm * b.nrm) AS cosine_sim
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ${dotSql("a", "b")} / (a.nrm * b.nrm) >= $tau
         |ORDER BY id_a, id_b""".stripMargin)
}
