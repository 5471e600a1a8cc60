package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

/** Product quantization for approximate nearest-neighbor search (Jégou,
  * Douze, Schmid, "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): split each D-dim vector into `m` subvectors, k-means each
  * subspace to `k` centroids, and represent every vector by its `m`
  * per-subspace centroid indices — D floats compress to `m` small ints,
  * and asymmetric distance computation (ADC) scores a (query, vector)
  * pair with `m` table lookups instead of D multiplies.
  *
  * Scale posture (billions of vectors): codebooks are `m·k·(D/m) = k·D`
  * doubles of driver-side model state folded into plans as literals (the
  * [[Clustering]] shape). Training scans the corpus ONCE per Lloyd round —
  * all `m` subspaces fit in the same pass (assign all subspaces in one
  * narrow projection, then a per-(subspace, cell, dim) partial-sum shuffle
  * of k·D accumulator rows). Encoding is a zero-shuffle projection; the
  * encoded corpus is 1-2 bytes per subspace per row — the representation
  * you can afford to keep hot for rescoring candidate sets at 100 TB.
  * ADC search broadcasts the query side (each query carrying its m×k
  * distance table, built once per query from the literal codebooks) and
  * streams the encoded corpus once; the only exchange is the final
  * per-query top-k reduction.
  *
  * Everything is deterministic: hash seeding (k smallest md5(id) rows),
  * decimal-exact centroid sums, and argmin ties broken to the smallest
  * centroid index — a re-fit on any partitioning is bit-identical.
  */
object Pq {

  /** 1-based subvector slice of subspace `m` (width `sub`). */
  private def subv(vec: Column, m: Int, sub: Int): Column =
    slice(vec, m * sub + 1, sub)

  /** Argmin-L2 centroid index for one subspace, as a pure projection over
    * literal centroids. Scores the PARTIAL distance ‖c‖² − 2·v_m·c (the
    * ‖v_m‖² term is constant across centroids, so the argmin is unchanged);
    * `array_min` over struct(score, index) breaks ties to the smallest
    * index. ‖c‖² is the same left-fold the column-side recompute gate uses,
    * so cross-mechanism comparisons are bit-exact.
    */
  def assignSub(vec: Column, m: Int, sub: Int,
      centroids: Seq[Seq[Double]]): Column = {
    val v = subv(vec, m, sub)
    val scored = centroids.zipWithIndex.map { case (cvec, j) =>
      val cn2 = cvec.foldLeft(0.0)((a, x) => a + x * x)
      struct((lit(cn2) - lit(2.0) * dot(v, typedlit(cvec))).as("s"),
        lit(j).as("j"))
    }
    array_min(array(scored: _*)).getField("j")
  }

  /** The full code array (one int per subspace) as a narrow projection. */
  def codesExpr(vec: Column, codebooks: Seq[Seq[Seq[Double]]]): Column = {
    val sub = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (cb, m) =>
      assignSub(vec, m, sub, cb)
    }: _*)
  }

  /** Train per-subspace L2 codebooks: `m` subspaces × `k` centroids each.
    * Seeds are the k smallest-md5(id) rows' subvectors (deterministic on
    * any partitioning); each Lloyd round is ONE corpus scan — all
    * subspaces assigned in the same projection, partial sums shuffled as
    * k·D narrow accumulator rows. Empty cells keep their previous
    * centroid. Returns codebooks[m][cell][dim].
    */
  def trainCodebooks(df: DataFrame, id: String, vec: String, m: Int, k: Int,
      maxIter: Int = 5): Seq[Seq[Seq[Double]]] = {
    import graft.ops.Aggregations.sumStable
    val base = df.select(col(id).cast("string").as("__id"),
        col(vec).cast("array<double>").as("__v"))
      .localCheckpoint()
    val dim = base.select(size(col("__v"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    val seedRows = base.withColumn("__h", md5(col("__id")))
      .orderBy(col("__h"), col("__id"))
      .limit(k).select(col("__v")).collect()
      .map(_.getSeq[Double](0).toSeq)
    var books: Seq[Seq[Seq[Double]]] = (0 until m).map(mi =>
      seedRows.toSeq.map(v => v.slice(mi * sub, mi * sub + sub)))
    for (_ <- 1 to maxIter) {
      val sums = base
        .select(codesExpr(col("__v"), books).as("__codes"),
          posexplode(col("__v")).as(Seq("__i", "__x")))
        .select(expr(s"CAST(__i div $sub AS INT)").as("__m"),
          expr(s"__codes[__i div $sub]").as("__cell"),
          expr(s"__i % $sub").as("__d"),
          col("__x"))
        .groupBy(col("__m"), col("__cell"), col("__d"))
        .agg(sumStable(col("__x")).as("__s"), count(lit(1)).as("__n"))
        .collect()
      val acc = Array.fill(m)(Array.fill(k)(new Array[Double](sub)))
      val cnt = Array.fill(m)(new Array[Long](k))
      sums.foreach { r =>
        val (mi, c, d) = (r.getInt(0), r.getInt(1), r.getInt(2))
        acc(mi)(c)(d) = r.getDouble(3)
        cnt(mi)(c) = r.getLong(4)
      }
      books = books.zipWithIndex.map { case (cb, mi) =>
        cb.zipWithIndex.map { case (prev, c) =>
          if (cnt(mi)(c) == 0L) prev
          else acc(mi)(c).map(_ / cnt(mi)(c)).toSeq
        }
      }
    }
    books
  }

  /** Corpus + an `array<int>` PQ code column — a zero-shuffle projection. */
  def encode(df: DataFrame, vec: String, codebooks: Seq[Seq[Seq[Double]]],
      codeCol: String = "pq_code"): DataFrame =
    df.withColumn(codeCol,
      codesExpr(col(vec).cast("array<double>"), codebooks))

  /** ADC top-k: for each query row, the `k` corpus rows with the smallest
    * asymmetric PQ distance Σ_m ‖q_m − c_m,code_m‖². Each query builds its
    * m×k distance table ONCE as a narrow projection over the literal
    * codebooks, the query side broadcasts, the encoded corpus streams once,
    * and per pair the score is `m` array lookups folded in subspace order
    * (a deterministic left fold — rescoring the same pair anywhere gives
    * the same double). Ties break to the smaller neighbor id.
    *
    * Output: (query_id, neighbor_id, adc_dist, rank).
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, id: String, vec: String,
      codebooks: Seq[Seq[Seq[Double]]], k: Int): DataFrame = {
    val m = codebooks.size
    val c = encode(corpus, vec, codebooks, "__code")
      .select(col(id).as("neighbor_id"), col("__code"))
    val qv = col(vec).cast("array<double>")
    val tbl = array(codebooks.zipWithIndex.map { case (cb, mi) =>
      val sub = cb.head.length
      val q = subv(qv, mi, sub)
      array(cb.map { cvec =>
        val cn2 = cvec.foldLeft(0.0)((a, x) => a + x * x)
        dot(q, q) - lit(2.0) * dot(q, typedlit(cvec)) + lit(cn2)
      }: _*)
    }: _*)
    val q = queries.select(col(id).as("query_id"), tbl.as("__tbl"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist"), col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("adc_dist",
        expr(s"aggregate(sequence(0, ${m - 1}), CAST(0 AS DOUBLE), " +
          "(acc, i) -> acc + __tbl[i][__code[i]])"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc_dist"),
        col("rank"))
  }
}
