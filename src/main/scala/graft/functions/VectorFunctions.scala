package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built from
  * higher-order array functions (`zip_with` + `aggregate`) — codegen-friendly,
  * no UDF, no driver-side loops.
  *
  * Determinism contract: elements are cast to double BEFORE multiplication
  * and accumulated with a sequential left fold, which is exactly how the
  * DuckDB oracle's `list_sum(list_transform(...))` evaluates — results are
  * bit-identical across engines.
  */
object VectorFunctions {

  /** Dot product in double precision (left-fold accumulation in index
    * order). Backed by the codegen'd [[graft.expressions.VectorDotProduct]];
    * [[dotHof]] is the pure-built-in formulation with identical semantics
    * (kept as the reference implementation and for engines without the
    * custom expression).
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftx.VectorExpressions.vecDot(a, b)

  /** Higher-order-function dot product — same bit-exact semantics as [[dot]],
    * ~50× slower (CodegenFallback), used to cross-check the native expression.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  /** Euclidean (L2) norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity with precomputed norms (preferred: compute each side's
    * norm once per row, not once per pair).
    */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)

  /** Cosine similarity, norms computed inline. */
  def cosine(a: Column, b: Column): Column =
    cosineWithNorms(a, b, l2Norm(a), l2Norm(b))

  /** Squared L2 distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double")
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  /** Signed dot product of `v` with pseudo-random hyperplane `p`: weights
    * derived deterministically from xxhash64(p, i) — no stored model,
    * reproducible across runs and engines.
    */
  private def planeDot(v: Column, p: Column): Column = aggregate(
    zip_with(v, sequence(lit(0), size(v) - 1), (x, i) =>
      x.cast("double") *
        ((pmod(xxhash64(p, i), lit(2001L)).cast("double") - lit(1000.0)) /
          lit(1000.0))),
    lit(0.0),
    (acc, t) => acc + t)

  /** Random-hyperplane LSH signature: `bits` sign bits packed MSB-first into
    * one long. Backed by the native [[org.apache.spark.sql.graftx.HyperplaneBands]]
    * (single band); [[hyperplaneSignatureHof]] is the bit-identical pure-
    * built-in reference.
    */
  def hyperplaneSignature(v: Column, bits: Int): Column =
    element_at(hyperplaneBandBuckets(v, 1, bits), 1)

  /** HOF reference formulation of [[hyperplaneSignature]] — bit-identical,
    * ~planes×dim interpreted hash calls per row; kept for cross-checking.
    */
  def hyperplaneSignatureHof(v: Column, bits: Int): Column = {
    val bitArr = transform(sequence(lit(0), lit(bits - 1)), p =>
      when(planeDot(v, p) >= 0, lit(1L)).otherwise(lit(0L)))
    aggregate(bitArr, lit(0L), (acc, b) => acc * 2 + b)
  }

  /** Banded hyperplane buckets: `bands` independent signatures of
    * `bitsPerBand` planes each (plane index = band*bitsPerBand + j, so bands
    * never share planes), as array<long>. The banding form of
    * [[hyperplaneSignature]] — total planes are not capped by a single
    * long's 63 bits, which matters because sign-bit agreement is a weak
    * per-bit signal (p = 1 − θ/π) and usable recall needs hundreds of
    * planes. Native expression with a cached per-dim weight matrix.
    */
  def hyperplaneBandBuckets(v: Column, bands: Int, bitsPerBand: Int): Column =
    org.apache.spark.sql.graftx.VectorExpressions.hyperplaneBands(v, bands, bitsPerBand)

  /** HOF reference formulation of [[hyperplaneBandBuckets]] — bit-identical,
    * kept for cross-checking the native expression.
    */
  def hyperplaneBandBucketsHof(v: Column, bands: Int, bitsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), bnd =>
      aggregate(
        transform(sequence(lit(0), lit(bitsPerBand - 1)), j =>
          when(planeDot(v, bnd * bitsPerBand + j) >= 0, lit(1L)).otherwise(lit(0L))),
        lit(0L), (acc, b) => acc * 2 + b))
}
