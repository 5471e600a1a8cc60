package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering for scan locality — the
  * `OPTIMIZE ZORDER BY` primitive of modern lakehouse layouts: interleave
  * the bits of two column values so that range-partitioning on ONE long
  * co-locates rows that are close in BOTH dimensions. Parquet row-group
  * min/max pruning then skips data for predicates on EITHER dimension —
  * where a plain sort gives locality only on its lead key, and a
  * predicate on the second key scans everything.
  *
  * At 100 TB this is a WRITE-SIDE operator: cluster once, save scan time
  * on every subsequent query. The z-value is pure integer bit arithmetic
  * — `((x >> i) & 1) << 2i | ((y >> i) & 1) << (2i+1)` summed over bit
  * positions — identical in any engine, so the layout-quality report
  * gates value-exactly against the oracle.
  */
object Locality {

  /** Morton code of two non-negative values using `bits` low bits of
    * each: x occupies even output bits, y odd. Pure integer ops (shift /
    * mask / disjoint-bit add), so the value is engine-exact. Inputs must
    * be in [0, 2^bits); normalize (rank, bucket, or offset) first.
    */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftright(xs, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(ys, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _) // bit positions are disjoint — the sum IS the OR
  }

  /** `df` physically clustered by the z-order of (`xCol`, `yCol`):
    * range-partitioned on the z-value and sorted by it within partitions,
    * so every output partition (→ parquet file at write time) covers a
    * compact z-range = a small bounding box in (x, y) space. This is the
    * frame to hand straight to `.write.parquet` — min/max footer stats on
    * x and y then prune on both.
    */
  def zOrdered(df: DataFrame, xCol: String, yCol: String, bits: Int,
      partitions: Int): DataFrame = {
    val z = zValue2(col(xCol), col(yCol), bits).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
