package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys — the multi-dimensional data
  * layout trick behind Delta/Iceberg `ZORDER BY`: interleaving the
  * bits of two dimension keys makes rows that are close in EITHER
  * dimension land close in the one-dimensional sort order, so a
  * range-partitioned, sorted-within-partitions write produces files
  * whose min/max footers are NARROW in BOTH dimensions. A filter on
  * either dimension then skips most files (parquet row-group stats /
  * file pruning), where a single-column sort gives perfect skipping
  * on that column and NONE on the other.
  *
  * The z-value is pure integer bit arithmetic (shift/and/or over
  * BIGINT) — statically unrolled per bit, no HOF, whole-stage
  * codegen'd, and identical in DuckDB, so queries over it are
  * oracle-exact.
  *
  * Scale posture (100 TB): computing z is map-side; the layout write
  * is ONE `repartitionByRange(z)` shuffle — the same cost as any
  * sorted write — after which every multi-dimensional slice query
  * saves its scan cost forever. The spec (`ZOrderSpec`) measures the
  * claim: fraction of files containing a narrow y-slice under
  * z-layout vs under an x-only sort.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative BIGINT
    * columns: bit i of x → bit 2i, bit i of y → bit 2i+1.
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The DuckDB mirror of [[zValue]] (same shifts, same BIGINT ops). */
  def zValueSql(x: String, y: String, bits: Int): String =
    (0 until bits).map { i =>
      s"(((($x >> $i) & 1) << ${2 * i}) | ((($y >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")

  /** Layout write: range-partition by the z key (one shuffle) and
    * sort within partitions, so every output file covers a compact
    * z-interval — i.e. a small rectangle in (x, y) space.
    */
  def writeZOrdered(df: DataFrame, zCol: Column, numFiles: Int, path: String): Unit =
    df.withColumn("_z", zCol)
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
