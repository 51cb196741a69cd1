package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** W1 — dense, gap-free surrogate-key assignment continuing from a
  * warehouse max (reference `main.py:283-286`, which uses
  * `rdd.zipWithIndex`).
  */
object SurrogateKey {

  /** Deterministic variant: `row_number()` over an explicit total order
    * plus the offset. The reference's order is partition-arrival order
    * (unspecified); we require explicit keys so the DuckDB oracle can
    * reproduce the assignment exactly (SURVEY.md §2.7).
    *
    * The global window is a single-partition sort — correct at any
    * scale but serialized through one task; fine for dimension-sized
    * inputs (the reference assigns keys to one day's increment,
    * ~250 rows/source). For fact-sized inputs use [[scalable]].
    */
  def ordered(df: DataFrame, keyCol: String, orderCols: Seq[String], startAt: Long): DataFrame = {
    val w = Window.orderBy(orderCols.map(col): _*)
    df.withColumn(keyCol, row_number().over(w).cast(LongType) + lit(startAt))
  }

  /** Scale path: per-partition offsets via `zipWithIndex` — the Scala
    * twin of the reference's RDD trick. `zipWithIndex` runs one job to
    * count partition sizes, then assigns `globalIdx = prefixSum(p) + i`
    * with no global sort and no single-partition bottleneck. Keys are
    * dense and gap-free but partition-order-dependent (same contract as
    * the reference). Use [[ordered]] when determinism matters more than
    * scale.
    */
  def scalable(df: DataFrame, keyCol: String, startAt: Long): DataFrame = {
    val spark = df.sparkSession
    val withIdx = df.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L + startAt))
    }
    val schema = StructType(df.schema.fields :+ StructField(keyCol, LongType, nullable = false))
    spark.createDataFrame(withIdx, schema)
  }
}
