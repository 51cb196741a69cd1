package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level transforms: the Scala twins of the reference's
  * `utils/transform_functions.py`. All of these are plan-building
  * `DataFrame => DataFrame` functions (no UDFs): they compose Catalyst
  * expressions, so casts/rounds stay inside whole-stage codegen and
  * renames are metadata-only.
  */
object Transform {

  /** One casting rule: apply `kind` to every listed field that exists.
    * Mirrors the casting-spec dict list of reference `main.py:119-123`
    * interpreted by `cast_types` (`transform_functions.py:29-47`):
    * fields absent from the input schema are silently skipped.
    */
  sealed trait CastKind
  case object ToInt  extends CastKind
  case object ToDate extends CastKind
  /** "DecimalN" of the reference: physically double, rounded to
    * `scale` digits (`transform_functions.py:32-39`). Spark `round` is
    * HALF_UP, matching the reference.
    */
  final case class ToRounded(scale: Int) extends CastKind
  final case class CastSpec(kind: CastKind, fields: Seq[String])

  /** P9 — declarative typing of an all-string raw frame
    * (reference `transform_functions.py:29-47`).
    *
    * Casts are `try_cast`: the reference runs Spark 3 with ANSI off,
    * where an unparseable string (e.g. `aged_65_older = "19.4"` cast to
    * Integer — a real case in its own spec, `main.py:121`) silently
    * becomes NULL and is then zero-filled. Spark 4 defaults ANSI on,
    * which would instead fail the job; `try_cast` restores the
    * reference's invalid→NULL semantics without disabling ANSI
    * session-wide.
    */
  def castTypes(df: DataFrame, specs: Seq[CastSpec]): DataFrame = {
    val present = df.columns.toSet
    specs.foldLeft(df) { (acc, spec) =>
      spec.fields.filter(present.contains).foldLeft(acc) { (d, f) =>
        spec.kind match {
          case ToInt        => d.withColumn(f, col(f).try_cast(IntegerType))
          case ToDate       => d.withColumn(f, col(f).try_cast(DateType))
          case ToRounded(n) => d.withColumn(f, round(col(f).try_cast(DoubleType), n))
        }
      }
    }
  }

  /** P3 — bulk rename (reference `transform_functions.py:2-6`).
    * Metadata-only; no shuffle, no data movement.
    */
  def renameAll(df: DataFrame, pairs: Seq[(String, String)]): DataFrame =
    df.withColumnsRenamed(pairs.toMap)

  /** P4 — uppercase the first letter of every column name
    * (reference `transform_functions.py:8-15`).
    */
  def upperFirstCols(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(c => c.head.toUpper +: c.tail): _*)

  /** P5 — lowercase all column names
    * (reference `transform_functions.py:17-24`; defined there but
    * never invoked — kept for API parity).
    */
  def lowerCols(df: DataFrame): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(_.toLowerCase): _*)

  /** P8 — derived date parts: integer Year plus zero-padded *string*
    * Month, exactly as the reference's partition columns
    * (`main.py:229`: `year(Date)`, `date_format(Date,'MM')`).
    */
  def withDateParts(df: DataFrame, dateCol: String): DataFrame =
    df.withColumn("Year", year(col(dateCol)))
      .withColumn("Month", date_format(col(dateCol), "MM"))

  /** P10 — numeric null-fill (reference `.na.fill(value=0)`,
    * `main.py:128-135,226`).
    */
  def fillNumericNulls(df: DataFrame, value: Int = 0): DataFrame =
    df.na.fill(value)
}
