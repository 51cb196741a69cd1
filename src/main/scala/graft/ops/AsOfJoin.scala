package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF join — an operator Spark's built-ins lack (and the classic
  * "custom operator" case from the design brief): for each left row,
  * attach the single right row with the greatest `rightTs <= leftTs`
  * for the same key. Matches DuckDB's `ASOF LEFT JOIN`, which the
  * oracle uses directly.
  *
  * Spark-first composition instead of a range join: a range condition
  * (`r.ts <= l.ts`) would plan as a per-key nested loop — O(|L|·|R|)
  * within each key. Here both sides are tagged and unioned, and ONE
  * window over (key, ts, side) carries the latest right payload
  * forward — one shuffle on the key, one sort, then a linear scan.
  * O((|L|+|R|) log) and embarrassingly partition-parallel; this is the
  * standard large-scale as-of shape (the same plan a point-in-time
  * lookup join compiles to in stream processors).
  *
  * PRECONDITIONS (both are DuckDB-asof determinism requirements too):
  *  - `right` unique on (rightKey, rightTs);
  *  - payload columns non-null (`last(_, ignoreNulls)` implements the
  *    carry, so a NULL payload value would fall back to the previous
  *    match instead of attaching as NULL).
  * Tie rule: `rightTs == leftTs` matches (right rows sort before left
  * rows at equal timestamps).
  */
object AsOfJoin {

  def asOfLeft(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    val reserved = Set("_k", "_t", "_side") ++ payload.map("_p_" + _)
    require(lCols.intersect(reserved.toSeq).isEmpty,
      s"asOfLeft: left columns collide with helper names ${lCols.intersect(reserved.toSeq)}")
    require(payload.intersect(lCols).isEmpty,
      s"asOfLeft: payload ${payload.intersect(lCols)} would duplicate left column names")
    val lPart = left.select(
      lCols.map(col) ++
        Seq(col(leftKey).as("_k"), col(leftTs).as("_t"), lit(1).as("_side")) ++
        payload.map(c => lit(null).cast(right.schema(c).dataType).as("_p_" + c)): _*)
    val rPart = right.select(
      lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(rightKey).as("_k"), col(rightTs).as("_t"), lit(0).as("_side")) ++
        payload.map(c => col(c).as("_p_" + c)): _*)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(lPart.unionByName(rPart)) { (df, c) =>
      df.withColumn("_p_" + c, last(col("_p_" + c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(lCols.map(col) ++ payload.map(c => col("_p_" + c).as(c)): _*)
  }

  /** The custom-operator form of [[asOfLeft]]: plans straight to
    * `graft.plans.AsOfJoinExec` (one co-partitioned sort-merge pass —
    * no union, no carry-forward window state; right rows attach during
    * the merge). Same semantics for the preconditions above, with ONE
    * divergence when the non-null-payload precondition is violated:
    * the native operator attaches a NULL payload as NULL (correct
    * as-of semantics), while this window composition would carry the
    * previous non-NULL match forward. Requires a session with
    * `GraftExtensions` (the strategy registration).
    */
  def asOfLeftNative(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTs: String,
      rightTs: String,
      payload: Seq[String]): DataFrame = {
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(a => left.sparkSession.sessionState.conf.resolver(a.name, n))
        .getOrElse(throw new IllegalArgumentException(s"column $n not found"))
    org.apache.spark.sql.GraftSqlShims.ofRows(left.sparkSession,
      graft.plans.AsOfJoinPlan(lPlan, rPlan,
        attr(lPlan, leftKey), attr(rPlan, rightKey),
        attr(lPlan, leftTs), attr(rPlan, rightTs),
        payload.map(attr(rPlan, _))))
  }
}
