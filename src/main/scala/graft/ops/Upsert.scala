package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join-based MERGE/upsert semantics — the Spark-first re-expression of
  * the reference's Delta MERGE and Synapse staged-upsert family
  * (SURVEY.md §2.9: M1–M4). No Delta dependency: each merge is a single
  * declarative join plan that Catalyst schedules as one shuffle on the
  * natural key (or a broadcast join when the update side is small),
  * which is exactly the physical shape Delta's own MERGE produces.
  *
  * Scale notes (100 TB posture):
  *  - all three shapes shuffle both sides *once* on the merge key; with
  *    AQE on, a small update set downgrades to a broadcast join for free;
  *  - the column rewrite is pure projection (codegen'd `coalesce`), so
  *    cost is dominated by the join itself;
  *  - no driver-side collection anywhere.
  */
object Upsert {

  private def qualify(df: DataFrame, prefix: String): DataFrame =
    df.toDF(df.columns.toIndexedSeq.map(prefix + _): _*)

  /** M1/M4 — update-only merge (reference `main.py:191-199` loop driven
    * by the mapping tables at `main.py:138-189`; M4 single-column reset
    * at `main.py:293-304`). Matched target rows take the mapped update
    * columns; unmatched target rows pass through; update rows without a
    * match are dropped (Delta `whenMatchedUpdate` has no insert clause).
    *
    * PRECONDITION: `updates` must be unique on its merge key — Delta
    * MERGE raises a multiple-match error there, and this left join
    * would instead silently fan target rows out. Enforced here with a
    * windowed uniqueness check that fails the job on the first
    * duplicate key (cheap: rides the same shuffle as the join when the
    * keys align).
    *
    * @param mapping targetColumn -> updateColumn, mirroring the
    *                reference's per-source `mappings` dicts.
    */
  def updateMerge(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[(String, String)], // (targetKey, updateKey)
      mapping: Map[String, String]
  ): DataFrame = {
    // per-key cardinality on the update side; >1 fails the merge below
    val kcW = Window.partitionBy(keys.map { case (_, uk) => col(uk) }: _*)
    val u = qualify(updates.withColumn("_kc", count(lit(1)).over(kcW)), "_u_")
    val cond = keys
      .map { case (tk, uk) => target(tk) === u("_u_" + uk) }
      .reduce(_ && _)
    // matched-flag from the (always non-null) update-side row marker;
    // routes through the duplicate-key check so it cannot be pruned.
    val matched = when(u("_u__kc") > 1, raise_error(lit(
        "updateMerge: duplicate update-side merge key (Delta MERGE would raise a multiple-match error)")))
      .otherwise(u("_u__kc").isNotNull)
    val joined = target.join(u, cond, "left")
    val projected = target.columns.map { c =>
      mapping.get(c) match {
        case Some(uc) => when(matched, u("_u_" + uc)).otherwise(target(c)).as(c)
        case None     => target(c)
      }
    }
    joined.select(projected.toIndexedSeq: _*)
  }

  /** M2 — full upsert (reference `load_functions.py:64-122`): matched
    * rows take the update's mapped columns *including legitimate
    * NULLs*, unmatched update rows are inserted whole, unmatched
    * target rows pass through — exactly `whenMatchedUpdate` +
    * `whenNotMatchedInsert`. One full outer join; matched-ness comes
    * from the update-side key being non-null (merge keys are non-null
    * by construction), NOT per-column `coalesce`, which would keep the
    * stale target value when an update legitimately nulls a column.
    *
    * Requires `updates` to share the target's schema (the reference's
    * enterprise merge maps all 25 columns by name).
    *
    * @param updateCols when set, only these columns are rewritten on
    *                   matched rows (the reference's enterprise merge
    *                   updates 20 of the 25 columns — matched rows keep
    *                   their existing `_SK_METRICS_FACT`,
    *                   `_TF_LAST_UPDATE` and `Location`,
    *                   `load_functions.py:71-92`); inserts always take
    *                   the full update row.
    */
  def fullUpsert(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String],
      updateCols: Option[Seq[String]] = None
  ): DataFrame = {
    val u = qualify(updates, "_u_")
    val cond = keys.map(k => target(k) === u("_u_" + k)).reduce(_ && _)
    val joined = target.join(u, cond, "full_outer")
    val matched = keys.map(k => u("_u_" + k).isNotNull).reduce(_ && _)
    val inserted = keys.map(k => target(k).isNull).reduce(_ && _)
    val rewrite = updateCols.map(_.toSet)
    val projected = target.columns.map { c =>
      if (keys.contains(c)) coalesce(target(c), u("_u_" + c)).as(c)
      else if (rewrite.forall(_.contains(c)))
        when(matched, u("_u_" + c)).otherwise(target(c)).as(c)
      else // non-updated column: kept on match, taken from updates on insert
        when(inserted, u("_u_" + c)).otherwise(target(c)).as(c)
    }
    joined.select(projected.toIndexedSeq: _*)
  }

  /** M7 — schema-EVOLVING upsert: the updates may carry columns the
    * target lacks (the feed grew a field) and may omit target columns
    * (the feed never had them) — Delta's MERGE-with-autoMerge
    * behavior, re-expressed with the same join plan as [[fullUpsert]]:
    *  - new update-side columns are appended to the target schema,
    *    null for rows the updates never touch;
    *  - matched rows take update values ONLY for columns the updates
    *    actually carry — target-only columns survive a match (the
    *    critical difference from calling fullUpsert on null-padded
    *    updates, which would null them);
    *  - inserts take the full update row, null for target-only
    *    columns.
    * Same single-shuffle full-outer shape; the widening is pure
    * projection.
    */
  def evolveUpsert(
      target: DataFrame,
      updates: DataFrame,
      keys: Seq[String]
  ): DataFrame = {
    // column identity follows the SESSION's resolution rules (like
    // Delta's autoMerge, which consults spark.sql.caseSensitive): under
    // the default case-insensitive analysis a case-variant update
    // column ('Price' vs target 'price') is the SAME column — exact
    // String comparison would classify it "new" and the widening
    // withColumn would case-insensitively replace the target column
    // with nulls on every untouched row. In a case-sensitive session
    // the same pair really IS two distinct columns, so the comparator
    // must follow the conf or evolveUpsert would silently merge them.
    val caseSensitive = target.sparkSession.sessionState.conf.caseSensitiveAnalysis
    def same(a: String, b: String) =
      if (caseSensitive) a == b else a.equalsIgnoreCase(b)
    def inTarget(c: String) = target.columns.exists(same(_, c))
    def inUpdates(c: String) = updates.columns.exists(same(_, c))
    val newCols = updates.columns.filterNot(inTarget)
    val widenedTarget = newCols.foldLeft(target)((d, c) =>
      d.withColumn(c, lit(null).cast(updates.schema(c).dataType)))
    val widenedUpdates = updates.select(widenedTarget.columns.toIndexedSeq.map { c =>
      if (inUpdates(c)) col(c).as(c) // resolves case-insensitively; alias to target casing
      else lit(null).cast(target.schema(c).dataType).as(c)
    }: _*)
    fullUpsert(widenedTarget, widenedUpdates, keys,
      updateCols = Some(widenedTarget.columns.toIndexedSeq
        .filter(c => inUpdates(c) && !keys.exists(same(_, c)))))
  }

  /** M3 — last-writer-wins staged upsert (reference
    * `load_functions.py:2-60`): the Synapse postActions SQL deletes
    * whichever side is older by `versionCol` (`_TF_LAST_UPDATE >=`
    * comparison ⇒ tie goes to staging) and inserts the survivors.
    * Re-expressed as unionByName + one windowed dedup keeping, per key,
    * the newest row with staging preferred on ties.
    *
    * When `versionCol` is None the reference falls back to a key-only
    * match (staging always wins) — same code path, constant version.
    */
  def lwwUpsert(
      target: DataFrame,
      staging: DataFrame,
      keys: Seq[String],
      versionCol: Option[String]
  ): DataFrame = {
    val t = target.withColumn("_is_staging", lit(0))
    val s = staging.withColumn("_is_staging", lit(1))
    val versionOrder = versionCol match {
      case Some(v) => Seq(col(v).desc_nulls_last, col("_is_staging").desc)
      case None    => Seq(col("_is_staging").desc)
    }
    val w = Window.partitionBy(keys.map(col): _*).orderBy(versionOrder: _*)
    t.unionByName(s)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn", "_is_staging")
  }
}
