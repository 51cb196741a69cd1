package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot-diff change-data-capture: classify every key of two
  * versions of a keyed table as insert / delete / update, emitting
  * old/new values — the feed a downstream consumer replays after each
  * publish instead of re-reading the full store. Factored from the
  * `m6_cdc_diff` / `s19_snapshot_cdc` query pair so the
  * classification algebra is one definition, property-tested in
  * `ChangeFeedPropertySpec` (classification partitions the key
  * space; replaying the feed reconstructs the new version exactly).
  *
  * Scale shape: ONE key-partitioned full-outer sort-merge join of the
  * two versions (the plan `PlanAuditSpec` pins on both consumers) —
  * no broadcast assumption, both sides corpus-sized.
  *
  * Null semantics: DEFAULT (`nullSafe = false`) matches the ANSI
  * oracle `a.v <> b.v` — a value transition to or from NULL compares
  * NULL and is NOT emitted as an update; only key presence/absence
  * and non-null value inequality drive the feed. Callers whose
  * tables carry nullable compare columns should pass
  * `nullSafe = true`, which compares with the null-safe operator
  * (`IS DISTINCT FROM`) so NULL↔value transitions ARE emitted —
  * the blind spot is opt-out, not silent.
  */
object ChangeFeed {

  /** Diff `a` (old version) against `b` (new version); both must have
    * at most one row per `key`. Output: `keyOut` (the key), a
    * `change_type` in insert/delete/update, and `old_<c>` / `new_<c>`
    * for every compare column `c`. A row appears iff the key exists
    * in exactly one version, or exists in both with any compare
    * column unequal — where "unequal" is three-valued `<>` by default
    * and null-safe `IS DISTINCT FROM` under `nullSafe = true` (see
    * object doc).
    */
  def diff(a: DataFrame, b: DataFrame, key: String,
      compare: Seq[String], keyOut: String = "key",
      nullSafe: Boolean = false): DataFrame = {
    require(compare.nonEmpty, "need at least one compare column")
    val l = a.select(col(key).as("_cfk_a") +:
      compare.map(c => col(c).as(s"_cfa_$c")): _*)
    val r = b.select(col(key).as("_cfk_b") +:
      compare.map(c => col(c).as(s"_cfb_$c")): _*)
    val changed = compare.map { c =>
      if (nullSafe) !(col(s"_cfa_$c") <=> col(s"_cfb_$c"))
      else col(s"_cfa_$c") =!= col(s"_cfb_$c")
    }.reduceLeft(_ || _)
    l.join(r, col("_cfk_a") === col("_cfk_b"), "full_outer")
      .filter(col("_cfk_a").isNull || col("_cfk_b").isNull || changed)
      .select(
        coalesce(col("_cfk_a"), col("_cfk_b")).as(keyOut) +:
          when(col("_cfk_a").isNull, "insert")
            .when(col("_cfk_b").isNull, "delete")
            .otherwise("update").as("change_type") +:
          compare.flatMap(c => Seq(
            col(s"_cfa_$c").as(s"old_$c"),
            col(s"_cfb_$c").as(s"new_$c"))): _*)
  }
}
