package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for equi-joins — the explicit form of what
  * AQE's skew-join split does at runtime (`spark.sql.adaptive.
  * skewJoin`, on by default in GraftSession). Useful when AQE can't
  * help: non-shuffle-join plans, streaming joins, or a known-skewed
  * key distribution where pre-salting avoids the lopsided first
  * attempt entirely.
  *
  * Mechanics: the big side gets a deterministic per-row salt in
  * [0, salt) (hash of caller-chosen spread columns — NOT the join key,
  * which is constant within the hot key), widening each join key to
  * `salt` shuffle partitions; the small side is replicated `salt`
  * ways with an exploded salt column. Join key becomes (key, salt) —
  * same result set, hot keys spread across `salt` tasks, small side
  * grows ×salt (keep it the dimension side).
  */
object SkewJoin {

  private val SupportedJoinTypes = Set("inner", "left", "leftouter", "leftsemi", "cross")

  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      joinCond: (DataFrame, DataFrame) => Column,
      spreadCols: Seq[String],
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, s"salt=$salt must be positive")
    // right/full outer would surface each unmatched small-side row once
    // PER REPLICA (salt× duplicates); anti would misfire the same way
    require(SupportedJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/left_semi/cross (small side is replicated), got $joinType")
    val b = big.withColumn("_salt",
      pmod(hash(spreadCols.map(big(_)): _*), lit(salt)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, joinCond(b, s) && b("_salt") === s("_salt"), joinType)
      .drop(b("_salt")).drop(s("_salt"))
  }
}
