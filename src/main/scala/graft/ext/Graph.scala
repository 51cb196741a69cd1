package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph algorithms over edge-list DataFrames — the
  * link-analysis companion to [[Dedup.connectedComponents]] (which
  * turns near-dup pairs into groups; these score nodes WITHIN the
  * graph). Same scale posture: the iteration state is node-sized,
  * each round is a bounded number of shuffle joins over the edge list
  * only, and the corpus payload never enters the loop.
  */
object Graph {

  /** Fixed-point scale for integer PageRank: ranks sum to ~this. */
  val PagerankScale: Long = 1000000000000L

  /** PageRank with damping 0.85 over an UNDIRECTED pair list, in
    * fixed-point integer arithmetic on a 10^12 scale — floating-point
    * PageRank sums neighbor contributions in partition-dependent
    * order, so its low bits are not reproducible across runs or
    * engines; BIGINT sums are order-independent and every division is
    * one integral `div`, making the result exactly reproducible (and
    * DuckDB-oracle-able with `//`).
    *
    * `iters` is FIXED (not converge-tested): fixed plan depth, no
    * driver-side convergence data, and the oracle can mirror the
    * exact iteration count. Each iteration: one shuffle join of the
    * edge list against the node-sized rank relation, one partial-agg
    * sum on dst, one left join back to the node base — the identical
    * per-round envelope as connectedComponents. Total truncation loss
    * per round is < |edges| + |nodes| units on the 10^12 scale
    * (bounded, spec-asserted).
    *
    * Returns (node, deg, pr) for every node appearing in a pair.
    */
  def pagerankScaled(
      pairs: DataFrame,
      a: String = "doc_a",
      b: String = "doc_b",
      iters: Int = 3): DataFrame = {
    val edges = pairs.select(col(a).as("src"), col(b).as("dst"))
      .unionByName(pairs.select(col(b).as("src"), col(a).as("dst")))
      .distinct()
      .localCheckpoint() // candidate generation runs once, not per-round
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val n = deg.agg(count(lit(1)).as("n"))
    val base = deg.crossJoin(broadcast(n)) // node, deg, n — 1-row scalar join
    var pr = base.select(col("node"), col("deg"),
      expr(s"$PagerankScale div n").as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.withColumnRenamed("node", "jn"), edges("src") === col("jn"))
        .select(col("dst"), expr("(pr * 85) div (100 * deg)").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("contrib"))
      pr = base.join(contrib, base("node") === contrib("dst"), "left")
        .select(base("node"), base("deg"),
          (expr(s"${15 * PagerankScale} div (100 * n)") +
            coalesce(col("contrib"), lit(0L))).as("pr"))
    }
    pr
  }

  /** Per-node triangle counts over an ordered pair list (`a < b` on
    * every input row, the [[Dedup.minhashCandidates]] contract) —
    * triangle density separates genuine duplicate CLUSTERS (mutually
    * similar, triangle-rich) from chains of borderline pairs
    * (triangle-free), the standard community-density signal.
    *
    * Shape: wedge join (b-pivot) + closure join — two shuffle joins
    * over the pair list, which the caller's candidate generation has
    * already bounded per LSH bucket, so wedge counts are bounded by
    * bucket sizes rather than node degrees (the ordered-edge
    * orientation is the same trick production triangle counters use
    * to bound wedges by the LOWER-degree endpoint). The pair list is
    * materialized once for its three consumers. Returns (doc_id,
    * n_triangles) for nodes in ≥ 1 triangle.
    */
  def triangleCounts(pairs: DataFrame, a: String = "doc_a", b: String = "doc_b"): DataFrame = {
    val p = pairs.select(col(a).as("pa"), col(b).as("pb")).localCheckpoint()
    val wedges = p.select(col("pa").as("ta"), col("pb").as("tb"))
      .join(p.select(col("pa").as("tb"), col("pb").as("tc")), "tb")
    val tris = wedges.join(
      p.select(col("pa").as("ta"), col("pb").as("tc")), Seq("ta", "tc"))
    tris.select(explode(array(col("ta"), col("tb"), col("tc"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
  }
}
