package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Integer PageRank ([[Graph.pagerankScaled]]): structural invariants
  * on hand-built graphs (the query-level oracle hash-match at sf0.01
  * covers the corpus path).
  */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  private def ranks(pairs: (Long, Long)*): Map[Long, Long] =
    Graph.pagerankScaled(pairs.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap

  test("star graph: the hub outranks the leaves, leaves tie exactly") {
    val pr = ranks((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    assert(pr(1L) > pr(2L), pr.toString)
    assert(pr(2L) == pr(3L) && pr(3L) == pr(4L) && pr(4L) == pr(5L), pr.toString)
  }

  test("symmetric pair: both endpoints get identical rank") {
    val pr = ranks((10L, 20L))
    assert(pr(10L) == pr(20L), pr.toString)
  }

  test("disconnected components do not leak rank into each other") {
    // a 2-clique and a separate 2-clique: by symmetry all four equal
    val pr = ranks((1L, 2L), (3L, 4L))
    assert(pr.values.toSet.size == 1, pr.toString)
  }

  test("mass conservation: total rank stays on the 10^12 scale (bounded truncation loss)") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val pr = ranks(pairs: _*)
    val total = pr.values.sum
    val n = pr.size
    val edges = 2L * pairs.size
    // each of the 3 rounds truncates < 1 unit per directed edge
    // (contribution div) + < 1 per node (teleport div), all downward
    val maxLoss = 3 * (edges + n) + n
    assert(total <= Graph.PagerankScale, s"total=$total")
    assert(total >= Graph.PagerankScale - maxLoss, s"total=$total, bound=$maxLoss")
  }

  test("chain: interior nodes outrank endpoints (degree drives centrality)") {
    val pr = ranks((1L, 2L), (2L, 3L))
    assert(pr(2L) > pr(1L) && pr(1L) == pr(3L), pr.toString)
  }

  test("empty pair list: pagerank returns empty, not a failure") {
    assert(ranks().isEmpty)
  }

  private def triangles(pairs: (Long, Long)*): Map[Long, Long] =
    Graph.triangleCounts(pairs.toDF("doc_a", "doc_b")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_triangles")).toMap

  test("K4: every node sits in 3 of the 4 triangles") {
    val t = triangles((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(t == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), t.toString)
  }

  test("a chain has no triangles; closing it makes exactly one") {
    assert(triangles((1L, 2L), (2L, 3L)).isEmpty)
    val closed = triangles((1L, 2L), (2L, 3L), (1L, 3L))
    assert(closed == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), closed.toString)
  }
}
