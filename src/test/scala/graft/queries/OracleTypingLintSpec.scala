package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkEntry

/** Mechanical oracle-typing lint (r12 verdict item 2).
  *
  * The s29 red row was the THIRD typing-convention slip class to ship
  * (after double-rounding and decimal routing): DuckDB types
  * `SUM(BIGINT)` as HUGEINT while Spark emits BIGINT, so an un-cast
  * integer `SUM()` in an oracle's OUTPUT columns passes rows+schema
  * but fails the strict hash — and the sf1 budget checker
  * (value-level) cannot see it. This spec makes the convention
  * self-enforcing: every `SUM(` / `AVG(` that appears in an oracle's
  * OUTERMOST projection (paren depth 0, between a depth-0 SELECT and
  * its matching depth-0 FROM — i.e. a column the driver will hash)
  * must be enclosed in a `CAST( … )` span that pins the output type.
  *
  * Aggregates inside CTEs/subqueries are intermediate values — their
  * DuckDB-side widening is consumed by arithmetic and re-cast at the
  * output — so only depth-0 projections are linted. Audited exceptions
  * (e.g. aggregates that feed a VARCHAR-typed CASE/FORMAT) go on the
  * allowlist below WITH a justification; an empty allowlist is the
  * goal state.
  */
class OracleTypingLintSpec extends AnyFunSuite {

  /** query -> why its depth-0 raw aggregate is hash-safe. Every entry
    * here must carry an audit note; prefer fixing the oracle instead.
    */
  private val Allow: Map[String, String] = Map.empty

  /** Spans (start, endExclusive) of every top-level-balanced
    * `CAST( … )` in the SQL, including nested ones.
    */
  private def castSpans(sql: String): Seq[(Int, Int)] = {
    val u = sql.toUpperCase
    val spans = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i >= 0 && i < u.length) {
      val at = u.indexOf("CAST(", i)
      if (at < 0) i = -1
      else {
        var depth = 0
        var j = at + 4 // points at '('
        var end = -1
        while (end < 0 && j < u.length) {
          u.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = j + 1
            case _ =>
          }
          j += 1
        }
        if (end > 0) spans += ((at, end))
        i = at + 5
      }
    }
    spans.result()
  }

  /** Index ranges of the OUTERMOST projection(s): text at paren depth
    * 0 between a depth-0 SELECT keyword and the next depth-0 FROM (or
    * end of string for FROM-less selects). UNION'd depth-0 selects
    * each contribute a range.
    */
  private def outerProjectionRanges(sql: String): Seq[(Int, Int)] = {
    val u = sql.toUpperCase
    def isWord(c: Char) = c.isLetterOrDigit || c == '_'
    // depth at every index
    val depth = new Array[Int](u.length + 1)
    var d = 0
    for (i <- 0 until u.length) {
      depth(i) = d
      u.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
      }
    }
    depth(u.length) = d
    def keywordAt(kw: String, i: Int): Boolean =
      u.startsWith(kw, i) && depth(i) == 0 &&
        (i == 0 || !isWord(u.charAt(i - 1))) &&
        (i + kw.length >= u.length || !isWord(u.charAt(i + kw.length)))
    val ranges = Seq.newBuilder[(Int, Int)]
    var i = 0
    while (i < u.length) {
      if (keywordAt("SELECT", i)) {
        var j = i + 6
        while (j < u.length && !keywordAt("FROM", j)) j += 1
        ranges += ((i + 6, j))
        i = j
      } else i += 1
    }
    ranges.result()
  }

  private def rawOuterAggregates(sql: String): Seq[String] = {
    val u = sql.toUpperCase
    val casts = castSpans(sql)
    val projections = outerProjectionRanges(sql)
    val hits = Seq.newBuilder[String]
    for (agg <- Seq("SUM(", "AVG(")) {
      var i = u.indexOf(agg)
      while (i >= 0) {
        val inOuterProjection = projections.exists { case (s, e) => i >= s && i < e }
        val inCast = casts.exists { case (s, e) => i > s && i < e }
        val precededByWord = i > 0 && (u.charAt(i - 1).isLetterOrDigit || u.charAt(i - 1) == '_')
        if (inOuterProjection && !inCast && !precededByWord)
          hits += sql.substring(i, math.min(sql.length, i + 40)).replace('\n', ' ')
        i = u.indexOf(agg, i + 1)
      }
    }
    hits.result()
  }

  test("every outer-projection SUM/AVG in every oracle is CAST-pinned") {
    val offenders = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) if !Allow.contains(name) =>
        val raw = rawOuterAggregates(sql)
        if (raw.nonEmpty) Some(s"$name: ${raw.mkString(" | ")}") else None
      case _ => None
    }
    assert(offenders.isEmpty,
      "oracles with an un-CAST output-level SUM/AVG (DuckDB widens these " +
        "to HUGEINT/DOUBLE and the strict hash diverges — wrap in " +
        "CAST(... AS BIGINT/DOUBLE), see the s29 r12 red row):\n  " +
        offenders.mkString("\n  "))
  }

  test("lint self-check: the rule catches the exact s29 bug shape") {
    val bad = "SELECT o_orderstatus, SUM(o_custkey) AS s FROM orders GROUP BY 1"
    assert(rawOuterAggregates(bad).nonEmpty)
    val good = "SELECT o_orderstatus, CAST(SUM(o_custkey) AS BIGINT) AS s FROM orders GROUP BY 1"
    assert(rawOuterAggregates(good).isEmpty)
    val wrapped = "SELECT CAST(COALESCE(SUM(x), 0) AS BIGINT) AS s FROM t"
    assert(rawOuterAggregates(wrapped).isEmpty)
    val cte = "WITH w AS (SELECT SUM(x) AS s FROM t) SELECT CAST(s AS BIGINT) AS s FROM w"
    assert(rawOuterAggregates(cte).isEmpty, "CTE-internal aggregates are not output columns")
    val winDepth0 = "SELECT SUM(x) OVER (ORDER BY k) AS r FROM t"
    assert(rawOuterAggregates(winDepth0).nonEmpty, "window sums widen too")
  }
}
