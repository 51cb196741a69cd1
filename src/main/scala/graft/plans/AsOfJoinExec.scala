package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Planner rule: [[AsOfJoinPlan]] → [[AsOfJoinExec]]. */
class AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.rightKey, p.leftTs, p.rightTs, p.payload) :: Nil
    case _ => Nil
  }
}

/** Physical AS-OF LEFT JOIN: both sides hash-clustered on the key and
  * sorted by (key, ts) — Spark's EnsureRequirements inserts the
  * exchanges/sorts — then ONE streaming merge pass per partition:
  * advance the right iterator while its (key, ts) ≤ the current left
  * row's, remembering the latest right row, and emit left ++ payload
  * when the remembered key matches (NULLs otherwise).
  *
  * vs the window composition (`ops.AsOfJoin.asOfLeft`): no union, no
  * carry-forward window state, right rows never copied into the left
  * stream — the payload is attached during the merge, O(|L|+|R|) per
  * partition after the sorts, with the left side's partitioning
  * preserved for downstream reuse.
  *
  * Semantics (same contract as the composition and DuckDB ASOF):
  * ties (`rightTs == leftTs`) match; NULL keys and NULL timestamps
  * never match (SQL comparison semantics) but left rows still emit.
  *
  * NULL payloads: this operator attaches the matched right row's
  * payload AS IS — a NULL payload value arrives as NULL, which is the
  * correct as-of semantics ("latest right row", not "latest non-NULL
  * value"). The window composition (`ops.AsOfJoin.asOfLeft`) instead
  * requires non-null payloads (its `last(_, ignoreNulls)` carry would
  * substitute the previous match); that precondition applies to the
  * composition only, not here.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute])
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  /** Physical types stored as a primitive int/long in `InternalRow` —
    * these take the primitive merge loop below. Keys and timestamps in
    * practice ARE these (bigint surrogate keys, µs timestamps, days).
    */
  private def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType |
         org.apache.spark.sql.types.DateType => true
    case _ => false
  }

  override protected def doExecute(): RDD[InternalRow] = {
    // plain locals only — the closure must not capture the SparkPlan
    val lOut = left.output
    val rOut = right.output
    val lKeyA = leftKey; val rKeyA = rightKey
    val lTsA = leftTs; val rTsA = rightTs
    val payloadA = payload
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    // primitive fast path: the generic loop pays a boxed `eval` plus a
    // megamorphic Ordering[Any] dispatch per comparison — measured as
    // the dominant cost of the interpreted merge. When both sides'
    // key/ts are the same long-backed primitive type, compare raw
    // getLong/getInt values instead (null-aware, NULLS FIRST — the
    // exact same ordering contract).
    val fast = leftKey.dataType == rightKey.dataType &&
      leftTs.dataType == rightTs.dataType &&
      longBacked(leftKey.dataType) && longBacked(leftTs.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      import org.apache.spark.sql.catalyst.expressions.{BoundReference, Expression}
      val payProj = UnsafeProjection.create(payloadA, rOut)
      // payload side nullable in the OUTPUT (unmatched rows carry NULLs)
      val outAttrs = lOut ++ payloadA.map(_.withNullability(true))
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val nullPay = new GenericInternalRow(payloadA.length)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      if (fast) {
        // ordinal + primitive getter per attribute (int types widen to
        // long; the comparison semantics are identical)
        def acc(attr: Attribute, out: Seq[Attribute]): (Int, InternalRow => Long) = {
          val ord = BindReferences.bindReference(attr: Expression, out)
            .asInstanceOf[BoundReference].ordinal
          attr.dataType match {
            case org.apache.spark.sql.types.IntegerType |
                 org.apache.spark.sql.types.DateType =>
              (ord, (r: InternalRow) => r.getInt(ord).toLong)
            case _ => (ord, (r: InternalRow) => r.getLong(ord))
          }
        }
        val (lkOrd, lkGet) = acc(lKeyA, lOut)
        val (ltOrd, ltGet) = acc(lTsA, lOut)
        val (rkOrd, rkGet) = acc(rKeyA, rOut)
        val (rtOrd, rtGet) = acc(rTsA, rOut)

        var matchPay: InternalRow = null
        var matchKey = 0L
        var hasMatch = false

        lIter.map { lRow =>
          val lkNull = lRow.isNullAt(lkOrd)
          val lk = if (lkNull) 0L else lkGet(lRow)
          val ltNull = lRow.isNullAt(ltOrd)
          val lt = if (ltNull) 0L else ltGet(lRow)
          // advance right while (rk, rt) <= (lk, lt), NULLS FIRST
          var advance = rBuf.hasNext
          while (advance) {
            val head = rBuf.head
            val rkNull = head.isNullAt(rkOrd)
            val c =
              if (rkNull && lkNull) 0
              else if (rkNull) -1
              else if (lkNull) 1
              else java.lang.Long.compare(rkGet(head), lk)
            var cTs = 0
            if (c == 0) {
              val rtNull = head.isNullAt(rtOrd)
              cTs =
                if (rtNull && ltNull) 0
                else if (rtNull) -1
                else if (ltNull) 1
                else java.lang.Long.compare(rtGet(head), lt)
            }
            if (c < 0 || (c == 0 && cTs <= 0)) {
              val r = rBuf.next()
              if (!r.isNullAt(rkOrd) && !r.isNullAt(rtOrd)) {
                matchPay = payProj(r).copy()
                matchKey = rkGet(r)
                hasMatch = true
              }
              advance = rBuf.hasNext
            } else advance = false
          }
          val pay =
            if (hasMatch && !lkNull && matchKey == lk) matchPay
            else nullPay
          outProj(joined(lRow, pay))
        }
      } else {
        val lKey = BindReferences.bindReference(lKeyA: Expression, lOut)
        val lTs = BindReferences.bindReference(lTsA: Expression, lOut)
        val rKey = BindReferences.bindReference(rKeyA: Expression, rOut)
        val rTs = BindReferences.bindReference(rTsA: Expression, rOut)

        // NULLS FIRST, matching the required SortOrder
        def cmp(ord: Ordering[Any], a: Any, b: Any): Int =
          if (a == null && b == null) 0
          else if (a == null) -1
          else if (b == null) 1
          else ord.compare(a, b)

        var matchPay: InternalRow = null // projected payload of the latest match
        var matchKey: Any = null
        var hasMatch = false

        lIter.map { lRow =>
          val lk = lKey.eval(lRow)
          val lt = lTs.eval(lRow)
          // advance right while (rk, rt) <= (lk, lt)
          var advance = rBuf.hasNext
          while (advance) {
            val head = rBuf.head
            val rk = rKey.eval(head)
            val c = cmp(keyOrd.asInstanceOf[Ordering[Any]], rk, lk)
            val rt = if (c == 0) rTs.eval(head) else null
            if (c < 0 || (c == 0 && cmp(tsOrd.asInstanceOf[Ordering[Any]], rt, lt) <= 0)) {
              val r = rBuf.next()
              if (rk != null && (if (c == 0) rt else rTs.eval(r)) != null) {
                matchPay = payProj(r).copy()
                // copy buffer-backed key values (UTF8String/Binary/struct):
                // the sort-spill reader reuses its byte buffer across
                // next() calls, so an uncopied reference would mutate as
                // rBuf advances once the right side spills
                matchKey = InternalRow.copyValue(rk)
                hasMatch = true
              }
              advance = rBuf.hasNext
            } else advance = false
          }
          val pay =
            if (hasMatch && lk != null &&
              cmp(keyOrd.asInstanceOf[Ordering[Any]], matchKey, lk) == 0) matchPay
            else nullPay
          outProj(joined(lRow, pay))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
