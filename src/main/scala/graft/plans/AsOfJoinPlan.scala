package graft.plans

import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical AS-OF LEFT JOIN: for each left row, attach the payload of
  * the single right row with the greatest `rightTs <= leftTs` among
  * rows sharing the key (NULL payload when none). The whole-operator
  * counterpart of the `ops.AsOfJoin` window composition — planned by
  * [[AsOfJoinStrategy]] into [[AsOfJoinExec]]'s one co-partitioned
  * sort-merge pass.
  *
  * This is the SURVEY §7.4 "custom operator" path exercised for real:
  * custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered
  * through `SparkSessionExtensions`
  * (`graft.functions.GraftExtensions`).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    rightKey: Attribute,
    leftTs: Attribute,
    rightTs: Attribute,
    payload: Seq[Attribute])
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
