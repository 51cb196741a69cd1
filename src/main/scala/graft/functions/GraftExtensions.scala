package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension installing graft's native functions into the
  * Catalyst function registry (usable from both the Column API via
  * `call_function` and plain SQL). Wired by `graft.GraftSession`;
  * external users can also opt in with
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getCanonicalName, "vector_dot"),
      (children: Seq[Expression]) => VectorDot(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinhashSignatures].getCanonicalName, "minhash_sigs"),
      (children: Seq[Expression]) => MinhashSignatures(children(0), children(1), children(2))))
    def unary(name: String, cls: Class[_], f: Expression => Expression): Unit =
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(cls.getCanonicalName, name),
        (children: Seq[Expression]) => f(children.head)))
    def binary(name: String, cls: Class[_], f: (Expression, Expression) => Expression): Unit =
      ext.injectFunction((new FunctionIdentifier(name),
        new ExpressionInfo(cls.getCanonicalName, name),
        (children: Seq[Expression]) => f(children(0), children(1))))
    binary("word_shingles", classOf[WordShingles], WordShingles.apply)
    unary("simhash16", classOf[SimHash16], SimHash16.apply)
    unary("rolling_hash", classOf[RollingHash], RollingHash.apply)
    binary("min_shingle", classOf[MinShingle], MinShingle.apply)
    binary("count_in_set", classOf[CountInSet], CountInSet.apply)
    unary("token_len_sum", classOf[TokenLenSum], TokenLenSum.apply)
    unary("char_rolling_hash", classOf[CharRollingHash], CharRollingHash.apply)
    binary("lsh_bucket", classOf[LshBucket], LshBucket.apply)
    // whole-operator extension: logical AsOfJoinPlan -> AsOfJoinExec
    ext.injectPlannerStrategy(_ => new graft.plans.AsOfJoinStrategy)
  }
}
