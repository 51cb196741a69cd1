package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

import graft.ext.TextOps

/** `minhash_sigs(tokens, n, k)` — all `k` MinHash signature elements
  * over the word-`n`-shingles of a token array, in ONE native pass:
  * for each shingle, MD5 over the space-joined token bytes (streamed
  * into the digest — no shingle string is ever materialized), first
  * 4 digest bytes as the 32-bit shingle hash, then `k` affine mixes
  * `(A_j·h + B_j) mod (2^31-1)` folded into running minima.
  *
  * Value-identical to the declarative pipeline
  * `TextOps.shingles(toks, n)` → `TextOps.shingleHash` →
  * `TextOps.minhashFromHashes(_, j)` for each j, and to the DuckDB
  * oracle that mirrors it: UTF-8 concatenation commutes with MD5, and
  * the first 8 hex chars of a digest ARE its first 4 bytes. Returns
  * NULL when there are fewer than `n` tokens (the declarative form's
  * empty shingle array → `array_min` = NULL for every signature).
  *
  * Why native instead of higher-order functions: HOF lambda bodies are
  * evaluated by the interpreted expression evaluator, per element —
  * k·|shingles| polymorphic eval() calls per document. Beyond the
  * steady-state cost, those call sites go megamorphic as more plans
  * run in the JVM and fall off the JIT cliff (measured: the same
  * stage at 8 CPU-s on first execution, 800+ CPU-s later in the same
  * JVM). This expression is ONE eval() per document wrapping a tight
  * monomorphic loop, immune to both. CodegenFallback is fine at
  * per-document granularity.
  */
case class MinhashSignatures(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {

  override def prettyName: String = "minhash_sigs"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "minhash_sigs requires (array<string> tokens, foldable int n, foldable int k)")
    }

  private lazy val n: Int = second.eval().asInstanceOf[Int]
  private lazy val k: Int = third.eval().asInstanceOf[Int]
  private lazy val as: Array[Long] = Array.tabulate(k)(TextOps.minhashA)
  private lazy val bs: Array[Long] = Array.tabulate(k)(TextOps.minhashB)
  private val Space = Array[Byte](' ')

  override def nullSafeEval(toksVal: Any, nVal: Any, kVal: Any): Any = {
    val toks = toksVal.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return null
    // token bytes fetched once; shingle i spans tokens [i, i+n)
    val bytes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      bytes(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill(k)(Long.MaxValue)
    var sawValue = false
    i = 0
    while (i <= m - n) {
      var nullTok = false
      var t = 0
      while (t < n && !nullTok) { nullTok = bytes(i + t) == null; t += 1 }
      if (!nullTok) { // a NULL token nulls its shingle → skipped by min
        sawValue = true
        t = 0
        while (t < n) {
          if (t > 0) md.update(Space)
          md.update(bytes(i + t))
          t += 1
        }
        val d = md.digest() // resets the digest
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var j = 0
        while (j < k) {
          val v = (h * as(j) + bs(j)) % TextOps.MinhashP
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!sawValue) null else new GenericArrayData(mins)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): MinhashSignatures =
    copy(first = newFirst, second = newSecond, third = newThird)
}
