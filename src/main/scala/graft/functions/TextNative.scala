package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native twins of the text-analysis hot loops in `graft.ext.TextOps`
  * — each evaluates ONCE per document with a tight JVM loop inside,
  * replacing per-element interpreted higher-order-function lambdas.
  *
  * Why this matters (measured, see MinhashSignatures): HOF lambda
  * bodies run on the interpreted expression evaluator — µs-scale
  * polymorphic `eval()` dispatch per array element, which additionally
  * degrades ~100× once those call sites go megamorphic from many
  * distinct plans in one JVM (exactly the bench/verify situation: 39
  * query plans warmed then timed in a single session). A per-document
  * CodegenFallback expression has one dispatch per row and monomorphic
  * inner loops, immune to both.
  *
  * Every expression here is VALUE-IDENTICAL to its declarative twin in
  * `TextOps` (kept for spec cross-checks) and therefore to the DuckDB
  * oracle SQL that mirrors that twin: md5 hex prefixes are digest
  * bytes, `ascii` of a hex char is derived from the nibble, folds run
  * in array order with the same modulus.
  */
object TextNative {
  /** Hex chars of a digest byte's two nibbles, as ascii codes
    * ('0'..'9' → 48..57, 'a'..'f' → 97..102).
    */
  @inline def nibbleAscii(nibble: Int): Int = if (nibble < 10) 48 + nibble else 87 + nibble

  val HexDigits = "0123456789abcdef".toCharArray

  def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  def checkTokens(e: Expression, name: String): TypeCheckResult = e.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$name requires array<string>, got ${other.simpleString}")
  }
}

/** `word_shingles(tokens, n)` — space-joined word n-grams, the native
  * twin of `TextOps.shingles`: shingle i = `tokens[i] || " " || ... ||
  * tokens[i+n-1]`, NULL when any token in the window is NULL (matching
  * [[MinShingle]]/[[MinhashSignatures]] and the DuckDB `||` oracle,
  * which all NULL-propagate), empty array when there are fewer than n
  * tokens. `TextOps.tokens` (split) never yields NULL elements, so the
  * NULL branch only fires for caller-supplied token arrays.
  */
case class WordShingles(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    if (right.dataType == IntegerType && right.foldable) TextNative.checkTokens(left, prettyName)
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<string>, foldable int)")

  private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(toksVal: Any, nVal: Any): Any = {
    val toks = toksVal.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val strs = new Array[UTF8String](m)
    var i = 0
    while (i < m) { strs(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i); i += 1 }
    val out = new Array[Any](m - n + 1)
    val sep = UTF8String.fromString(" ")
    i = 0
    while (i <= m - n) {
      // `||` semantics: any NULL token NULLs the whole shingle
      val parts = new Array[UTF8String](n)
      var t = 0
      var anyNull = false
      while (t < n) {
        parts(t) = strs(i + t)
        anyNull ||= parts(t) == null
        t += 1
      }
      out(i) = if (anyNull) null else UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordShingles =
    copy(left = l, right = r)
}

/** `simhash16(tokens)` — the 16-bit SimHash of `TextOps.simhash16`:
  * bit b set iff Σ over tokens of ±1 is ≥ 0, where +1 iff hex digit b
  * of md5(token) is ≥ '8' (i.e. the b-th nibble ≥ 8). A NULL token
  * contributes -1 to every bit (the declarative `when` falls through
  * to the otherwise branch on NULL).
  */
case class SimHash16(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "simhash16"
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = TextNative.checkTokens(child, prettyName)

  override def nullSafeEval(toksVal: Any): Any = {
    val toks = toksVal.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val sums = new Array[Int](16)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < m) {
      if (toks.isNullAt(i)) {
        var b = 0
        while (b < 16) { sums(b) -= 1; b += 1 }
      } else {
        val d = md.digest(toks.getUTF8String(i).getBytes)
        var b = 0
        while (b < 16) {
          val nibble = if (b % 2 == 0) (d(b / 2) >> 4) & 0xf else d(b / 2) & 0xf
          sums(b) += (if (nibble >= 8) 1 else -1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0
    var b = 0
    while (b < 16) { if (sums(b) >= 0) out |= 1 << b; b += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): SimHash16 = copy(child = c)
}

/** `rolling_hash(tokens)` — `TextOps.rollingHash`: in-order fold
  * `(acc·131 + tokenInt) mod 1e9+7` from 0, where tokenInt packs the
  * ASCII codes of the first four hex chars of md5(token) as
  * `a0·10^6 + a1·10^4 + a2·10^2 + a3`. NULL on any NULL token (the
  * declarative fold's accumulator goes NULL and stays NULL).
  */
case class RollingHash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rolling_hash"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = TextNative.checkTokens(child, prettyName)

  override def nullSafeEval(toksVal: Any): Any = {
    val toks = toksVal.asInstanceOf[ArrayData]
    val m = toks.numElements()
    val md = MessageDigest.getInstance("MD5")
    var acc = 0L
    var i = 0
    while (i < m) {
      if (toks.isNullAt(i)) return null
      val d = md.digest(toks.getUTF8String(i).getBytes)
      val a0 = TextNative.nibbleAscii((d(0) >> 4) & 0xf).toLong
      val a1 = TextNative.nibbleAscii(d(0) & 0xf).toLong
      val a2 = TextNative.nibbleAscii((d(1) >> 4) & 0xf).toLong
      val a3 = TextNative.nibbleAscii(d(1) & 0xf).toLong
      val tokenInt = a0 * 1000000L + a1 * 10000L + a2 * 100L + a3
      acc = (acc * 131L + tokenInt) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
}

/** `min_shingle(tokens, n)` — lexicographic minimum of the md5 hex
  * fingerprints of the word-n-shingles (`array_min` over
  * `transform(shingles, md5)`); NULL when there are no shingles.
  * Equal-length lowercase hex strings order exactly like their digest
  * bytes compared unsigned, so the min is taken on raw digests and
  * hex-encoded once at the end.
  */
case class MinShingle(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "min_shingle"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (right.dataType == IntegerType && right.foldable) TextNative.checkTokens(left, prettyName)
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<string>, foldable int)")

  private lazy val n: Int = right.eval().asInstanceOf[Int]
  private val Space = Array[Byte](' ')

  override def nullSafeEval(toksVal: Any, nVal: Any): Any = {
    val toks = toksVal.asInstanceOf[ArrayData]
    val m = toks.numElements()
    if (m < n) return null
    val bytes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      bytes(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i).getBytes
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    var min: Array[Byte] = null
    i = 0
    while (i <= m - n) {
      var nullTok = false
      var t = 0
      while (t < n && !nullTok) { nullTok = bytes(i + t) == null; t += 1 }
      if (!nullTok) { // NULL-token shingle → NULL md5, skipped by array_min
        t = 0
        while (t < n) {
          if (t > 0) md.update(Space)
          md.update(bytes(i + t))
          t += 1
        }
        val d = md.digest()
        if (min == null || unsignedLt(d, min)) min = d
      }
      i += 1
    }
    if (min == null) null else UTF8String.fromString(TextNative.hex(min))
  }

  private def unsignedLt(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinShingle =
    copy(left = l, right = r)
}

/** `count_in_set(tokens, set)` — `size(filter(tokens, t ->
  * t IN set))` with a foldable set: the marker/stopword counter.
  */
case class CountInSet(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "count_in_set"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, foldable array<string>)")
    }

  private lazy val set: java.util.HashSet[UTF8String] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    val s = new java.util.HashSet[UTF8String](arr.numElements() * 2)
    var i = 0
    while (i < arr.numElements()) { s.add(arr.getUTF8String(i)); i += 1 }
    s
  }

  override def nullSafeEval(toksVal: Any, setVal: Any): Any = {
    val toks = toksVal.asInstanceOf[ArrayData]
    var cnt = 0
    var i = 0
    while (i < toks.numElements()) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountInSet =
    copy(left = l, right = r)
}

/** `token_len_sum(tokens)` — `aggregate(tokens, 0L, (acc, t) -> acc +
  * length(t))`: total character count; NULL on any NULL token (the
  * declarative accumulator nulls out).
  */
case class TokenLenSum(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "token_len_sum"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = TextNative.checkTokens(child, prettyName)

  override def nullSafeEval(toksVal: Any): Any = {
    val toks = toksVal.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    while (i < toks.numElements()) {
      if (toks.isNullAt(i)) return null
      acc += toks.getUTF8String(i).numChars()
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression): TokenLenSum = copy(child = c)
}

/** `char_rolling_hash(s)` — `aggregate(sequence(1, length(s)), 0L,
  * (acc, i) -> (acc·131 + ascii(substring(s, i, 1))) mod 1e9+7)`: the
  * multimodal payload checksum. Iterates bytes, which equals the
  * per-character `ascii` fold for ASCII payloads (the synthetic corpus
  * is ASCII-only; `ascii` = code point = byte there).
  */
case class CharRollingHash(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "char_rolling_hash"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(sVal: Any): Any = {
    val bytes = sVal.asInstanceOf[UTF8String].getBytes
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 131L + (bytes(i) & 0xffL)) % 1000000007L
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(c: Expression): CharRollingHash = copy(child = c)
}

/** `lsh_bucket(embedding, planes)` — `Similarity.lshBucket`: bit j of
  * the bucket id is the sign (≥ 0) of the in-order projection
  * Σ_i double(emb[i]) · w(i, j), with the shared ±1 pseudo-random
  * hyperplane weight `((i·1103515245 + j·12345) mod 65537) mod 2 == 0
  * → +1 else -1`. Bit-identical to the declarative fold (float×(±1.0)
  * widened to double is exact; same accumulation order).
  */
case class LshBucket(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "lsh_bucket"
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, foldable int)")
    }

  private lazy val planes: Int = right.eval().asInstanceOf[Int]

  override def nullSafeEval(embVal: Any, planesVal: Any): Any = {
    val emb = embVal.asInstanceOf[ArrayData]
    val n = emb.numElements()
    var bucket = 0
    var j = 0
    while (j < planes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val w = if ((i.toLong * 1103515245L + j * 12345L) % 65537L % 2L == 0L) 1.0 else -1.0
        proj += emb.getFloat(i).toDouble * w
        i += 1
      }
      if (proj >= 0) bucket |= 1 << j
      j += 1
    }
    bucket
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): LshBucket =
    copy(left = l, right = r)
}
