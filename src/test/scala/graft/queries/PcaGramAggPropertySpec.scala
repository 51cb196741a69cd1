package graft.queries

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck laws for [[PcaGramAgg]], the one-pass Gram
  * accumulator both PCA queries run:
  *
  *  1. PARTITION-INVARIANCE — folding any split of the rows into
  *     per-chunk buffers and merging them equals folding the whole
  *     list sequentially. This is the property that makes Spark's
  *     partial aggregation EXACT for this buffer: task boundaries
  *     (and merge order) cannot change a single bit of the sums.
  *  2. DIRECT-FORMULA AGREEMENT — every buffer slot equals the naive
  *     per-row Σ floor(xᵢ·xⱼ·10⁶ + 0.5) (and the mean slots
  *     Σ floor(xᵢ·10⁶ + 0.5), and n the row count): the aggregator
  *     computes exactly the quantity the oracle's relational CTE
  *     sums, just folded in-place.
  *
  * Pure driver-side: reduce/merge/zero are plain functions, so the
  * laws run on thousands of rows without a Spark job.
  */
class PcaGramAggPropertySpec extends AnyFunSuite {

  private val D = 64
  private val rowGen: Gen[Seq[Float]] =
    Gen.listOfN(D, Gen.chooseNum(-1.0f, 1.0f)).map(_.toSeq)
  private val rowsGen: Gen[List[Seq[Float]]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, rowGen))

  private def foldAll(rows: Seq[Seq[Float]]) =
    rows.foldLeft(PcaGramAgg.zero)(PcaGramAgg.reduce)

  private def checkProp(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  test("partition-invariance: chunked fold + merge == sequential fold (ScalaCheck)") {
    val gen = for {
      rows <- rowsGen
      chunk <- Gen.choose(1, 7)
    } yield (rows, chunk)
    checkProp(Prop.forAll(gen) { case (rows, chunk) =>
      val whole = foldAll(rows)
      val merged = rows.grouped(chunk).map(foldAll)
        .foldLeft(PcaGramAgg.zero)(PcaGramAgg.merge)
      whole.n == merged.n &&
        java.util.Arrays.equals(whole.sums, merged.sums) &&
        java.util.Arrays.equals(whole.means, merged.means)
    })
  }

  test("direct-formula agreement: buffer slots == naive quantized sums (ScalaCheck)") {
    checkProp(Prop.forAll(rowsGen) { rows =>
      val b = foldAll(rows)
      val okN = b.n == rows.length.toLong
      val okSums = (0 until D).forall { i =>
        (0 until D).forall { j =>
          b.sums(i * D + j) == rows.map(r =>
            math.floor(r(i).toDouble * r(j).toDouble * 1e6 + 0.5).toLong).sum
        }
      }
      val okMeans = (0 until D).forall { i =>
        b.means(i) == rows.map(r =>
          math.floor(r(i).toDouble * 1e6 + 0.5).toLong).sum
      }
      okN && okSums && okMeans
    })
  }
}
