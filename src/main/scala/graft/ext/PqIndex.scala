package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** Product-quantization codebook training + encoding — the 16×
  * compression step beyond SQ8 (`x_embed_quantize` keeps 64 int8
  * codes per vector; PQ keeps M=4 one-byte codewords): split each
  * vector into M contiguous subspaces, k-means each subspace into k'
  * codewords, store each vector as its M nearest-codeword ids
  * (Jégou et al. 2011). The decoded approximation is the
  * concatenation of the M codewords; how much cosine that loses is
  * the MEASURED number (`x_pq_quality`), not an assumption.
  *
  * Deterministic by the same constructions as [[IvfIndex]]:
  *  - seeds = the k' lowest-vec_id subvectors, relabeled 0..k'-1;
  *  - assignment is true L2 (not spherical): argmin ‖sub − c‖² ≡
  *    argmax (dot(sub, c) − ½‖c‖²) with the constant ‖sub‖² dropped —
  *    stated as a rank window (ties to lowest code id), the form both
  *    engines share bit-for-bit;
  *  - means are the quantized-integer per-dimension averages
  *    (exact BIGINT sums ÷ counts), so parallel aggregation order
  *    cannot move a bit.
  *
  * Scale posture: PQ codebooks are tiny (M·k' rows) and in practice
  * train on a bounded SAMPLE of the corpus (a few 100k vectors) —
  * one window shuffle of sample×k' rows per iteration per subspace
  * here, sample-bounded at any corpus size. The corpus ENCODE pass
  * runs once per snapshot into stored state ([[graft.queries.ExtQueries]]
  * keeps it in `RelationStore`), so query-time consumers scan codes,
  * never embeddings; a 100 TB encode pass would use the map-side
  * argmax-CASE shape ([[IvfIndex.withCell]]'s) against the broadcast
  * pivoted codebook — same algebra, zero shuffle.
  */
object PqIndex {

  private val QuantScale = 1e6
  private def quant(x: Column): Column =
    floor(x.cast(DoubleType) * lit(QuantScale) + lit(0.5))

  /** L2 nearest-code assignment of (vec_id, sub) rows against a
    * (code, c_emb) codebook: argmax(dot − ½‖c‖²), ties to lowest
    * code. Returns (vec_id, sub, code).
    */
  def assign(sub: DataFrame, cb: DataFrame): DataFrame = {
    val byVec = Window.partitionBy("vec_id")
      .orderBy(col("pq_score").desc, col("code"))
    sub.crossJoin(broadcast(cb))
      .withColumn("pq_score",
        Similarity.dot(col("sub"), col("c_emb")) -
          lit(0.5) * Similarity.dot(col("c_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(byVec))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("sub"), col("code"))
  }

  /** Train one subspace codebook: seed from the k' lowest-vec_id
    * subvectors, then `iters` L2-Lloyd steps. A codeword that loses
    * all members mid-training drops out (its groupBy row vanishes) —
    * both engines agree. `sub`: (vec_id, sub). Returns (code, c_emb).
    */
  def trainSubspace(sub: DataFrame, kp: Int, iters: Int, dim: Int): DataFrame = {
    var cb: DataFrame = sub.orderBy("vec_id").limit(kp)
      .select(
        (row_number().over(Window.orderBy("vec_id")) - 1).cast("long").as("code"),
        col("sub").as("c_emb"))
      .localCheckpoint() // k' rows — hyperparameter-sized
    for (_ <- 0 until iters) {
      val sums = (0 until dim).map(d =>
        sum(quant(element_at(col("sub"), d + 1))).as(s"pq_s$d"))
      val means = (0 until dim).map(d =>
        (col(s"pq_s$d").cast(DoubleType) / col("pq_cnt").cast(DoubleType) /
          lit(QuantScale)).cast(FloatType))
      cb = assign(sub, cb)
        .groupBy(col("code"))
        .agg(count(lit(1)).as("pq_cnt"), sums: _*)
        .select(col("code"), array(means: _*).as("c_emb"))
        .localCheckpoint() // k' rows
    }
    cb
  }
}
