package graft.ext

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per key as a typed `Aggregator` — the scale-correct
  * alternative to the `row_number().over(Window)` pattern: a window
  * rank sorts and materializes EVERY candidate per key (O(n log n),
  * full spill surface) where a bounded aggregation buffer keeps only k
  * rows per key at any moment (O(n log k), map-side partial
  * aggregation shrinks the shuffle to ≤ k rows per key per map task).
  *
  * Deterministic: ordered by (cos DESC, vec_id ASC) — exactly the
  * window/oracle tie-break, so [[cosineTopKAgg]] is row-identical to
  * `Similarity.cosineTopK`.
  */
object TopK {

  case class Scored(query_id: Long, vec_id: Long, label: Int, cos: Double)

  /** Product-encoded aggregation buffer: a case class around the
    * best-first row list, so the buffer serializes through Tungsten's
    * struct/array layout (compact, columnar-shuffle-friendly) instead
    * of an opaque Kryo blob.
    */
  case class TopBuf(items: Seq[Scored])

  /** Keeps the k smallest under `gt` (i.e. the top-k by the "better
    * than" relation); insertion keeps the buffer sorted best-first.
    */
  class TopKAgg(k: Int) extends Aggregator[Scored, TopBuf, TopBuf] {
    private def better(a: Scored, b: Scored): Boolean =
      a.cos > b.cos || (a.cos == b.cos && a.vec_id < b.vec_id)

    override def zero: TopBuf = TopBuf(Nil)

    override def reduce(buf: TopBuf, a: Scored): TopBuf = {
      // insert sorted best-first, cap at k
      val (front, back) = buf.items.span(better(_, a))
      val merged = (front :+ a) ++ back
      TopBuf(if (merged.length > k) merged.take(k) else merged)
    }

    override def merge(b1: TopBuf, b2: TopBuf): TopBuf = {
      // merge two sorted seqs, cap at k
      val out = Seq.newBuilder[Scored]
      var (l, r) = (b1.items, b2.items)
      var n = 0
      while (n < k && (l.nonEmpty || r.nonEmpty)) {
        if (r.isEmpty || (l.nonEmpty && better(l.head, r.head))) {
          out += l.head; l = l.tail
        } else {
          out += r.head; r = r.tail
        }
        n += 1
      }
      TopBuf(out.result())
    }

    override def finish(reduction: TopBuf): TopBuf = reduction
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }

  /** Row-identical twin of `Similarity.cosineTopK` built on the
    * bounded aggregator instead of a window rank.
    */
  def cosineTopKAgg(emb: DataFrame, queryPred: org.apache.spark.sql.Column, k: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = emb.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        Similarity.norm(col("embedding")).as("q_norm"))
    val scored = emb
      .select(col("vec_id"), col("embedding"), col("label"),
        Similarity.norm(col("embedding")).as("c_norm"))
      .join(broadcast(q), col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id"), col("label"),
        Similarity.cosineWithNorms(col("q_emb"), col("embedding"),
          col("q_norm"), col("c_norm")).as("cos"))
      .as[Scored]
    scored.groupByKey(_.query_id)
      .agg(new TopKAgg(k).toColumn.name("top"))
      .flatMap { case (_, top) => top.items.zipWithIndex }
      .select(
        col("_1.query_id").as("query_id"),
        col("_1.vec_id").as("vec_id"),
        col("_1.label").as("label"),
        col("_1.cos").as("cos"),
        (col("_2") + 1).cast("long").as("rank"))
  }
}
