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

  /** Keeps the k smallest under `gt` (i.e. the top-k by the "better
    * than" relation); insertion keeps the buffer sorted best-first.
    */
  class TopKAgg(k: Int) extends Aggregator[Scored, List[Scored], Seq[Scored]] {
    private def better(a: Scored, b: Scored): Boolean =
      a.cos > b.cos || (a.cos == b.cos && a.vec_id < b.vec_id)

    override def zero: List[Scored] = Nil

    override def reduce(buf: List[Scored], a: Scored): List[Scored] = {
      // insert sorted best-first, cap at k
      val (front, back) = buf.span(better(_, a))
      val merged = front ::: a :: back
      if (merged.length > k) merged.take(k) else merged
    }

    override def merge(b1: List[Scored], b2: List[Scored]): List[Scored] = {
      // merge two sorted lists, cap at k
      val out = List.newBuilder[Scored]
      var (l, r) = (b1, b2)
      var n = 0
      while (n < k && (l.nonEmpty || r.nonEmpty)) {
        if (r.isEmpty || (l.nonEmpty && better(l.head, r.head))) {
          out += l.head; l = l.tail
        } else {
          out += r.head; r = r.tail
        }
        n += 1
      }
      out.result()
    }

    override def finish(reduction: List[Scored]): Seq[Scored] = reduction
    override def bufferEncoder: Encoder[List[Scored]] = Encoders.kryo[List[Scored]]
    override def outputEncoder: Encoder[Seq[Scored]] = Encoders.kryo[Seq[Scored]]
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
      .flatMap { case (_, top) => top.zipWithIndex }
      .select(
        col("_1.query_id").as("query_id"),
        col("_1.vec_id").as("vec_id"),
        col("_1.label").as("label"),
        col("_1.cos").as("cos"),
        (col("_2") + 1).cast("long").as("rank"))
  }
}
