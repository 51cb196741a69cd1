package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PqIndexSpec extends SparkSpec {

  private def subDf(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "sub")
  }

  test("assign is TRUE L2, not cosine: picks the closer codeword on the same ray") {
    // sub = [2,0]; c0 = [4,0] (distance 2), c1 = [1,0] (distance 1).
    // Both codewords have cosine 1.0 with the input — a cosine argmax
    // with lowest-id ties would pick c0; L2 must pick c1.
    import spark.implicits._
    val cb = Seq((0L, Seq(4f, 0f)), (1L, Seq(1f, 0f))).toDF("code", "c_emb")
    val got = PqIndex.assign(subDf(Seq((7L, Seq(2f, 0f)))), cb)
      .select("vec_id", "code").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == Seq((7L, 1L)))
  }

  test("assign ties break to the lowest code id") {
    // equidistant codewords: [1,0] and [3,0] from [2,0] — score equal,
    // code 0 wins
    import spark.implicits._
    val cb = Seq((0L, Seq(3f, 0f)), (1L, Seq(1f, 0f))).toDF("code", "c_emb")
    val got = PqIndex.assign(subDf(Seq((7L, Seq(2f, 0f)))), cb)
      .select("code").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L))
  }

  test("trainSubspace converges to the two cluster means on a separable fixture") {
    // two tight 2-d clusters around (0, 10) and (10, 0); seeds are the
    // two lowest vec_ids (one from each cluster) so one iteration
    // already partitions them; the trained codewords are the exact
    // quantized-integer means of each cluster
    val rows = Seq(
      (0L, Seq(0f, 10f)), (1L, Seq(10f, 0f)),
      (2L, Seq(0f, 12f)), (3L, Seq(12f, 0f)),
      (4L, Seq(0f, 8f)), (5L, Seq(8f, 0f)))
    val cb = PqIndex.trainSubspace(subDf(rows), kp = 2, iters = 2, dim = 2)
      .orderBy("code").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq))
    assert(cb.toSeq == Seq((0L, Seq(0f, 10f)), (1L, Seq(10f, 0f))))
  }

  test("training is input-order independent (seeds keyed by vec_id, means exact)") {
    val rows = Seq(
      (0L, Seq(1f, 2f)), (1L, Seq(5f, 1f)), (2L, Seq(1.5f, 2.5f)),
      (3L, Seq(4.5f, 0.5f)), (4L, Seq(0.5f, 1.5f)))
    val fwd = PqIndex.trainSubspace(subDf(rows), 2, 2, 2).orderBy("code").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val rev = PqIndex.trainSubspace(subDf(rows.reverse), 2, 2, 2).orderBy("code").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    assert(fwd == rev)
  }
}
