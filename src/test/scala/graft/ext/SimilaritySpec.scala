package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {

  private def emb = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0),
      (2L, Array(2.0f, 0.0f, 0.0f, 0.0f), 1),   // parallel to 0
      (3L, Array(1.0f, 1.0f, 0.0f, 0.0f), 1),
      (100L, Array(1.0f, 0.1f, 0.0f, 0.0f), 2)  // query vector (id % 100 == 0)
    ).toDF("vec_id", "embedding", "label")
  }

  test("cosine: parallel vectors -> 1.0, orthogonal -> 0.0 (exact in-order fold)") {
    val c = emb.as("a").join(emb.as("b"),
        col("a.vec_id") === 0 && col("b.vec_id").isin(1L, 2L))
      .select(col("b.vec_id"), Similarity.cosine(col("a.embedding"), col("b.embedding")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(c(2L) == 1.0)
    assert(c(1L) == 0.0)
  }

  test("cosineTopK ranks by similarity with deterministic tie-break, excludes self") {
    val top = Similarity.cosineTopK(emb, col("vec_id") === 100, k = 2)
      .orderBy("rank")
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("rank")))
    // query 100 ~ [1, .1]: nearest are 0 and 2 (cos ~= .995, a tie), tie broken by vec_id
    assert(top.toSeq == Seq((0L, 1L), (2L, 2L)))
  }

  test("TopK aggregator top-k is row-identical to the window-rank cosineTopK") {
    import spark.implicits._
    val rng = new scala.util.Random(21)
    val bigEmb = Seq.tabulate(300) { i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() * 2 - 1), i % 3)
    }.toDF("vec_id", "embedding", "label")
    val win = Similarity.cosineTopK(bigEmb, col("vec_id") % 50 === 0, k = 7)
      .select("query_id", "vec_id", "label", "cos", "rank").collect().map(_.toSeq).toSet
    val agg = graft.ext.TopK.cosineTopKAgg(bigEmb, col("vec_id") % 50 === 0, k = 7)
      .select("query_id", "vec_id", "label", "cos", "rank").collect().map(_.toSeq).toSet
    assert(agg == win)
  }

  test("lshBucket: parallel vectors always share a bucket; buckets are in range") {
    val b = emb.select(col("vec_id"), Similarity.lshBucket(col("embedding"), 8).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b(0L) == b(2L)) // same direction -> same side of every hyperplane
    assert(b.values.forall(x => x >= 0 && x < 256))
  }

  test("embeddingNearDupPairs finds the parallel pair above threshold") {
    val pairs = Similarity.embeddingNearDupPairs(emb, planes = 4, minCos = 0.95)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"), r.getAs[Double]("cos")))
    assert(pairs.exists { case (a, b, c) => a == 0L && b == 2L && c == 1.0 })
  }

  test("annLsh returns an in-bucket top-1 neighbor per query") {
    val out = Similarity.annLsh(emb, col("vec_id") % 100 === 0, planes = 2)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
    out.get(100L).foreach(n => assert(n != 100L))
  }
}
