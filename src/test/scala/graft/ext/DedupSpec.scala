package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (0L, "spark reads parquet files fast and scans columns quickly today"),
      (1L, "spark reads parquet files fast and scans columns quickly today"), // exact dup of 0
      (2L, "spark reads parquet files fast and scans columns quickly now"),   // near dup of 0 (last token differs)
      (3L, "completely different content about streams windows and state stores")
    ).toDF("doc_id", "text")
  }

  test("exactDupRank: duplicate texts share a group; first doc_id is the keeper") {
    val out = Dedup.exactDupRank(corpus)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("group_size"), r.getAs[Int]("dup_rank"), r.getAs[String]("is_dup")))).toMap
    assert(out(0L) == ((2L, 1, "N")))
    assert(out(1L) == ((2L, 2, "Y")))
    assert(out(2L) == ((1L, 1, "N")))
  }

  test("minhash LSH: exact dups share all bands; near-dups share some; unrelated docs none") {
    val banded = Dedup.minhashBands(corpus, n = 3, k = 8, bands = 4)
    val pairs = Dedup.minhashCandidates(banded)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 1L)) == 4L) // identical signatures -> all 4 bands
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("ngramJaccard: identical docs = 1.0, near-dups in (0,1), computed over distinct shingles") {
    val out = Dedup.ngramJaccardPairs(corpus, n = 3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r.getAs[Double]("jaccard")).toMap
    assert(out((0L, 1L)) == 1.0)
    val near = out((0L, 2L))
    assert(near > 0.0 && near < 1.0)
  }

  test("editDistancePairs: exact dup = 0 edits / sim 1.0; near-dup's distance = its literal edit") {
    val out = Dedup.editDistancePairs(corpus, n = 3, prefixLen = 60)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        ((r.getAs[Long]("edit_dist"), r.getAs[Double]("edit_sim")))).toMap
    assert(out((0L, 1L)) == ((0L, 1.0)))
    // docs 0/2 differ only past the 60-char prefix boundary: "today"
    // vs "now" starts at char 58, so the 60-char prefixes differ in
    // their last 2 chars ("to" vs "no" -> 2 substitutions)
    val (d02, s02) = out((0L, 2L))
    assert(d02 == 2L && s02 > 0.9 && s02 < 1.0)
  }

  test("band blocking shrinks the max block vs first-token blocking on a skewed corpus") {
    import spark.implicits._
    // 24 distinct docs that all START with "the": a first-token block
    // key concentrates everything onto one hot bucket (the scale
    // killer band keys avoid — md5-uniform, content-sensitive)
    val skewed = (0L until 24L)
      .map(i => (i, s"the document number $i talks about topic$i uniquely and differs"))
      .toDF("doc_id", "text")
    val firstTokenMax = skewed
      .select(element_at(TextOps.tokens(col("text")), 1).as("block"))
      .groupBy("block").count().agg(max("count")).as[Long].head()
    assert(firstTokenMax == 24L)
    val banded = Dedup.minhashBands(skewed, n = 3, k = 8, bands = 4)
    val bandMax = Dedup.explodedBands(banded).filter(col("key").isNotNull)
      .groupBy("band", "key").count().agg(max("count")).as[Long].head()
    assert(bandMax < firstTokenMax,
      s"band buckets (max $bandMax) should be smaller than the hot first-token block ($firstTokenMax)")
  }

  test("connectedComponents: transitive chains collapse to the min doc_id") {
    import spark.implicits._
    // chain 1-2-3-4 (1~2, 2~3, 3~4: transitivity must group all four,
    // even though 1 and 4 never paired), separate pair 10-11, and a
    // doc 99 absent from every pair (must NOT appear in the output)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("connectedComponents: pointer jumping converges a 60-node chain within maxIter=20") {
    import spark.implicits._
    // a pure chain maximizes diameter: one-hop propagation would need
    // 59 rounds (> maxIter) — the label-of-label jump must get there
    // in O(log n) rounds instead
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(chain)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("comp")).toMap
    assert(got.size == 60)
    assert(got.values.forall(_ == 0L))
  }

  test("simhashBuckets: identical docs share a bucket and are flagged") {
    val out = Dedup.simhashBuckets(corpus)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("simhash"), r.getAs[Long]("bucket_size")))).toMap
    assert(out(0L)._1 == out(1L)._1)
    assert(out(0L)._2 >= 2L)
  }
}
