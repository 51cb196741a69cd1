package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val SfDir = "/root/testdata/sf0.001"

  /** 4 tight cosine clusters of 100 in 64-dim, with vec_ids 0..99 ALL
    * in cluster 0 — the lowest-id seed rule is maximally pathological
    * (every seed starts inside one cluster). Cluster-0 jitter points
    * along the other clusters' axes so seeds attract foreign clusters
    * differentially — the condition under which Lloyd provably
    * separates the cells (an isotropic-jitter seed merges two foreign
    * clusters into one cell and no iteration count recovers; k-means
    * cannot split a merged cell).
    */
  private lazy val clustered: DataFrame = {
    val rows = (0 until 400).map { i =>
      val c = i / 100
      val v = Array.fill(64)(0.0f)
      v(c) = 1.0f
      if (c == 0 && i % 4 != 0) v(i % 4) = 0.4f
      v(32 + (i % 8)) = 0.05f
      (i.toLong, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .withColumn("v_norm", Similarity.norm(col("embedding")))
  }

  private def occupancy(emb: DataFrame, cents: DataFrame, k: Int): Seq[Long] =
    IvfIndex.withCell(emb, cents, k).groupBy("cell").count()
      .collect().map(_.getLong(1)).sorted.reverse.toSeq

  test("training balances cell occupancy on clustered data (seed max/mean 1.25 -> 1.0)") {
    val seedOcc = occupancy(clustered, IvfIndex.seed(clustered, 4), 4)
    assert(seedOcc == Seq(125L, 125L, 125L, 25L), s"fixture drifted: $seedOcc")
    val trainedOcc = occupancy(clustered, IvfIndex.train(clustered, 4, 2, 64), 4)
    assert(trainedOcc == Seq(100L, 100L, 100L, 100L), s"trained: $trainedOcc")
    // the quantity the 100 TB story cares about: the hottest cell
    // (= hottest probe bucket) shrinks toward the mean
    assert(trainedOcc.max < seedOcc.max)
  }

  test("training is a fixed point once converged (iters 2 == iters 3 occupancy)") {
    val o2 = occupancy(clustered, IvfIndex.train(clustered, 4, 2, 64), 4)
    val o3 = occupancy(clustered, IvfIndex.train(clustered, 4, 3, 64), 4)
    assert(o2 == o3)
  }

  test("assignment is map-side: no shuffle, no window over the corpus") {
    val emb = Tables.embeddings(spark, SfDir)
      .withColumn("v_norm", Similarity.norm(col("embedding")))
    val p = IvfIndex.withCell(emb, IvfIndex.seed(emb, 8), 8)
      .queryExecution.executedPlan.toString
    // the scale contract: centroids arrive by broadcast only; the
    // corpus is never shuffled or window-ranked to pick its cell (the
    // k-row crossJoin + row_number form would shuffle a k-times
    // fan-out through hashpartitioning(vec_id))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"), p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    assert(!p.contains("Window"), p)
  }

  test("withCell CASE-chain argmax == window-rank argmax (real embeddings, trained centroids)") {
    val emb = Tables.embeddings(spark, SfDir)
      .withColumn("v_norm", Similarity.norm(col("embedding")))
    val cents = IvfIndex.train(emb, 8, 2, 64)
    val viaCase = IvfIndex.withCell(emb, cents, 8)
      .select("vec_id", "cell")
    val rel = IvfIndex.centroidRelation(cents, 8)
    val viaRank = emb.crossJoin(broadcast(rel))
      .withColumn("cos_c", Similarity.cosineWithNorms(
        col("embedding"), col("c_emb"), col("v_norm"), col("c_norm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos_c").desc, col("c_id"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("c_id").as("cell"))
    assert(viaCase.exceptAll(viaRank).isEmpty && viaRank.exceptAll(viaCase).isEmpty)
  }

  test("probeCells nprobe=2 == window rank <= 2 (cells per query, both ranks)") {
    val emb = Tables.embeddings(spark, SfDir)
      .withColumn("v_norm", Similarity.norm(col("embedding")))
    val cents = IvfIndex.train(emb, 8, 2, 64)
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select("vec_id", "embedding", "v_norm")
    val viaProbe = IvfIndex.probeCells(q, cents, 8, nprobe = 2)
      .select("vec_id", "cell", "cell_rank")
    val rel = IvfIndex.centroidRelation(cents, 8)
    val viaRank = q.crossJoin(broadcast(rel))
      .withColumn("cos_c", Similarity.cosineWithNorms(
        col("embedding"), col("c_emb"), col("v_norm"), col("c_norm")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos_c").desc, col("c_id"))))
      .filter(col("rn") <= 2)
      .select(col("vec_id"), col("c_id").as("cell"), col("rn").as("cell_rank"))
    assert(viaProbe.exceptAll(viaRank).isEmpty && viaRank.exceptAll(viaProbe).isEmpty)
  }

  test("IvfStore: persisted index is complete, replicated, memoized, and staged atomically") {
    val emb = Tables.embeddings(spark, SfDir)
      .withColumn("v_norm", Similarity.norm(col("embedding")))
    IvfStore.reset()
    val st = IvfStore.ensure(emb, key = s"$SfDir-ivfstore-spec",
      k = 4, iters = 2, nassign = 2, dim = 64)
    // memoized: the second call returns the SAME stored paths without
    // a rebuild (same JVM, same corpus key)
    assert(IvfStore.ensure(emb, s"$SfDir-ivfstore-spec", 4, 2, 2, 64) eq st)
    // no staging debris: a completed build leaves only the final dir
    val parent = new java.io.File(st.assignedPath).getParentFile
    assert(parent.getName.nonEmpty && !parent.getName.endsWith(".build"))
    assert(!new java.io.File(parent.getPath + ".build").exists())
    // replicated assignment: every corpus vector appears exactly
    // nassign times, once per rank, in two DISTINCT cells
    val a = spark.read.parquet(st.assignedPath)
    val n = emb.count()
    assert(a.count() == 2 * n)
    assert(a.groupBy("vec_id").agg(
        countDistinct(col("cell_rank")).as("ranks"),
        countDistinct(col("cell")).as("cells"))
      .filter(col("ranks") =!= 2 || col("cells") =!= 2).isEmpty)
    // rank-1 rows reproduce the primary (withCell) assignment exactly
    val trained = IvfIndex.pivotRow(
      spark.read.parquet(st.centroidsPath).select("c_id", "c_emb"), 4)
    val primary = IvfIndex.withCell(emb, trained, 4).select("vec_id", "cell")
    val stored1 = a.filter(col("cell_rank") === 1).select("vec_id", "cell")
    assert(stored1.exceptAll(primary).isEmpty && primary.exceptAll(stored1).isEmpty)
  }

  test("kFor shares the store lifecycle: frozen until reset, refreshed with the index") {
    IvfStore.reset()
    var n = 100
    def k = IvfStore.kFor("kfor-spec-corpus")(
      math.max(12, math.floor(math.sqrt(n.toDouble) + 0.5).toInt))
    assert(k == 12)
    // corpus grows under the same key mid-process: serving k must stay
    // consistent with the FROZEN stored index, not the new count
    n = 90000
    assert(k == 12)
    // an in-process corpus rebuild invalidates index and k TOGETHER
    IvfStore.reset()
    assert(k == 300)
    IvfStore.reset()
  }

  test("stored index keeps measured recall@1 at nprobe=2 >= 0.6 (the r4-verdict serving bar)") {
    // the quality contract boundary replication + k=12/iters=10 was
    // chosen to clear (sweep in PLANS.md): sf0.001 measures 0.72 at
    // nprobe=2 — a regression in training, replication, or probe
    // resolution that costs more than ~3 of 25 queries fails here
    val rows = graft.queries.ExtQueries.xAnnRecall(spark, SfDir).collect()
      .map(r => r.getAs[Int]("nprobe") -> r.getAs[Double]("recall")).toMap
    assert(rows(2) >= 0.6, s"recall@1 at nprobe=2 fell to ${rows(2)}")
    assert(rows(1) <= rows(2), s"probing MORE cells cannot lower recall: $rows")
  }

  test("IvfStore: an OUT-OF-CORPUS query probes via the stored centroids, no retrain") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, SfDir)
      .withColumn("v_norm", Similarity.norm(col("embedding")))
    val st = IvfStore.ensure(emb, key = s"$SfDir-ivfstore-oov",
      k = 4, iters = 2, nassign = 2, dim = 64)
    // a vector the corpus has never seen: a corpus vector, perturbed
    val base = emb.filter(col("vec_id") === 7L)
      .select("embedding").as[Seq[Float]].head()
    val novel = Seq((-1L, base.updated(0, base.head + 0.25f)))
      .toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
      .withColumn("v_norm", Similarity.norm(col("embedding")))
    // serve path: reload the k stored centroid rows -> pivot ->
    // map-side probe-cell assignment -> join the stored index
    val cents = IvfIndex.pivotRow(
      spark.read.parquet(st.centroidsPath).select("c_id", "c_emb"), 4)
    val probes = IvfIndex.probeCells(novel, cents, 4, nprobe = 2)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("v_norm").as("q_norm"), col("cell"))
    val hits = spark.read.parquet(st.assignedPath)
      .join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"),
        Similarity.cosineWithNorms(col("q_emb"), col("embedding"),
          col("q_norm"), col("v_norm")).as("cos"))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(1).collect()
    // the perturbed twin's nearest neighbor must be its source vector
    assert(hits.nonEmpty && hits.head.getLong(1) == 7L, hits.mkString)
  }
}
