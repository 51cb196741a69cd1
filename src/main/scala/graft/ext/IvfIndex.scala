package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

/** IVF coarse quantizer with k-means (Lloyd) training expressed as
  * plain DataFrame aggregations — deterministic, oracle-mirrorable,
  * and shaped for the 1000-executor case.
  *
  * Determinism contract (the reason this is NOT `ml.clustering.KMeans`,
  * whose random init and float mean accumulation order are both
  * non-reproducible across engines):
  *   - seed = the k lowest `vec_id` vectors, relabeled 0..k-1 — a pure
  *     data rule both engines can state;
  *   - assignment = argmax cosine with ties to the lowest centroid id,
  *     on cosines that are in-order double folds ([[Similarity.dot]]),
  *     bit-identical to the DuckDB `list_reduce` mirror;
  *   - centroid update = per-dimension means of integer-QUANTIZED
  *     components: `floor(double(x)·1e6 + 0.5)` as BIGINT. Integer sums
  *     are exact and order-independent, so the parallel aggregation is
  *     reproducible — the classic float-mean nondeterminism (shuffle
  *     order changes the sum) never enters. Every op (widen, multiply,
  *     add, floor, int-sum, double divide, cast to float) is an
  *     IEEE-exact operation both engines perform identically; even a
  *     `.5` tie floors the same double the same way, where ROUND would
  *     hang on engine rounding-mode differences.
  *
  * Scale shape (100 TB corpus): centroids are HYPERPARAMETER-sized
  * (k·dim floats), carried as ONE pivoted row — `ivf_ce0..ce{k-1}`
  * array columns plus precomputed norms — broadcast to every task.
  * Assignment is then map-side: k codegen'd `vector_dot` cosines +
  * `greatest` + a first-match CASE, zero shuffle, zero row fan-out
  * (the k-row crossJoin form would shuffle a k× corpus through a
  * window). Each Lloyd step is one partial-aggregated `groupBy(cell)`
  * whose shuffle carries k rows of BIGINT sums — the same plan
  * Spark MLlib's KMeans hand-builds with `treeAggregate`, here left
  * to Catalyst. Training cost = iters corpus passes, the textbook
  * Lloyd minimum.
  */
object IvfIndex {

  private val QuantScale = 1e6
  private def ce(i: Int) = s"ivf_ce$i"
  private def cn(i: Int) = s"ivf_cn$i"

  /** `floor(double(x)·1e6 + 0.5)` → BIGINT (Spark `floor` is already
    * LongType). See class doc: exact, order-free, engine-identical.
    */
  private def quant(x: Column): Column =
    floor(x.cast(DoubleType) * lit(QuantScale) + lit(0.5))

  /** (c_id, c_emb) k-row relation → ONE broadcastable row with
    * `ivf_ce{i}` embedding columns and `ivf_cn{i}` norms. Eagerly
    * materialized (`localCheckpoint`, k·dim floats) so each Lloyd
    * step's corpus pass runs exactly once however often downstream
    * consumes the centroids. Public as the load path for STORED
    * centroids ([[IvfStore]]): a persisted (c_id, c_emb) parquet
    * re-pivots into the broadcastable row without retraining.
    */
  def pivotRow(cents: DataFrame, k: Int): DataFrame = {
    val firsts = (0 until k).map(i =>
      first(when(col("c_id") === i, col("c_emb")), ignoreNulls = true).as(ce(i)))
    cents.groupBy()
      .agg(firsts.head, firsts.tail: _*)
      .select(col("*") +: (0 until k).map(i => Similarity.norm(col(ce(i))).as(cn(i))): _*)
      .localCheckpoint()
  }

  /** Seed centroids: the k lowest-`vec_id` vectors relabeled 0..k-1.
    * `df` needs (vec_id, embedding).
    */
  def seed(emb: DataFrame, k: Int): DataFrame =
    pivotRow(
      emb.orderBy("vec_id").limit(k)
        .select(
          (row_number().over(Window.orderBy("vec_id")) - 1).cast("long").as("c_id"),
          col("embedding").as("c_emb")),
      k)

  private def cosTo(i: Int): Column =
    Similarity.cosineWithNorms(col("embedding"), col(ce(i)), col("v_norm"), col(cn(i)))

  /** Nearest-centroid assignment, map-side: appends `cell` (BIGINT in
    * 0..k-1). Cosines are materialized as real columns first so
    * `CollapseProject` keeps them single-evaluation (k dots per row,
    * not k² through the argmax). Ties resolve to the LOWEST centroid
    * id — first-match CASE over ascending i — identical to
    * `ROW_NUMBER() OVER (ORDER BY cos DESC, c_id) = 1`. An empty cell
    * (possible mid-training) yields a NULL `ivf_ce` column, NULL
    * cosine, and is skipped by both `greatest` and the CASE.
    * `df` needs (embedding, v_norm); other columns pass through.
    */
  def withCell(df: DataFrame, cents: DataFrame, k: Int): DataFrame = {
    // ONE select, not k chained withColumns: each withColumn re-analyzes
    // the growing plan, an O(k²) driver-side cost that begins to matter
    // now that k scales with √corpus
    val withCos = df.crossJoin(broadcast(cents))
      .select(col("*") +: (0 until k).map(i => cosTo(i).as(s"ivf_cos$i")): _*)
    val cos = (0 until k).map(i => col(s"ivf_cos$i"))
    val best = greatest(cos: _*)
    withCos
      .withColumn("cell",
        coalesce((0 until k).map(i => when(cos(i) === best, lit(i.toLong))): _*))
      .drop((0 until k).flatMap(i => Seq(ce(i), cn(i), s"ivf_cos$i")): _*)
  }

  /** One Lloyd step over an assigned corpus (embedding, cell):
    * per-dimension quantized-integer means, re-pivoted. One shuffle
    * carrying k partial-agg rows.
    */
  def lloydStep(assigned: DataFrame, k: Int, dim: Int): DataFrame = {
    val sums = (0 until dim).map(d =>
      sum(quant(element_at(col("embedding"), d + 1))).as(s"ivf_s$d"))
    val agg = assigned
      .groupBy(col("cell").as("c_id"))
      .agg(count(lit(1)).as("ivf_cnt"), sums: _*)
    val means = (0 until dim).map(d =>
      (col(s"ivf_s$d").cast(DoubleType) / col("ivf_cnt").cast(DoubleType) / lit(QuantScale))
        .cast(FloatType))
    pivotRow(agg.select(col("c_id"), array(means: _*).as("c_emb")), k)
  }

  /** Train: seed → `iters` Lloyd steps. `emb` needs
    * (vec_id, embedding, v_norm).
    */
  def train(emb: DataFrame, k: Int, iters: Int, dim: Int): DataFrame = {
    var cents = seed(emb, k)
    for (_ <- 0 until iters)
      cents = lloydStep(
        withCell(emb, cents, k).select("vec_id", "embedding", "v_norm", "cell"), k, dim)
    cents
  }

  /** Top-`nprobe` cell fan-out — the iterative masked argmax: cell j
    * is the best centroid not already picked (ties to lowest id),
    * exactly `ROW_NUMBER() OVER (ORDER BY cos DESC, c_id) <= nprobe`;
    * `posexplode` then emits one row per cell with its 1-based
    * `cell_rank`. Arbitrary `nprobe` (r8: the serving nprobe scales
    * with the cell count, so the fixed-2 form had to go); per-row cost
    * O(k·nprobe²) comparisons, which only ever runs on tiny sides.
    * Two distinct consumers, same computation:
    *  - QUERY probing — query sets are tiny, so the fan-out is
    *    nprobe·|Q| rows, never corpus-sized;
    *  - CORPUS multi-assignment (boundary replication, the SPANN-style
    *    recall lever [[IvfStore]] persists): each corpus vector is
    *    indexed under its top-2 cells, so a query whose true neighbor
    *    sits just across a Voronoi border still finds it — at 2×
    *    index storage and ZERO extra probe cost. Still map-side
    *    codegen: the fan-out is nassign·corpus rows of (id, cell),
    *    no shuffle, no window.
    * A query with fewer than `nprobe` non-empty cells emits NULL for
    * the tail picks (dropped by any equi-join on `cell`), matching
    * the oracle's rank form which has no row to emit there.
    */
  def probeCells(qdf: DataFrame, cents: DataFrame, k: Int, nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= k, s"nprobe in [1, $k], got $nprobe")
    var staged = qdf.crossJoin(broadcast(cents))
      .select(col("*") +: (0 until k).map(i => cosTo(i).as(s"ivf_cos$i")): _*)
    val cos = (0 until k).map(i => col(s"ivf_cos$i"))
    for (j <- 1 to nprobe) {
      val prior = (1 until j).map(p => col(s"ivf_cell$p"))
      def masked(i: Int): Column =
        if (prior.isEmpty) cos(i)
        else when(prior.map(_ === i).reduce(_ || _), lit(null).cast(DoubleType))
          .otherwise(cos(i))
      val best = greatest((0 until k).map(masked): _*)
      staged = staged.withColumn(s"ivf_cell$j",
        coalesce((0 until k).map(i => when(masked(i) === best, lit(i.toLong))): _*))
    }
    staged
      .select(col("*"),
        posexplode(array((1 to nprobe).map(j => col(s"ivf_cell$j")): _*))
          .as(Seq("ivf_pos", "cell")))
      .withColumn("cell_rank", col("ivf_pos").cast("int") + lit(1))
      .drop((0 until k).flatMap(i => Seq(ce(i), cn(i), s"ivf_cos$i")): _* )
      .drop((1 to nprobe).map(j => s"ivf_cell$j"): _*)
      .drop("ivf_pos")
  }

  /** QUERY-SIDE top-`nprobe` cell fan-out for SMALL query sets — same
    * semantics as [[probeCells]] (`ROW_NUMBER() OVER (PARTITION BY id
    * ORDER BY cos DESC, c_id) <= nprobe`), different plan shape: the
    * k cosines explode to (id, c_id, cos) rows ranked by a per-query
    * window. For |Q| query rows that is a |Q|·k-row window — trivial —
    * where the comparison-chain form's generated code grows with
    * k·nprobe² and breaks the 64 KB codegen method limit once the
    * serving nprobe scales with k (measured r8 at k=45, nprobe≥6).
    * NOT for corpus-side assignment: there the k× fan-out through a
    * window is exactly the shuffle [[withCell]] exists to avoid —
    * corpus assignment keeps [[probeCells]] at nassign ≤ 2.
    * `idCol` is the window partition key; all `qdf` columns pass
    * through, plus `cell` and 1-based `cell_rank`. Empty cells (NULL
    * cosine) are skipped, matching the oracle's rank form.
    */
  def probeCellsExploded(qdf: DataFrame, cents: DataFrame, k: Int,
      nprobe: Int, idCol: String): DataFrame = {
    require(nprobe >= 1 && nprobe <= k, s"nprobe in [1, $k], got $nprobe")
    val withCos = qdf.crossJoin(broadcast(cents))
      .select(col("*") +: (0 until k).map(i => cosTo(i).as(s"ivf_cos$i")): _*)
    val exploded = withCos
      .select(col("*"),
        posexplode(array((0 until k).map(i => col(s"ivf_cos$i")): _*))
          .as(Seq("ivf_cid", "ivf_qcos")))
      .drop((0 until k).flatMap(i => Seq(ce(i), cn(i), s"ivf_cos$i")): _*)
    val byQuery = Window.partitionBy(idCol)
      .orderBy(col("ivf_qcos").desc, col("ivf_cid"))
    exploded
      .filter(col("ivf_qcos").isNotNull)
      .withColumn("cell_rank", row_number().over(byQuery))
      .filter(col("cell_rank") <= nprobe)
      .select(qdf.columns.map(col) ++
        Seq(col("ivf_cid").cast("long").as("cell"), col("cell_rank")): _*)
  }

  /** The pivoted row back as a (c_id, c_emb, c_norm) k-row relation —
    * inspection/spec surface (union of k 1-row selects; never on a
    * hot path).
    */
  def centroidRelation(cents: DataFrame, k: Int): DataFrame =
    (0 until k).map(i =>
      cents.select(lit(i.toLong).as("c_id"), col(ce(i)).as("c_emb"), col(cn(i)).as("c_norm")))
      .reduce(_ union _)
      .filter(col("c_emb").isNotNull)
}
