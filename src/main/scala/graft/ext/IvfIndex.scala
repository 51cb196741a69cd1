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
    val withCos = (0 until k).foldLeft(df.crossJoin(broadcast(cents))) {
      (d, i) => d.withColumn(s"ivf_cos$i", cosTo(i))
    }
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

  /** Top-`nprobe` cell fan-out: rank-1 cell always, rank-2 cell (the
    * best among the OTHER centroids, ties again to lowest id —
    * `ROW_NUMBER() = 2`) when `nprobe = 2`; `posexplode` then emits
    * one row per cell with its 1-based `cell_rank`. Two distinct
    * consumers, same computation:
    *  - QUERY probing — query sets are tiny, so the fan-out is
    *    nprobe·|Q| rows, never corpus-sized;
    *  - CORPUS multi-assignment (boundary replication, the SPANN-style
    *    recall lever [[IvfStore]] persists): each corpus vector is
    *    indexed under its top-2 cells, so a query whose true neighbor
    *    sits just across a Voronoi border still finds it — at 2×
    *    index storage and ZERO extra probe cost. Still map-side
    *    codegen: the fan-out is nassign·corpus rows of (id, cell),
    *    no shuffle, no window.
    */
  def probeCells(qdf: DataFrame, cents: DataFrame, k: Int, nprobe: Int): DataFrame = {
    require(nprobe == 1 || nprobe == 2, s"nprobe in {1, 2}, got $nprobe")
    val withCos = (0 until k).foldLeft(qdf.crossJoin(broadcast(cents))) {
      (d, i) => d.withColumn(s"ivf_cos$i", cosTo(i))
    }
    val cos = (0 until k).map(i => col(s"ivf_cos$i"))
    val best = greatest(cos: _*)
    val staged = withCos
      .withColumn("ivf_cell1",
        coalesce((0 until k).map(i => when(cos(i) === best, lit(i.toLong))): _*))
    val probes =
      if (nprobe == 1) array(col("ivf_cell1"))
      else {
        val others = (0 until k).map(i =>
          when(col("ivf_cell1") === i, lit(null).cast(DoubleType)).otherwise(cos(i)))
        val best2 = greatest(others: _*)
        val cell2 = coalesce((0 until k).map(i =>
          when(col("ivf_cell1") =!= i && cos(i) === best2, lit(i.toLong))): _*)
        array(col("ivf_cell1"), cell2)
      }
    staged
      .select(col("*"), posexplode(probes).as(Seq("ivf_pos", "cell")))
      .withColumn("cell_rank", col("ivf_pos").cast("int") + lit(1))
      .drop((0 until k).flatMap(i => Seq(ce(i), cn(i), s"ivf_cos$i")): _* )
      .drop("ivf_cell1", "ivf_pos")
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
