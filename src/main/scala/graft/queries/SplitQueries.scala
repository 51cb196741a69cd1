package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

import graft.Tables
import graft.ext.{BpeTrainer, Dedup, Graph, IvfIndex, IvfStore, Multimodal, PqIndex, RelationStore, Similarity, TextOps, TopK, ZOrder}

/** Train/val/test split assignment: deterministic hash routing, leakage audit
  * — split from the monolithic ExtQueries in r10; mixes into
  * [[ExtQueries]] (self-typed), which carries the oracle-strategy
  * contract and the `queries`/`oracleSql` registries.
  */
private[queries] trait SplitQueries { this: ExtQueries.type =>
  // ===================================================================
  // Train/val/test split + near-dup leakage audit
  // ===================================================================

  /** Split-bucket layout: 10 hash buckets → 8 train / 1 val / 1 test. */
  private[queries] val SplitBuckets = 10

  /** Deterministic split of a key column: bucket = shingleHash('split:'
    * || key) mod 10 → train(<8) / val(8) / test(9). Map-side, seedable
    * by the literal prefix, and identical in both engines.
    */
  private[queries] def splitExpr(key: Column): Column = {
    val b = TextOps.shingleHash(concat(lit("split:"), key.cast(StringType))) % SplitBuckets
    when(b < 8, "train").when(b === 8, "val").otherwise("test")
  }

  private[queries] def splitSql(key: String): String = {
    val h = shingleHashSql(s"'split:' || CAST($key AS VARCHAR)")
    s"(CASE WHEN $h % $SplitBuckets < 8 THEN 'train' " +
      s"WHEN $h % $SplitBuckets = 8 THEN 'val' ELSE 'test' END)"
  }

  /** TRAIN/VAL/TEST assignment, two ways side by side: `split` hashes
    * the raw doc_id (the naive rule every pipeline starts with);
    * `split_group` hashes the document's DEDUP-GROUP label
    * ([[componentLabels]] stored state), so an entire near-duplicate
    * cluster lands in ONE split by construction — the assignment rule
    * that makes eval-set leakage through near-duplicates structurally
    * impossible rather than something to filter afterward
    * ([[xSplitLeakage]] measures the difference). Scale shape: both
    * rules are map-side hashes; the group rule adds one join against
    * the node-sized stored label relation. At 100 TB assignment is a
    * projection — no shuffle, no state beyond the stored labels.
    */
  def xSplitAssign(spark: SparkSession, dir: String): DataFrame =
    serveSplitAssign(spark, dir, Tables.documents(spark, dir))
      .orderBy("doc_id")

  /** PUBLIC split-assignment entry for an arbitrary (doc_id, …)
    * relation against `dir`'s stored dedup labels — the one engine
    * under the batch query and the streaming ingest twin
    * ([[graft.streaming.EventStream.runSplitStream]] assigns each
    * arriving micro-batch through here; its spec pins row-equality
    * with [[xSplitAssign]] on the same docs). A doc the stored labels
    * don't know yet is its own singleton component — the provisional
    * group-split an ingest path hands out until the next dedup-index
    * refresh re-labels it.
    */
  def serveSplitAssign(spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val comp = componentLabels(spark, dir)
    docs.select("doc_id")
      .join(comp, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("component"))
      .withColumn("split", splitExpr(col("doc_id")))
      .withColumn("split_group", splitExpr(col("component")))
  }

  private[queries] val splitAsgCtes =
    s"""sasg AS (
       |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
       |ssp AS (
       |  SELECT doc_id, component,
       |    ${splitSql("doc_id")} AS split,
       |    ${splitSql("component")} AS split_group
       |  FROM sasg)""".stripMargin

  private[queries] val xSplitAssignSql =
    s"""WITH RECURSIVE $componentsCtes,
       |$splitAsgCtes
       |SELECT doc_id, component, split, split_group FROM ssp ORDER BY doc_id""".stripMargin

  /** MEASURED eval-set leakage through near-duplicates — the
    * contamination number `x_contamination` cannot see (it checks
    * exact benchmark grams; this checks the model seeing a train-set
    * NEAR-COPY of an eval document): of the stored LSH candidate
    * pairs, how many straddle two different splits under the naive
    * id-hash rule vs the group-keyed rule. The group-keyed count is
    * ZERO BY CONSTRUCTION (both endpoints of every candidate pair are
    * in one component, which is hashed once) — published beside the
    * naive rate as the before/after of adopting group-keyed splits.
    * Expected naive rate ≈ 1 − Σ p² = 0.34 for an 0.8/0.1/0.1 split;
    * a materially lower reading means near-dup pairs correlate with
    * the id hash (an ingest-order artifact worth investigating).
    * Scale shape: one pair-relation-sized join against the doc-sized
    * assignment — the corpus text is never rescanned.
    */
  def xSplitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val asg = xSplitAssign(spark, dir)
      .select(col("doc_id"), col("split"), col("split_group"))
    val a = asg.select(col("doc_id").as("doc_a"),
      col("split").as("split_a"), col("split_group").as("grp_a"))
    val b = asg.select(col("doc_id").as("doc_b"),
      col("split").as("split_b"), col("split_group").as("grp_b"))
    candidatePairs(spark, dir).select("doc_a", "doc_b")
      .join(a, Seq("doc_a")).join(b, Seq("doc_b"))
      .agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("split_a") =!= col("split_b"), 1L).otherwise(0L))
          .as("n_cross_naive"),
        sum(when(col("grp_a") =!= col("grp_b"), 1L).otherwise(0L))
          .as("n_cross_group"))
      .select(col("n_pairs"), col("n_cross_naive"), col("n_cross_group"),
        (col("n_cross_naive").cast(DoubleType) / col("n_pairs").cast(DoubleType))
          .as("leak_rate_naive"))
  }

  private[queries] val xSplitLeakageSql =
    s"""WITH RECURSIVE $componentsCtes,
       |$splitAsgCtes
       |SELECT COUNT(*) AS n_pairs,
       |  CAST(SUM(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_naive,
       |  CAST(SUM(CASE WHEN sa.split_group <> sb.split_group THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_group,
       |  CAST(SUM(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS leak_rate_naive
       |FROM cand p JOIN ssp sa ON p.doc_a = sa.doc_id
       |  JOIN ssp sb ON p.doc_b = sb.doc_id""".stripMargin

}
