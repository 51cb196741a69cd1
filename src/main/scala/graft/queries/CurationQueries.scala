package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

import graft.Tables
import graft.ext.{BpeTrainer, Dedup, Graph, IvfIndex, IvfStore, Multimodal, PqIndex, RelationStore, Similarity, TextOps, TopK, ZOrder}

/** Curation gate/funnel, data cards, posting skew, shard mixing, containment, IVF silhouette
  * — split from the monolithic ExtQueries in r10; mixes into
  * [[ExtQueries]] (self-typed), which carries the oracle-strategy
  * contract and the `queries`/`oracleSql` registries.
  */
private[queries] trait CurationQueries { this: ExtQueries.type =>
  def serveCurationGate(spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val bench = spark.read.parquet(RelationStore.ensure(s"contam-bench:$dir") {
      contamGrams(spark, dir).filter(col("bucket") >= 90).select(col("h")).distinct()
    }).withColumn("hit", lit(1))
    val base = docs.select(col("doc_id"), col("text"),
      (TextOps.shingleHash(col("doc_id").cast(StringType)) % 100)
        .cast(IntegerType).as("bucket"))
      .withColumn("toks", TextOps.tokens(col("text")))
      .withColumn("bg", TextOps.shingles(col("toks"), 2))
      .withColumn("qk",
        size(col("toks")) >= TextOps.MinTokens &&
          size(col("toks")) <= TextOps.MaxTokens &&
          size(array_distinct(col("toks"))).cast(DoubleType) /
            size(col("toks")).cast(DoubleType) >= TextOps.MinUniqRatio &&
          TextOps.stopwordCount(col("toks")).cast(DoubleType) /
            size(col("toks")).cast(DoubleType) <= TextOps.MaxStopwordRatio)
      .withColumn("dupf",
        when(size(col("bg")) === 0, lit(0.0)).otherwise(
          lit(1.0) - size(array_distinct(col("bg"))).cast(DoubleType) /
            size(col("bg")).cast(DoubleType)))
      .withColumn("ttf",
        array_max(transform(array_distinct(col("toks")), u =>
          size(filter(col("toks"), x => x === u)))).cast(DoubleType) /
          size(col("toks")).cast(DoubleType))
      .withColumn("rk",
        coalesce(col("dupf") <= RepMaxDupBigram &&
          col("ttf") <= RepMaxTopToken, lit(false)))
    val hits = base
      .select(col("doc_id"),
        explode(array_distinct(TextOps.shingles(col("toks"), 4))).as("gram"))
      .select(col("doc_id"), TextOps.shingleHash(col("gram")).as("h"))
      .join(broadcast(bench), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(sum(when(col("hit").isNotNull, 1L).otherwise(0L)).as("n_overlap"))
    base.join(hits, Seq("doc_id"), "left")
      .withColumn("ck",
        col("bucket") < 90 && coalesce(col("n_overlap"), lit(0L)) === 0L)
      .select(col("doc_id"), col("qk"), col("rk"), col("ck"),
        when(col("qk") && col("rk") && col("ck"), "Y").otherwise("N").as("keep"))
  }

  /** THE CURATION FUNNEL — the per-stage survivor report every corpus
    * release publishes: documents flowing through the pipeline's gates
    * IN SEQUENCE (quality → repetition → decontamination → dedup
    * canonical), each stage's input being the previous stage's
    * survivors, emitted as (stage, n_in, n_kept, drop_rate) rows. The
    * stage flags are THE SAME decision surfaces the individual gate
    * queries emit — `xQualityFilter.keep`, `xRepetition.keep`, the
    * contamination rule (which here also drops the benchmark-bucket
    * docs themselves: the eval set must not be trained on), and
    * `xDedupCanonical.is_kept` computed corpus-wide — joined per-doc,
    * so the funnel cannot disagree with the gates it summarizes.
    * Scale shape: four doc-sized flag joins + ONE aggregate; each
    * flag costs what its gate costs (map-side stats, stored pair/
    * label state); the reshape to rows is a 1-row fan-out.
    */
  def xCurationFunnel(spark: SparkSession, dir: String): DataFrame = {
    // qk/rk/ck in ONE corpus text pass through the shared gate entry
    // (CurationSpec pins its flags equal to the standalone gate
    // queries'); only the canonical stage joins a second relation
    val d = xDedupCanonical(spark, dir)
      .select(col("doc_id"), col("is_kept").as("dk"))
    val flags = serveCurationGate(spark, dir, Tables.documents(spark, dir))
      .select(col("doc_id"), col("qk"), col("rk"), col("ck"))
      .join(d, Seq("doc_id"))
    val agg = flags.agg(
      count(lit(1)).as("n0"),
      sum(when(col("qk"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("qk") && col("rk"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("qk") && col("rk") && col("ck"), 1L).otherwise(0L)).as("n3"),
      sum(when(col("qk") && col("rk") && col("ck") && col("dk"), 1L).otherwise(0L)).as("n4"))
    def stage(name: String, nIn: String, nKept: String): DataFrame =
      agg.select(lit(name).as("stage"), col(nIn).as("n_in"), col(nKept).as("n_kept"),
        ((col(nIn) - col(nKept)).cast(DoubleType) / col(nIn).cast(DoubleType))
          .as("drop_rate"))
    stage("1_quality", "n0", "n1")
      .unionByName(stage("2_repetition", "n1", "n2"))
      .unionByName(stage("3_decontamination", "n2", "n3"))
      .unionByName(stage("4_dedup_canonical", "n3", "n4"))
      .orderBy("stage")
  }

  /** The per-doc curation flag CTEs (quality qk, repetition rk,
    * decontamination ck, dedup-canonical dk, joined as `fl`) —
    * shared by the funnel oracle and the datacard-diff oracle.
    * Expects [[componentsCtes]] (for `t` and `comp`) ahead of it.
    */
  private[queries] lazy val curationFlagsCtes = {
    val cbucket = shingleHashSql("CAST(doc_id AS VARCHAR)") + " % 100"
    s"""qf AS (
       |  SELECT doc_id,
       |    CASE WHEN len(toks) < ${TextOps.MinTokens} THEN 0
       |         WHEN len(toks) > ${TextOps.MaxTokens} THEN 0
       |         WHEN CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE)
       |           < ${TextOps.MinUniqRatio} THEN 0
       |         WHEN CAST(len(list_filter(toks, x -> x IN ${inList(TextOps.Stopwords)})) AS DOUBLE)
       |           / CAST(len(toks) AS DOUBLE) > ${TextOps.MaxStopwordRatio} THEN 0
       |         ELSE 1 END AS qk
       |  FROM t),
       |rf AS (
       |  SELECT doc_id,
       |    CASE WHEN (CASE WHEN len(bg) = 0 THEN 0.0
       |          ELSE 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE) END)
       |            <= $RepMaxDupBigram
       |      AND CAST(list_max(list_transform(list_distinct(toks), u ->
       |            len(list_filter(toks, x -> x = u)))) AS DOUBLE)
       |          / CAST(len(toks) AS DOUBLE) <= $RepMaxTopToken
       |      THEN 1 ELSE 0 END AS rk
       |  FROM (SELECT doc_id, toks, ${shinglesSql("toks", 2)} AS bg FROM t)),
       |cgr AS (SELECT doc_id, bucket, ${shingleHashSql("g")} AS h
       |  FROM (SELECT doc_id, CAST($cbucket AS INT) AS bucket,
       |    unnest(list_distinct(${shinglesSql("toks", 4)})) AS g FROM t)),
       |cbench AS (SELECT DISTINCT h FROM cgr WHERE bucket >= 90),
       |ctr AS (SELECT cgr.doc_id AS doc_id,
       |    CAST(SUM(CASE WHEN cgr.h IN (SELECT h FROM cbench) THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap
       |  FROM cgr WHERE cgr.bucket < 90 GROUP BY cgr.doc_id),
       |cf AS (
       |  SELECT db.doc_id,
       |    CASE WHEN db.bucket >= 90 THEN 0
       |         WHEN COALESCE(x.n_overlap, 0) > 0 THEN 0 ELSE 1 END AS ck
       |  FROM (SELECT doc_id, CAST($cbucket AS INT) AS bucket FROM documents) db
       |    LEFT JOIN ctr x ON db.doc_id = x.doc_id),
       |clab AS (
       |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, d.n_chars
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
       |df AS (
       |  SELECT doc_id, CASE WHEN rnk = 1 THEN 1 ELSE 0 END AS dk FROM (
       |    SELECT doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rnk
       |    FROM clab)),
       |fl AS (
       |  SELECT q.doc_id, q.qk, r.rk, c.ck, d.dk
       |  FROM qf q JOIN rf r USING (doc_id) JOIN cf c USING (doc_id) JOIN df d USING (doc_id))""".stripMargin
  }

  private[queries] lazy val xCurationFunnelSql =
    s"""WITH RECURSIVE $componentsCtes,
       |$curationFlagsCtes,
       |fagg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n0,
       |    CAST(SUM(qk) AS BIGINT) AS n1,
       |    CAST(SUM(qk * rk) AS BIGINT) AS n2,
       |    CAST(SUM(qk * rk * ck) AS BIGINT) AS n3,
       |    CAST(SUM(qk * rk * ck * dk) AS BIGINT) AS n4
       |  FROM fl)
       |SELECT stage, n_in, n_kept,
       |  CAST(n_in - n_kept AS DOUBLE) / CAST(n_in AS DOUBLE) AS drop_rate
       |FROM (
       |  SELECT '1_quality' AS stage, n0 AS n_in, n1 AS n_kept FROM fagg
       |  UNION ALL SELECT '2_repetition', n1, n2 FROM fagg
       |  UNION ALL SELECT '3_decontamination', n2, n3 FROM fagg
       |  UNION ALL SELECT '4_dedup_canonical', n3, n4 FROM fagg)
       |ORDER BY stage""".stripMargin

  /** DATA CARD DIFF — the release-notes view: every core card metric
    * computed for the RAW corpus beside the CURATED release (the
    * curation funnel's full-survivor set: quality ∧ repetition ∧
    * decontamination ∧ dedup-canonical) with the retained fraction —
    * what a dataset registry shows between version N and N+1. The
    * near-dup-pair and dup-doc-rate rows read EXACTLY ZERO on the
    * curated side by construction (every candidate pair lies inside
    * one dedup component and canonical keeps one doc per component) —
    * that zero is the release PROPERTY this query exists to assert:
    * a non-zero reading means the dedup stage broke (spec-pinned).
    *
    * Scale shape: survivor flags are the same map-side gate pass the
    * funnel runs + the stored component labels; token stats for BOTH
    * sides come from ONE corpus pass (kept-flag left join, conditional
    * sums); pair metrics are pair-relation-sized semi-joins against
    * the survivor set; the final assembly is five 1-row broadcast
    * scalars.
    */
  /** The curated release's KEEP LIST as stored state — the manifest a
    * dataset release actually ships (the funnel's full-survivor set:
    * quality ∧ repetition ∧ decontamination ∧ dedup-canonical),
    * materialized once per corpus snapshot so release-audit consumers
    * join a survivor-sized scan instead of re-running the gate pass
    * per metric leg.
    */
  private[queries] def curatedKeepset(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(RelationStore.ensure(s"curated-keepset:$dir") {
      val dk = xDedupCanonical(spark, dir).select(col("doc_id"), col("is_kept"))
      serveCurationGate(spark, dir, Tables.documents(spark, dir))
        .select(col("doc_id"), col("qk"), col("rk"), col("ck"))
        .join(dk, Seq("doc_id"))
        .filter(col("qk") && col("rk") && col("ck") && col("is_kept"))
        .select("doc_id")
    })

  def xDatacardDiff(spark: SparkSession, dir: String): DataFrame = {
    def d(c: String) = col(c).cast(DoubleType)
    val keep = curatedKeepset(spark, dir)
    val ts = Tables.documents(spark, dir)
      .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast(LongType).as("nt"))
      .join(keep.withColumn("is_k", lit(1L)), Seq("doc_id"), "left")
      .agg(count(lit(1)).as("nd_raw"), sum(col("nt")).as("tt_raw"),
        sum(coalesce(col("is_k"), lit(0L))).as("nd_cur"),
        sum(when(col("is_k").isNotNull, col("nt")).otherwise(lit(0L))).as("tt_cur"))
    val pRaw = candidatePairs(spark, dir).agg(count(lit(1)).as("p_raw"))
    val pCur = candidatePairs(spark, dir)
      .join(keep.select(col("doc_id").as("doc_a")), Seq("doc_a"))
      .join(keep.select(col("doc_id").as("doc_b")), Seq("doc_b"))
      .agg(count(lit(1)).as("p_cur"))
    val clabAll = Tables.documents(spark, dir).select("doc_id")
      .join(componentLabels(spark, dir), col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("component"))
    val gr = clabAll.agg(count(lit(1)).as("n_r"),
      countDistinct(col("component")).as("g_r"))
    val gc = clabAll.join(keep, Seq("doc_id")).agg(count(lit(1)).as("n_c"),
      countDistinct(col("component")).as("g_c"))
    val all = ts.crossJoin(broadcast(pRaw)).crossJoin(broadcast(pCur))
      .crossJoin(broadcast(gr)).crossJoin(broadcast(gc))
    def metricRow(name: String, raw: Column, cur: Column): DataFrame =
      all.select(lit(name).as("metric"), raw.cast(DoubleType).as("raw"),
        cur.cast(DoubleType).as("curated"))
    Seq(
      metricRow("01_n_docs", col("nd_raw"), col("nd_cur")),
      metricRow("02_total_tokens", col("tt_raw"), col("tt_cur")),
      metricRow("03_mean_doc_tokens", d("tt_raw") / d("nd_raw"), d("tt_cur") / d("nd_cur")),
      metricRow("04_near_dup_pairs", col("p_raw"), col("p_cur")),
      metricRow("05_dup_doc_rate",
        (d("n_r") - d("g_r")) / d("n_r"), (d("n_c") - d("g_c")) / d("n_c")))
      .reduce(_ unionByName _)
      .withColumn("retained", col("curated") / col("raw"))
      .orderBy("metric")
  }

  private[queries] lazy val xDatacardDiffSql =
    s"""WITH RECURSIVE $componentsCtes,
       |$curationFlagsCtes,
       |keepset AS (SELECT doc_id FROM fl WHERE qk * rk * ck * dk = 1),
       |tk AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS nt FROM t),
       |ts AS (
       |  SELECT COUNT(*) AS nd_raw, CAST(SUM(nt) AS BIGINT) AS tt_raw,
       |    CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nd_cur,
       |    CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN nt ELSE 0 END) AS BIGINT) AS tt_cur
       |  FROM tk LEFT JOIN keepset k USING (doc_id)),
       |pr AS (SELECT COUNT(*) AS p_raw FROM cand),
       |pc AS (SELECT COUNT(*) AS p_cur FROM cand c
       |  JOIN keepset a ON c.doc_a = a.doc_id JOIN keepset b ON c.doc_b = b.doc_id),
       |gr AS (SELECT COUNT(*) AS n_r, COUNT(DISTINCT component) AS g_r FROM clab),
       |gc AS (SELECT COUNT(*) AS n_c, COUNT(DISTINCT component) AS g_c
       |  FROM clab JOIN keepset USING (doc_id))
       |SELECT metric, raw, curated, curated / raw AS retained FROM (
       |  SELECT '01_n_docs' AS metric, CAST(nd_raw AS DOUBLE) AS raw, CAST(nd_cur AS DOUBLE) AS curated
       |    FROM ts
       |  UNION ALL SELECT '02_total_tokens', CAST(tt_raw AS DOUBLE), CAST(tt_cur AS DOUBLE) FROM ts
       |  UNION ALL SELECT '03_mean_doc_tokens',
       |    CAST(tt_raw AS DOUBLE) / CAST(nd_raw AS DOUBLE),
       |    CAST(tt_cur AS DOUBLE) / CAST(nd_cur AS DOUBLE) FROM ts
       |  UNION ALL SELECT '04_near_dup_pairs',
       |    CAST((SELECT p_raw FROM pr) AS DOUBLE), CAST((SELECT p_cur FROM pc) AS DOUBLE)
       |  UNION ALL SELECT '05_dup_doc_rate',
       |    (SELECT (CAST(n_r AS DOUBLE) - CAST(g_r AS DOUBLE)) / CAST(n_r AS DOUBLE) FROM gr),
       |    (SELECT (CAST(n_c AS DOUBLE) - CAST(g_c AS DOUBLE)) / CAST(n_c AS DOUBLE) FROM gc))
       |ORDER BY metric""".stripMargin

  /** Per-source retention of the curated release — the
    * [[xDatacardDiff]] headline at SOURCE grain: how much of each
    * feed survived the funnel. The release-notes row a data vendor
    * reads first ("source X lost 80% to the quality gate") and the
    * early-warning that one feed's collection broke upstream.
    * Scale shape: one (doc_id, source)-pruned corpus scan left-joined
    * to the STORED curated-keepset manifest (survivor-sized), then a
    * map-side-combined source-cardinality aggregate.
    */
  def xRetainedBySource(spark: SparkSession, dir: String): DataFrame = {
    val keep = curatedKeepset(spark, dir).withColumn("is_k", lit(1L))
    Tables.documents(spark, dir).select("doc_id", "source")
      .join(keep, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_raw"),
        sum(coalesce(col("is_k"), lit(0L))).as("n_curated"))
      .select(col("source"), col("n_raw"), col("n_curated"),
        (col("n_curated").cast(DoubleType) / col("n_raw").cast(DoubleType))
          .as("retained"))
      .orderBy("source")
  }

  private[queries] lazy val xRetainedBySourceSql =
    s"""WITH RECURSIVE $componentsCtes,
       |$curationFlagsCtes,
       |keepset AS (SELECT doc_id FROM fl WHERE qk * rk * ck * dk = 1)
       |SELECT d.source, COUNT(*) AS n_raw,
       |  CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_curated,
       |  CAST(SUM(CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS retained
       |FROM documents d LEFT JOIN keepset k USING (doc_id)
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  /** THE DATA CARD — the one-page corpus snapshot a dataset ships
    * with (Gebru et al.'s datasheets, as a query): counts, language
    * breadth, the dedup posture (near-dup pairs, groups, the dropped
    * fraction a canonical pass would remove), token mass, embedding
    * coverage, and the eval-leakage rate under the naive split rule —
    * every number derived from the SAME stored relations the
    * individual operators consume (pair graph, component labels), so
    * the card is consistent-by-construction with the pipeline it
    * describes. Emitted as ordered (metric, value) rows — the shape
    * a registry ingests and diffs across snapshots. Scale: each row
    * is one aggregate over a stored relation or one corpus pass;
    * nothing here exceeds the cost of the operator it summarizes.
    */
  def xDatacard(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    def row(name: String, v: Column, src: DataFrame): DataFrame =
      src.agg(v.cast(DoubleType).as("value")).select(lit(name).as("metric"), col("value"))
    val comp = componentLabels(spark, dir)
    val groups = docs.select("doc_id")
      .join(comp, col("doc_id") === col("node"), "left")
      .select(coalesce(col("comp"), col("doc_id")).as("component"))
    val out = Seq(
      row("01_n_docs", count(lit(1)), docs),
      row("02_n_langs", countDistinct(col("lang")), docs),
      row("03_total_tokens", sum(size(TextOps.tokens(col("text"))).cast(LongType)), docs),
      row("04_mean_doc_tokens",
        sum(size(TextOps.tokens(col("text"))).cast(LongType)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType), docs),
      row("05_n_embeddings", count(lit(1)), Tables.embeddings(spark, dir)),
      row("06_embedding_coverage",
        count(lit(1)).cast(DoubleType), Tables.embeddings(spark, dir))
        .crossJoin(docs.agg(count(lit(1)).cast(DoubleType).as("nd")))
        .select(col("metric"), (col("value") / col("nd")).as("value")),
      row("07_near_dup_pairs", count(lit(1)), candidatePairs(spark, dir)),
      row("08_n_dedup_groups", countDistinct(col("component")), groups),
      row("09_dup_doc_rate",
        (count(lit(1)).cast(DoubleType) - countDistinct(col("component")).cast(DoubleType)) /
          count(lit(1)).cast(DoubleType), groups),
      row("10_split_leak_rate_naive", first(col("leak_rate_naive")),
        xSplitLeakage(spark, dir)))
    out.reduce(_ unionByName _).orderBy("metric")
  }

  private[queries] val xDatacardSql =
    s"""WITH RECURSIVE $componentsCtes,
       |$splitAsgCtes,
       |dcg AS (
       |  SELECT COALESCE(c.component, d.doc_id) AS component
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
       |dct AS (SELECT CAST(SUM(len($ToksSql)) AS BIGINT) AS tt, COUNT(*) AS nd FROM documents)
       |SELECT metric, value FROM (
       |  SELECT '01_n_docs' AS metric, CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS value
       |  UNION ALL SELECT '02_n_langs', CAST((SELECT COUNT(DISTINCT lang) FROM documents) AS DOUBLE)
       |  UNION ALL SELECT '03_total_tokens', CAST((SELECT tt FROM dct) AS DOUBLE)
       |  UNION ALL SELECT '04_mean_doc_tokens',
       |    (SELECT CAST(tt AS DOUBLE) / CAST(nd AS DOUBLE) FROM dct)
       |  UNION ALL SELECT '05_n_embeddings', CAST((SELECT COUNT(*) FROM embeddings) AS DOUBLE)
       |  UNION ALL SELECT '06_embedding_coverage',
       |    CAST((SELECT COUNT(*) FROM embeddings) AS DOUBLE)
       |      / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
       |  UNION ALL SELECT '07_near_dup_pairs', CAST((SELECT COUNT(*) FROM cand) AS DOUBLE)
       |  UNION ALL SELECT '08_n_dedup_groups',
       |    CAST((SELECT COUNT(DISTINCT component) FROM dcg) AS DOUBLE)
       |  UNION ALL SELECT '09_dup_doc_rate',
       |    (SELECT (CAST(COUNT(*) AS DOUBLE) - CAST(COUNT(DISTINCT component) AS DOUBLE))
       |       / CAST(COUNT(*) AS DOUBLE) FROM dcg)
       |  UNION ALL SELECT '10_split_leak_rate_naive',
       |    (SELECT CAST(SUM(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) AS DOUBLE)
       |       / CAST(COUNT(*) AS DOUBLE)
       |     FROM cand p JOIN ssp sa ON p.doc_a = sa.doc_id
       |       JOIN ssp sb ON p.doc_b = sb.doc_id))
       |ORDER BY metric""".stripMargin

  private[queries] val xShuffleShardSql = {
    val k = shingleHashSql("'shuffle:' || CAST(doc_id AS VARCHAR)")
    s"""WITH k AS (SELECT doc_id, $k AS shuffle_key FROM documents)
       |SELECT doc_id, shuffle_key,
       |  CAST(shuffle_key % $ShuffleShards AS INT) AS shard,
       |  row_number() OVER (PARTITION BY shuffle_key % $ShuffleShards
       |    ORDER BY shuffle_key, doc_id) AS position
       |FROM k
       |ORDER BY shard, position""".stripMargin
  }

  /** Posting-list SKEW profile of the stored (doc,token) posting
    * relation — document frequency deciles plus each decile's token
    * and occurrence mass. This is the number that justifies every
    * head-token decision downstream: BM25's pushed `In(token,…)`
    * probe cost, the heavy-hitter stoplist, the collocation
    * denominator, and (at 100 TB) whether the token shuffle behind
    * the posting build needs head-key salting — a decile table whose
    * top bucket holds most of `sum_tf` says yes before any job runs.
    * Derived ENTIRELY from the stored posting relation (one
    * vocab-sized aggregate — the corpus text is never rescanned);
    * the NTILE window is a single-partition sort of the
    * language-bounded vocabulary (~10^6 rows for web text), the same
    * bounded-window contract as `w6_ntile` — vocab-sized, never
    * corpus-sized.
    */
  def xPostingSkew(spark: SparkSession, dir: String): DataFrame = {
    val df = postings(spark, dir)
      .groupBy("token")
      .agg(count(lit(1)).as("df"), sum(col("cnt")).as("tf"))
    df.withColumn("decile",
        ntile(10).over(Window.orderBy(col("df"), col("token"))).cast(LongType))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_tokens"), min(col("df")).as("min_df"),
        max(col("df")).as("max_df"), sum(col("tf")).as("sum_tf"))
      .orderBy("decile")
  }

  private[queries] val xPostingSkewSql =
    s"""WITH po AS (
       |  SELECT doc_id, token, COUNT(*) AS cnt FROM (
       |    SELECT doc_id, unnest($ToksSql) AS token FROM documents)
       |  GROUP BY doc_id, token),
       |d AS (
       |  SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
       |    CAST(SUM(cnt) AS BIGINT) AS tf
       |  FROM po GROUP BY token),
       |n AS (SELECT df, tf, NTILE(10) OVER (ORDER BY df, token) AS decile FROM d)
       |SELECT decile, COUNT(*) AS n_tokens, MIN(df) AS min_df,
       |  MAX(df) AS max_df, CAST(SUM(tf) AS BIGINT) AS sum_tf
       |FROM n GROUP BY decile ORDER BY decile""".stripMargin

  /** MEASURED shard-mixing quality of the deterministic corpus
    * shuffle — per-shard language diversity beside the corpus-wide
    * number it should equal. A training export is only as good as its
    * mixing: a shard that over-represents one language turns
    * sequential training on that shard into a distribution-shift
    * step ([[xShuffleShard]] asserts reproducibility; THIS query
    * measures whether the reproducible order is also WELL-MIXED).
    * Diversity = Gini-Simpson 1 − Σ p², chosen over Shannon entropy
    * deliberately: it is RATIONAL in the group counts, so with the
    * per-language share quantized to BIGINT at 1e-6 before the
    * cross-language sum (the `x_mixture_temperature` order-free-
    * exactness rule) the whole statistic is exact integer arithmetic
    * + one final division — no transcendental whose last-ulp
    * cross-engine drift could flip a hash ([[xBloomFilter]]'s pow is
    * the documented exception, not the rule). The corpus-wide row
    * rides as shard −1 from the same single text-free pass; the
    * well-mixed law (every shard's simpson ≈ the corpus simpson) is
    * spec-asserted. One (shard,lang)-cardinality shuffle — at 100 TB
    * this is a few-KB aggregate no matter the corpus size.
    */
  def xShardMixing(spark: SparkSession, dir: String): DataFrame = {
    val key = TextOps.shingleHash(
      concat(lit("shuffle:"), col("doc_id").cast(StringType)))
    val tagged = Tables.documents(spark, dir)
      .select(col("lang"), (key % ShuffleShards).cast(IntegerType).as("shard"))
    val withCorpus = tagged.unionByName(
      tagged.select(col("lang"), lit(-1).as("shard")))
    val perLang = withCorpus.groupBy("shard", "lang")
      .agg(count(lit(1)).as("n_l"))
    val totals = perLang.groupBy("shard").agg(sum(col("n_l")).as("n_docs"))
    perLang.join(totals, Seq("shard"))
      .select(col("shard"), col("n_docs"),
        floor(col("n_l").cast(DoubleType) / col("n_docs").cast(DoubleType)
          * lit(1000000.0) + lit(0.5)).cast(LongType).as("q"))
      .groupBy("shard", "n_docs")
      .agg(count(lit(1)).as("n_langs"), sum(col("q") * col("q")).as("sq"))
      .select(col("shard"), col("n_docs"), col("n_langs"),
        (lit(1.0) - col("sq").cast(DoubleType) / lit(1.0e12)).as("simpson"))
      .orderBy("shard")
  }

  private[queries] val xShardMixingSql = {
    val k = shingleHashSql("'shuffle:' || CAST(doc_id AS VARCHAR)")
    s"""WITH t AS (
       |  SELECT lang, CAST($k % $ShuffleShards AS INT) AS shard FROM documents
       |  UNION ALL SELECT lang, -1 FROM documents),
       |pl AS (SELECT shard, lang, COUNT(*) AS n_l FROM t GROUP BY shard, lang),
       |tt AS (SELECT shard, CAST(SUM(n_l) AS BIGINT) AS n_docs FROM pl GROUP BY shard),
       |qq AS (
       |  SELECT pl.shard, tt.n_docs,
       |    CAST(FLOOR(CAST(n_l AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |      * 1000000.0 + 0.5) AS BIGINT) AS q
       |  FROM pl JOIN tt USING (shard))
       |SELECT shard, n_docs, COUNT(*) AS n_langs,
       |  1.0 - CAST(SUM(q * q) AS DOUBLE) / 1000000000000.0 AS simpson
       |FROM qq GROUP BY shard, n_docs ORDER BY shard""".stripMargin
  }

  /** Candidate-generation document-frequency cap for [[xContainment]]:
    * only shingles shared by ≤ this many docs generate candidate
    * pairs, bounding pair work by cap·|postings| (linear). 16 is far
    * above the organic df of content shingles on random-text corpora
    * (overwhelmingly 1-2) while excluding corpus boilerplate.
    */
  private[queries] val ContainDfCap = 16L

  /** ASYMMETRIC containment dedup — the near-dup class symmetric
    * Jaccard is structurally blind to: a short document fully
    * CONTAINED in a longer one (a quote, an excerpt, a truncated
    * crawl of the same page) has jaccard ≈ |A|/|B| — far below any
    * near-dup τ — while containment |A∩B|/min(|A|,|B|) is 1.0. The
    * Broder (1997) resemblance/containment pair, as a query. Because
    * the synthetic corpus has no natural truncations, the query
    * INJECTS deterministic ones (the [[xPiiRedact]] precedent):
    * every doc_id % 15 == 0 sample doc contributes a half-length
    * prefix copy at doc_id + 10^9, whose 3-shingles are a strict
    * subset of its source's by the prefix property — the output
    * must contain exactly those (source, copy) rows at
    * containment 1.0 with jaccard ≈ 0.5 (spec-asserted), plus any
    * organic near-dup pairs (high on BOTH measures).
    *
    * Candidate generation is DF-CAPPED (r11): the naive postings
    * self-join costs Σ df² over ALL shingles, which the sf1 matrix
    * measured at 19.5× per 10× data (df grows with the corpus, so the
    * sum is quadratic even on the doc_id % 3 sample). Candidates now
    * come only from shingles with df ≤ [[ContainDfCap]], bounding the
    * pair-generation join by cap·|postings| — LINEAR in the corpus —
    * and the intersection count is then computed EXACTLY over the
    * full shingle sets of the surviving candidate pairs (pair-bounded
    * fan-out, the two-stage filter-verify shape of every dedup path
    * here). The semantic trade is explicit and the right one for
    * containment: a contained doc shares ~all its shingles with its
    * container, so SOME shared shingle is rare unless the doc is made
    * entirely of corpus-boilerplate shingles — exactly the pairs a
    * containment audit should not surface anyway (CurationSpec pins
    * both directions: injected prefix-copies still found at 1.0, and
    * an all-boilerplate pair is excluded by the cap).
    */
  def xContainment(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val injected = docs.filter(col("doc_id") % 15 === 0)
      .select((col("doc_id") + lit(1000000000L)).as("doc_id"),
        slice(col("toks"), lit(1),
          ((size(col("toks")) + lit(1)) / lit(2)).cast(IntegerType)).as("toks"))
    val all = docs.unionByName(injected)
    val sh = all.select(col("doc_id"),
      array_distinct(TextOps.shingles(col("toks"), 3)).as("sh"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).cast(LongType).as("n_sh"))
    val posts = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val rareShingles = posts.groupBy("shingle").agg(count(lit(1)).as("df"))
      .filter(col("df") <= lit(ContainDfCap)).select("shingle")
    val rare = posts.join(rareShingles, Seq("shingle"))
    val cand = rare.as("a").join(rare.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(posts.select(col("doc_id").as("doc_a"), col("shingle")), Seq("doc_a"))
      .join(posts.select(col("doc_id").as("doc_b"), col("shingle")),
        Seq("doc_b", "shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"), col("n_inter"),
        (col("n_inter").cast(DoubleType) /
          (col("na") + col("nb") - col("n_inter")).cast(DoubleType)).as("jaccard"),
        (col("n_inter").cast(DoubleType) /
          least(col("na"), col("nb")).cast(DoubleType)).as("containment"))
      .filter(col("containment") >= 0.8)
      .orderBy("doc_a", "doc_b")
  }

  private[queries] val xContainmentSql =
    s"""WITH base AS (
       |  SELECT doc_id, $ToksSql AS toks FROM documents WHERE doc_id % 3 = 0),
       |inj AS (
       |  SELECT doc_id + 1000000000 AS doc_id,
       |    toks[1:((len(toks) + 1) // 2)] AS toks
       |  FROM base WHERE doc_id % 15 = 0),
       |alldocs AS (SELECT * FROM base UNION ALL SELECT * FROM inj),
       |sh AS (SELECT doc_id, list_distinct(${shinglesSql("toks", 3)}) AS sh FROM alldocs),
       |sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh FROM sh),
       |posts AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
       |rare AS (
       |  SELECT p.doc_id, p.shingle FROM posts p
       |  JOIN (SELECT shingle FROM posts GROUP BY shingle
       |        HAVING COUNT(*) <= $ContainDfCap) r USING (shingle)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
       |  FROM cand c
       |  JOIN posts pa ON pa.doc_id = c.doc_a
       |  JOIN posts pb ON pb.doc_id = c.doc_b AND pb.shingle = pa.shingle
       |  GROUP BY 1, 2)
       |SELECT i.doc_a, i.doc_b, sa.n_sh AS na, sb.n_sh AS nb, i.n_inter,
       |  CAST(i.n_inter AS DOUBLE)
       |    / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) AS jaccard,
       |  CAST(i.n_inter AS DOUBLE)
       |    / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE) AS containment
       |FROM inter i
       |JOIN sz sa ON i.doc_a = sa.doc_id
       |JOIN sz sb ON i.doc_b = sb.doc_id
       |WHERE CAST(i.n_inter AS DOUBLE)
       |    / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE) >= 0.8
       |ORDER BY doc_a, doc_b""".stripMargin

  /** MEASURED cluster coherence of the stored IVF index — per-cell
    * simplified silhouette (Kaufman & Rousseeuw's silhouette with the
    * centroid standing in for the cluster mean distance): for each
    * vector, a = cosine distance to its rank-1 centroid, b = to its
    * rank-2 centroid, s = (b − a)/max(a, b) ∈ [0, 1] (b ≥ a by the
    * rank ordering). The index-health audit beside
    * `x_ivf_retrain_drift`: drift says the corpus MOVED, silhouette
    * says whether the partition is geometrically meaningful at all —
    * on this uniform-sphere corpus the honest reading is s near 0
    * (no real cluster structure; cells are Voronoi tiles of noise),
    * and a REAL corpus's falling silhouette is the signal to retrain
    * or re-k. Consumes ONLY the two stored index relations (the
    * replicated rank-≤2 assignment already carries both cells —
    * zero new assignment work, plan-guarded); per-vector s is
    * quantized to BIGINT at 1e-6 before the per-cell mean (the
    * order-free-exactness rule), so the audit hash-matches. One
    * broadcast centroid join + one k-cell-cardinality shuffle;
    * at 100 TB: map-side over the cell-bucketed index, k-row output.
    */
  def xIvfSilhouette(spark: SparkSession, dir: String): DataFrame = {
    val scored = ivfAssigned(spark, dir)
      .join(broadcast(ivfCentroids(spark, dir)), col("cell") === col("c_id"))
      .select(col("vec_id"), col("cell"), col("cell_rank"),
        (lit(1.0) - Similarity.cosineWithNorms(col("embedding"), col("c_emb"),
          col("v_norm"), col("c_norm"))).as("d"))
    val d1 = scored.filter(col("cell_rank") === 1)
      .select(col("vec_id"), col("cell"), col("d").as("d1"))
    val d2 = scored.filter(col("cell_rank") === 2)
      .select(col("vec_id"), col("d").as("d2"))
    d1.join(d2, Seq("vec_id"))
      .select(col("cell"),
        when(greatest(col("d1"), col("d2")) === lit(0.0), lit(0L))
          .otherwise(floor((col("d2") - col("d1")) / greatest(col("d1"), col("d2"))
            * lit(1000000.0) + lit(0.5)).cast(LongType)).as("s_q"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vecs"), sum(col("s_q")).as("sum_q"))
      .select(col("cell"), col("n_vecs"),
        (col("sum_q").cast(DoubleType) / col("n_vecs").cast(DoubleType)
          / lit(1000000.0)).as("mean_sil"))
      .orderBy("cell")
  }

  private[queries] lazy val xIvfSilhouetteSql =
    s"""WITH $ivfTrainCtes,
       |assigned AS (
       |  SELECT vec_id, embedding, cell, rn AS cell_rank FROM (
       |    SELECT e.vec_id, e.embedding, c.c_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
       |        ORDER BY ${cosSql("e.embedding", "c.c_emb")} DESC, c.c_id) AS rn
       |    FROM embeddings e CROSS JOIN c$IvfIters c) WHERE rn <= $IvfAssign),
       |sc AS (
       |  SELECT a.vec_id, a.cell, a.cell_rank,
       |    1.0 - ${cosSql("a.embedding", "c.c_emb")} AS d
       |  FROM assigned a JOIN c$IvfIters c ON a.cell = c.c_id),
       |p AS (
       |  SELECT d1.cell,
       |    CASE WHEN GREATEST(d1.d, d2.d) = 0 THEN CAST(0 AS BIGINT)
       |         ELSE CAST(FLOOR((d2.d - d1.d) / GREATEST(d1.d, d2.d)
       |           * 1000000.0 + 0.5) AS BIGINT) END AS s_q
       |  FROM (SELECT vec_id, cell, d FROM sc WHERE cell_rank = 1) d1
       |  JOIN (SELECT vec_id, d FROM sc WHERE cell_rank = 2) d2 USING (vec_id))
       |SELECT cell, COUNT(*) AS n_vecs,
       |  CAST(SUM(s_q) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0 AS mean_sil
       |FROM p GROUP BY cell ORDER BY cell""".stripMargin

  /** Doc-level flags + final shard assignment for ONE corpus release —
    * the end-to-end composition every stage query verifies alone:
    * curation gate (quality ∧ repetition ∧ decontamination) ∧
    * canonical dedup → group-keyed train split (leakage-free by
    * construction) → temperature-mixture acceptance with rates
    * computed over the SURVIVING train docs (a release mixes what it
    * ships, not the raw crawl) → deterministic shuffle-shard. Returns
    * (flags relation localCheckpoint'd — ONE materialization of the
    * shared lineage instead of five recomputes for the five manifest
    * legs — the `novelExactTop1` bounded-state precedent; it is
    * doc-cardinality × 5 small columns), plus the mixed and sharded
    * selections derived from it.
    *
    * Scale shape: every input is the stored-state serving path (bench
    * grams broadcast, component labels stored, split is arithmetic);
    * the joins are doc-cardinality equi-joins on doc_id; mixture
    * rates are source-cardinality aggregates broadcast back; the
    * shard key is map-side arithmetic — no corpus-wide window
    * anywhere.
    */
  private[queries] def releaseSelection(
      spark: SparkSession, dir: String): (DataFrame, DataFrame, DataFrame) = {
    val docs = Tables.documents(spark, dir)
    val gate = serveCurationGate(spark, dir, docs)
      .select(col("doc_id"), (col("keep") === "Y").as("gk"))
    val canon = xDedupCanonical(spark, dir)
      .select(col("doc_id"), col("is_kept").as("dk"))
    val split = serveSplitAssign(spark, dir, docs)
      .select(col("doc_id"), col("split_group"))
    val flags = docs.select(col("doc_id"), col("source"))
      .join(gate, Seq("doc_id")).join(canon, Seq("doc_id")).join(split, Seq("doc_id"))
      .withColumn("curated", col("gk") && col("dk"))
      .withColumn("train", col("curated") && col("split_group") === "train")
      .withColumn("bucket",
        (TextOps.shingleHash(col("doc_id").cast(StringType)) % 10000)
          .cast(IntegerType))
      .localCheckpoint()
    val surv = flags.filter(col("train"))
    // mixture thresholds over the surviving train docs — the
    // xMixtureSample formula (weights from the source id, cap at the
    // scarcest source's budget, floor-quantized per-source threshold)
    val w = (substring(col("source"), 4, 10).cast(IntegerType) % 3 + 1).cast(LongType)
    val counts = surv.groupBy("source").agg(count(lit(1)).as("n")).withColumn("w", w)
    val totals = counts.agg(sum(col("w")).as("wsum"))
    val withScale = counts.crossJoin(broadcast(totals))
      .withColumn("cap", col("n").cast(DoubleType) * col("wsum").cast(DoubleType)
        / col("w").cast(DoubleType))
    val tMin = withScale.agg(min(col("cap")).as("t"))
    val rates = withScale.crossJoin(broadcast(tMin))
      .withColumn("threshold",
        floor((col("w").cast(DoubleType) * col("t") * lit(10000.0))
          / (col("wsum").cast(DoubleType) * col("n").cast(DoubleType))).cast(IntegerType))
      .select("source", "threshold")
    val mixed = surv.join(broadcast(rates), "source")
      .filter(col("bucket") < col("threshold"))
    val sharded = mixed.withColumn("shard",
      (TextOps.shingleHash(concat(lit("shuffle:"), col("doc_id").cast(StringType)))
        % ShuffleShards).cast(IntegerType))
    (flags, mixed, sharded)
  }

  /** The release MANIFEST as an oracle query: per-stage row accounting
    * for the full funnel→dedup→split→mixture→shard composition, plus
    * one row per final shard. The DuckDB twin recomposes the same
    * chain from the shared CTE fragments (curation flags, component
    * labels, split assignment, mixture rates over the survivors), so
    * a hash match proves the STAGES COMPOSE — each keep-set feeding
    * the next stage exactly — not just that each stage works alone.
    */
  def xReleasePipeline(spark: SparkSession, dir: String): DataFrame = {
    val (flags, mixed, sharded) = releaseSelection(spark, dir)
    def c1(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_rows")).select(lit(name).as("stage"), col("n_rows"))
    c1("1_corpus", flags)
      .unionByName(c1("2_curated", flags.filter(col("curated"))))
      .unionByName(c1("3_train", flags.filter(col("train"))))
      .unionByName(c1("4_mixture", mixed))
      .unionByName(sharded.groupBy("shard").agg(count(lit(1)).as("n_rows"))
        .select(concat(lit("5_shard_"), col("shard").cast(StringType)).as("stage"),
          col("n_rows")))
      .orderBy("stage")
  }

  private[queries] lazy val xReleasePipelineSql = {
    val mbucket = shingleHashSql("CAST(doc_id AS VARCHAR)") + " % 10000"
    val shardKey = shingleHashSql("'shuffle:' || CAST(doc_id AS VARCHAR)")
    s"""WITH RECURSIVE $componentsCtes,
       |$curationFlagsCtes,
       |$splitAsgCtes,
       |surv AS (
       |  SELECT f.doc_id, d.source, CAST($mbucket AS INT) AS bucket
       |  FROM fl f JOIN ssp s USING (doc_id) JOIN documents d USING (doc_id)
       |  WHERE f.qk = 1 AND f.rk = 1 AND f.ck = 1 AND f.dk = 1
       |    AND s.split_group = 'train'),
       |mcnt AS (SELECT source, COUNT(*) AS n,
       |    CAST(CAST(substr(source, 4) AS INT) % 3 + 1 AS BIGINT) AS w
       |  FROM surv GROUP BY source),
       |mws AS (SELECT SUM(w) AS wsum FROM mcnt),
       |msc AS (SELECT source, n, w, wsum,
       |    CAST(n AS DOUBLE) * CAST(wsum AS DOUBLE) / CAST(w AS DOUBLE) AS cap
       |  FROM mcnt CROSS JOIN mws),
       |mmin AS (SELECT MIN(cap) AS t FROM msc),
       |mr AS (SELECT source,
       |    CAST(FLOOR((CAST(w AS DOUBLE) * t * 10000.0)
       |      / (CAST(wsum AS DOUBLE) * CAST(n AS DOUBLE))) AS INT) AS threshold
       |  FROM msc CROSS JOIN mmin),
       |mixed AS (
       |  SELECT surv.doc_id FROM surv JOIN mr ON surv.source = mr.source
       |  WHERE surv.bucket < mr.threshold),
       |shards AS (
       |  SELECT doc_id, CAST($shardKey % $ShuffleShards AS INT) AS shard FROM mixed)
       |SELECT stage, n_rows FROM (
       |  SELECT '1_corpus' AS stage, CAST(COUNT(*) AS BIGINT) AS n_rows FROM documents
       |  UNION ALL
       |  SELECT '2_curated', CAST(SUM(qk * rk * ck * dk) AS BIGINT) FROM fl
       |  UNION ALL
       |  SELECT '3_train', CAST(COUNT(*) AS BIGINT) FROM surv
       |  UNION ALL
       |  SELECT '4_mixture', CAST(COUNT(*) AS BIGINT) FROM mixed
       |  UNION ALL
       |  SELECT '5_shard_' || CAST(shard AS VARCHAR), CAST(COUNT(*) AS BIGINT)
       |  FROM shards GROUP BY shard)
       |ORDER BY stage""".stripMargin
  }

  /** MEASURED blocking recall of [[xContainment]]'s df-capped
    * candidate generation — the honesty query the r11 reshape owes
    * (the `x_dedup_lsh_quality` contract applied to containment): on
    * a BOUNDED doc subsample, compute the EXACT containment-pair
    * truth via the full postings self-join (affordable because the
    * subsample is pinned ~500 docs by a data-scaled modulus, Σ df²
    * over 500 docs regardless of corpus size), then report how many
    * true pairs the df ≤ [[ContainDfCap]] blocking also generates as
    * candidates. A recall below 1.0 is the measured size of the
    * cap's semantic trade (pairs whose EVERY shared shingle is
    * corpus boilerplate), not an assertion.
    *
    * Subsample modulus = 3·max(1, n_docs div 1500) — a multiple of 3
    * so the audit universe nests inside the query's own doc_id % 3
    * sample (injected prefix copies included, same construction); at
    * small SFs the floor keeps modulus 3, i.e. the audit covers the
    * full x_containment universe.
    */
  def xContainmentQuality(spark: SparkSession, dir: String): DataFrame = {
    val qm = IvfStore.kFor(s"containq-mod:$dir") {
      val n = Tables.documents(spark, dir).count()
      (3L * math.max(1L, n / 1500L)).toInt
    }
    val docs = Tables.documents(spark, dir).filter(col("doc_id") % qm === 0)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val injected = docs.filter(col("doc_id") % 15 === 0)
      .select((col("doc_id") + lit(1000000000L)).as("doc_id"),
        slice(col("toks"), lit(1),
          ((size(col("toks")) + lit(1)) / lit(2)).cast(IntegerType)).as("toks"))
    val all = docs.unionByName(injected)
    val sh = all.select(col("doc_id"),
      array_distinct(TextOps.shingles(col("toks"), 3)).as("sh"))
    val sizes = sh.select(col("doc_id"), size(col("sh")).cast(LongType).as("n_sh"))
    val posts = sh.select(col("doc_id"), explode(col("sh")).as("shingle"))
    // exact truth: full self-join — bounded by the pinned subsample
    val truth = posts.as("a").join(posts.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .filter(col("n_inter").cast(DoubleType) /
        least(col("na"), col("nb")).cast(DoubleType) >= 0.8)
      .select("doc_a", "doc_b")
    // the blocking under audit: same df-cap rule as x_containment
    val rare = posts.join(
      posts.groupBy("shingle").agg(count(lit(1)).as("df"))
        .filter(col("df") <= lit(ContainDfCap)).select("shingle"), Seq("shingle"))
    val cand = rare.as("a").join(rare.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val nDocs = all.agg(count(lit(1)).as("n_docs"))
    truth.join(cand.withColumn("_found", lit(1)), Seq("doc_a", "doc_b"), "left")
      .agg(count(lit(1)).as("n_true_pairs"),
        sum(when(col("_found").isNotNull, 1L).otherwise(0L)).as("n_found"))
      .crossJoin(broadcast(nDocs)) // 1-row scalar
      .select(col("n_docs"),
        coalesce(col("n_true_pairs"), lit(0L)).as("n_true_pairs"),
        coalesce(col("n_found"), lit(0L)).as("n_found"),
        (col("n_found").cast(DoubleType) /
          nullif(col("n_true_pairs").cast(DoubleType), lit(0.0)))
          .as("blocking_recall"))
  }

  private[queries] lazy val xContainmentQualitySql = {
    val qm = "3 * GREATEST(1, (SELECT COUNT(*) FROM documents) // 1500)"
    s"""WITH base AS (
       |  SELECT doc_id, $ToksSql AS toks FROM documents WHERE doc_id % ($qm) = 0),
       |inj AS (
       |  SELECT doc_id + 1000000000 AS doc_id,
       |    toks[1:((len(toks) + 1) // 2)] AS toks
       |  FROM base WHERE doc_id % 15 = 0),
       |alldocs AS (SELECT * FROM base UNION ALL SELECT * FROM inj),
       |sh AS (SELECT doc_id, list_distinct(${shinglesSql("toks", 3)}) AS sh FROM alldocs),
       |sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh FROM sh),
       |posts AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
       |truth AS (
       |  SELECT i.doc_a, i.doc_b FROM (
       |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
       |    FROM posts a JOIN posts b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |    GROUP BY 1, 2) i
       |  JOIN sz sa ON i.doc_a = sa.doc_id
       |  JOIN sz sb ON i.doc_b = sb.doc_id
       |  WHERE CAST(i.n_inter AS DOUBLE)
       |      / CAST(LEAST(sa.n_sh, sb.n_sh) AS DOUBLE) >= 0.8),
       |rare AS (
       |  SELECT p.doc_id, p.shingle FROM posts p
       |  JOIN (SELECT shingle FROM posts GROUP BY shingle
       |        HAVING COUNT(*) <= $ContainDfCap) r USING (shingle)),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
       |nd AS (SELECT COUNT(*) AS n_docs FROM alldocs),
       |agg AS (
       |  SELECT COUNT(*) AS n_true_pairs,
       |    CAST(SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_found
       |  FROM truth t LEFT JOIN cand c
       |    ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)
       |SELECT nd.n_docs, agg.n_true_pairs, agg.n_found,
       |  CAST(agg.n_found AS DOUBLE)
       |    / NULLIF(CAST(agg.n_true_pairs AS DOUBLE), 0.0) AS blocking_recall
       |FROM agg CROSS JOIN nd""".stripMargin
  }

  /** ONE micro-batch's release-ledger partial — the streaming
    * decomposition of [[xReleasePipeline]] (the r10 verdict's "stream
    * the release manifest"): arriving docs run the SAME serving paths
    * the batch release uses (curation gate against broadcast bench
    * grams; canonical-dedup keep flag JOINED from the stored
    * component-label relation — the `x_dedup_incremental` pattern,
    * corpus-wide ranking stays a batch refresh; split and shard
    * assignment are pure hash arithmetic) and reduce to: three scalar
    * stage counters plus a (source, bucket, shard) → n count ledger
    * over the train survivors. Everything here is a commutative
    * monoid, so per-batch partials sum-merge into stored state and
    * batch chopping is invisible (spec-pinned).
    *
    * Why ledger rows carry `bucket`: the mixture THRESHOLD is a
    * function of the full surviving-train source counts, unknowable
    * mid-stream — so the state stores the per-(source, bucket, shard)
    * sufficient statistic and [[releaseManifestFromLedger]] applies
    * the threshold at read time. State cardinality is bounded by
    * |sources| × 10000 buckets × shard count — CORPUS-INDEPENDENT,
    * the CMS-sink economics: a 100 TB ingest year keeps the same
    * few-million-row ceiling.
    */
  def releaseLedgerDelta(spark: SparkSession, dir: String, docs: DataFrame): DataFrame = {
    val gate = serveCurationGate(spark, dir, docs)
      .select(col("doc_id"), (col("keep") === "Y").as("gk"))
    val canon = xDedupCanonical(spark, dir)
      .select(col("doc_id"), col("is_kept").as("dk"))
    val split = serveSplitAssign(spark, dir, docs)
      .select(col("doc_id"), col("split_group"))
    val flags = docs.select(col("doc_id"), col("source"))
      .join(gate, Seq("doc_id")).join(canon, Seq("doc_id")).join(split, Seq("doc_id"))
      .withColumn("curated", col("gk") && col("dk"))
      .withColumn("train", col("curated") && (col("split_group") === "train"))
    val nullS = lit(null).cast(StringType)
    val nullI = lit(null).cast(IntegerType)
    val scalarRows = flags
      .agg(
        count(lit(1)).as("n_corpus"),
        sum(when(col("curated"), 1L).otherwise(0L)).as("n_curated"),
        sum(when(col("train"), 1L).otherwise(0L)).as("n_train"))
      .select(explode(array(
        struct(lit("corpus").as("kind"), col("n_corpus").as("n")),
        struct(lit("curated").as("kind"), col("n_curated").as("n")),
        struct(lit("train").as("kind"), col("n_train").as("n")))).as("s"))
      .select(col("s.kind").as("kind"), nullS.as("source"),
        nullI.as("bucket"), nullI.as("shard"), col("s.n").as("n"))
    val ledger = flags.filter(col("train"))
      .withColumn("bucket",
        (TextOps.shingleHash(col("doc_id").cast(StringType)) % 10000)
          .cast(IntegerType))
      .withColumn("shard",
        (TextOps.shingleHash(concat(lit("shuffle:"), col("doc_id").cast(StringType)))
          % ShuffleShards).cast(IntegerType))
      .groupBy("source", "bucket", "shard").agg(count(lit(1)).as("n"))
      .select(lit("ledger").as("kind"), col("source"), col("bucket"),
        col("shard"), col("n"))
    scalarRows.unionByName(ledger)
  }

  /** The release MANIFEST read off the streamed ledger state — the
    * ingest-time view of [[xReleasePipeline]], readable mid-stream at
    * any point: scalar stages come straight from their counters;
    * mixture thresholds are recomputed from the ledger's per-source
    * train counts with the batch release's EXACT formula (same
    * double-arithmetic chain on the same integers → identical
    * thresholds), then 4_mixture / per-shard rows are threshold-
    * filtered ledger sums. `EventStreamSpec` pins this row-equal to
    * the batch `x_release_pipeline` over the same documents. All
    * aggregates run on the bounded-cardinality state relation — never
    * the corpus.
    */
  def releaseManifestFromLedger(state: DataFrame): DataFrame = {
    def scalarRow(kind: String, stage: String) =
      state.filter(col("kind") === kind)
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_rows"))
        .select(lit(stage).as("stage"), col("n_rows"))
    val led = state.filter(col("kind") === "ledger")
    val w = (substring(col("source"), 4, 10).cast(IntegerType) % 3 + 1).cast(LongType)
    val counts = led.groupBy("source").agg(sum(col("n")).as("n")).withColumn("w", w)
    val totals = counts.agg(sum(col("w")).as("wsum"))
    val withScale = counts.crossJoin(broadcast(totals))
      .withColumn("cap", col("n").cast(DoubleType) * col("wsum").cast(DoubleType)
        / col("w").cast(DoubleType))
    val tMin = withScale.agg(min(col("cap")).as("t"))
    val rates = withScale.crossJoin(broadcast(tMin))
      .withColumn("threshold",
        floor((col("w").cast(DoubleType) * col("t") * lit(10000.0))
          / (col("wsum").cast(DoubleType) * col("n").cast(DoubleType))).cast(IntegerType))
      .select("source", "threshold")
    val mixedLed = led.join(broadcast(rates), "source")
      .filter(col("bucket") < col("threshold"))
    scalarRow("corpus", "1_corpus")
      .unionByName(scalarRow("curated", "2_curated"))
      .unionByName(scalarRow("train", "3_train"))
      .unionByName(mixedLed
        .agg(coalesce(sum(col("n")), lit(0L)).as("n_rows"))
        .select(lit("4_mixture").as("stage"), col("n_rows")))
      .unionByName(mixedLed.groupBy("shard").agg(sum(col("n")).as("n_rows"))
        .select(concat(lit("5_shard_"), col("shard").cast(StringType)).as("stage"),
          col("n_rows")))
      .orderBy("stage")
  }

  /** Materialize the release: JSONL shards under `outDir` (one
    * directory per shard, rows sorted by shuffle key within each) plus
    * the manifest. The write path a training job consumes; the spec
    * pins written-row accounting equal to the manifest.
    */
  def exportRelease(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    val (_, _, sharded) = releaseSelection(spark, dir)
    val texts = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    sharded.select(col("doc_id"), col("source"), col("shard"))
      .join(texts, Seq("doc_id"))
      .withColumn("shuffle_key",
        TextOps.shingleHash(concat(lit("shuffle:"), col("doc_id").cast(StringType))))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("shuffle_key"), col("doc_id"))
      .write.mode("overwrite").partitionBy("shard").json(outDir)
    xReleasePipeline(spark, dir)
  }
}
