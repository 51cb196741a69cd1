package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

import graft.Tables
import graft.ext.{BpeTrainer, Dedup, Graph, IvfIndex, IvfStore, Multimodal, PqIndex, RelationStore, Similarity, TextOps, TopK, ZOrder}

/** Text analysis and quality: stats, token counts, lang-id, fingerprints, quality gates, TF-IDF, chunking
  * — split from the monolithic ExtQueries in r10; mixes into
  * [[ExtQueries]] (self-typed), which carries the oracle-strategy
  * contract and the `queries`/`oracleSql` registries.
  */
private[queries] trait TextQueries { this: ExtQueries.type =>
  // ===================================================================
  // Text analysis
  // ===================================================================

  /** Per-document token/quality statistics — one map-side pass. */
  def xTextStats(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        col("n_chars"),
        // BIGINT like DuckDB len() — the driver's schema compare is strict
        size(toks).cast(LongType).as("n_tokens"),
        size(array_distinct(toks)).cast(LongType).as("n_uniq"),
        TextOps.stopwordCount(toks).cast(LongType).as("stopword_cnt"),
        TextOps.avgTokenLen(toks).as("avg_token_len"))
      .withColumn("uniq_ratio",
        col("n_uniq").cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .withColumn("stopword_ratio",
        col("stopword_cnt").cast(DoubleType) / col("n_tokens").cast(DoubleType))
      .withColumn("quality_score",
        col("uniq_ratio") - col("stopword_ratio") + col("avg_token_len") / 10.0)
      .orderBy("doc_id")
  }

  private[queries] val xTextStatsSql = {
    val toks = "toks"
    s"""WITH t AS (SELECT doc_id, n_chars, $ToksSql AS toks FROM documents),
       |s AS (SELECT doc_id, n_chars,
       |  len($toks) AS n_tokens,
       |  len(list_distinct($toks)) AS n_uniq,
       |  len(list_filter($toks, t -> t IN ${inList(TextOps.Stopwords)})) AS stopword_cnt,
       |  CASE WHEN len($toks) = 0 THEN NULL ELSE
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform($toks, t -> CAST(length(t) AS BIGINT))), (acc, x) -> acc + x) AS DOUBLE)
       |    / CAST(len($toks) AS DOUBLE) END AS avg_token_len
       |  FROM t)
       |SELECT doc_id, n_chars, n_tokens, n_uniq, stopword_cnt, avg_token_len,
       |  CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS uniq_ratio,
       |  CAST(stopword_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
       |  CAST(n_uniq AS DOUBLE) / CAST(n_tokens AS DOUBLE)
       |    - CAST(stopword_cnt AS DOUBLE) / CAST(n_tokens AS DOUBLE)
       |    + avg_token_len / 10.0 AS quality_score
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Token counting: whitespace tokens + regex (BPE-ish) tokens. */
  def xTokenCount(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(toks).cast(LongType).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0))).cast(LongType).as("re_tokens"),
        (col("n_chars").cast(DoubleType) / size(toks).cast(DoubleType)).as("chars_per_token"))
      .orderBy("doc_id")
  }

  private[queries] val xTokenCountSql =
    s"""SELECT doc_id,
       |  len($ToksSql) AS ws_tokens,
       |  len(regexp_extract_all(text, '[a-z0-9]+')) AS re_tokens,
       |  CAST(n_chars AS DOUBLE) / CAST(len($ToksSql) AS DOUBLE) AS chars_per_token
       |FROM documents ORDER BY doc_id""".stripMargin

  /** N-gram-heuristic language ID: marker-set scores + deterministic
    * argmax (see TextOps.LangMarkers for why this demonstrates the
    * operator shape, not label recovery, on this synthetic corpus).
    */
  def xLangId(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val scored = Tables.documents(spark, dir).select(
      col("doc_id") +: col("lang") +:
        TextOps.LangMarkers.map { case (l, ms) =>
          TextOps.markerCount(toks, ms).cast(LongType).as(s"score_$l") }: _*)
    val scores = TextOps.LangMarkers.map { case (l, _) => l -> col(s"score_$l") }
    scored
      .withColumn("predicted", TextOps.predictedLang(scores))
      .withColumn("is_match", when(col("predicted") === col("lang"), "Y").otherwise("N"))
      .orderBy("doc_id")
  }

  private[queries] val xLangIdSql = {
    val scoreExprs = TextOps.LangMarkers.map { case (l, ms) =>
      s"len(list_filter(toks, t -> t IN ${inList(ms)})) AS score_$l"
    }.mkString(",\n  ")
    s"""WITH t AS (SELECT doc_id, lang, $ToksSql AS toks FROM documents),
       |s AS (SELECT doc_id, lang,
       |  $scoreExprs
       |FROM t)
       |SELECT doc_id, lang, score_en, score_es, score_de,
       |  CASE WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
       |       WHEN score_es >= score_de THEN 'es' ELSE 'de' END AS predicted,
       |  CASE WHEN (CASE WHEN score_en >= score_es AND score_en >= score_de THEN 'en'
       |       WHEN score_es >= score_de THEN 'es' ELSE 'de' END) = lang
       |    THEN 'Y' ELSE 'N' END AS is_match
       |FROM s ORDER BY doc_id""".stripMargin
  }

  /** Document fingerprints: order-free (md5), order-sensitive
    * (polynomial rolling hash), and min-shingle (winnowing-lite).
    */
  def xFingerprint(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("content_md5"),
        TextOps.rollingHash(toks).as("rolling_hash"),
        call_function("min_shingle", toks, lit(3)).as("min_shingle")) // native
      .orderBy("doc_id")
  }

  private[queries] val xFingerprintSql =
    s"""WITH t AS (SELECT doc_id, text, $ToksSql AS toks FROM documents)
       |SELECT doc_id, md5(text) AS content_md5,
       |  ${rollingSql("toks")} AS rolling_hash,
       |  list_min(list_transform(${shinglesSql("toks", 3)}, s -> md5(s))) AS min_shingle
       |FROM t ORDER BY doc_id""".stripMargin

  /** Deterministic held-out splitting — every document routed to
    * train/valid/test (80/10/10) by a hash bucket of its id, never by
    * `rand()`: the assignment is reproducible across runs, engines and
    * cluster sizes (the property a training pipeline needs so examples
    * can't leak between splits when the corpus is re-processed).
    * Map-side, zero shuffle; the bucket reuses the md5-prefix integer
    * packing both engines already share (`TextOps.shingleHash`).
    */
  def xSplitSample(spark: SparkSession, dir: String): DataFrame = {
    val bucket = (TextOps.shingleHash(col("doc_id").cast(org.apache.spark.sql.types.StringType)) % 100)
      .cast(IntegerType)
    Tables.documents(spark, dir)
      .select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "valid")
          .otherwise("test"))
      .orderBy("doc_id")
  }

  private[queries] val xSplitSampleSql =
    s"""WITH b AS (SELECT doc_id,
       |    CAST(${shingleHashSql("CAST(doc_id AS VARCHAR)")} % 100 AS INT) AS bucket
       |  FROM documents)
       |SELECT doc_id, bucket,
       |  CASE WHEN bucket < 80 THEN 'train'
       |       WHEN bucket < 90 THEN 'valid' ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin

  /** Heuristic quality filtering — the C4-style keep/drop gate of a
    * training-data pipeline: length window, vocabulary-diversity floor,
    * stopword-density ceiling, each a deterministic integer-ratio rule
    * so the decision (and the FIRST failing reason, evaluated in rule
    * order) oracles exactly. One map-side pass, zero shuffles.
    */
  def xQualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val base = Tables.documents(spark, dir).select(
      col("doc_id"),
      size(toks).cast(LongType).as("n_tokens"),
      (size(array_distinct(toks)).cast(DoubleType) / size(toks).cast(DoubleType))
        .as("uniq_ratio"),
      (TextOps.stopwordCount(toks).cast(DoubleType) / size(toks).cast(DoubleType))
        .as("stopword_ratio"))
    base
      .withColumn("drop_reason",
        when(col("n_tokens") < TextOps.MinTokens, "too_short")
          .when(col("n_tokens") > TextOps.MaxTokens, "too_long")
          .when(col("uniq_ratio") < TextOps.MinUniqRatio, "low_diversity")
          .when(col("stopword_ratio") > TextOps.MaxStopwordRatio, "stopword_heavy"))
      .withColumn("keep", when(col("drop_reason").isNull, "Y").otherwise("N"))
      .orderBy("doc_id")
  }

  private[queries] val xQualityFilterSql =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |s AS (SELECT doc_id,
       |    len(toks) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS uniq_ratio,
       |    CAST(len(list_filter(toks, x -> x IN ${inList(TextOps.Stopwords)})) AS DOUBLE)
       |      / CAST(len(toks) AS DOUBLE) AS stopword_ratio
       |  FROM t)
       |SELECT doc_id, n_tokens, uniq_ratio, stopword_ratio,
       |  CASE WHEN n_tokens < 5 THEN 'too_short'
       |       WHEN n_tokens > 1000 THEN 'too_long'
       |       WHEN uniq_ratio < 0.3 THEN 'low_diversity'
       |       WHEN stopword_ratio > 0.5 THEN 'stopword_heavy' END AS drop_reason,
       |  CASE WHEN (CASE WHEN n_tokens < 5 THEN 'too_short'
       |       WHEN n_tokens > 1000 THEN 'too_long'
       |       WHEN uniq_ratio < 0.3 THEN 'low_diversity'
       |       WHEN stopword_ratio > 0.5 THEN 'stopword_heavy' END) IS NULL
       |    THEN 'Y' ELSE 'N' END AS keep
       |FROM s ORDER BY doc_id""".stripMargin

  /** Per-document top-3 terms by TF-IDF — corpus-level term weighting
    * (one explode + two aggregations + a bounded window). IDF is the
    * PLAIN ratio N/df, not log(N/df): both engines then compute the
    * score with exactly two IEEE divisions and one multiply (identical
    * nearest-double results), where `ln` is libm-implementation-
    * dependent and would break the exact oracle. At corpus scale:
    * token explode is map-side; df is one shuffle on the token; the
    * top-k window is per-document (tiny partitions).
    */
  def xTfidfTopTerms(spark: SparkSession, dir: String): DataFrame = {
    // tf is the STORED posting relation (one row per (doc, token) with
    // cnt and len — see `postings`): df derives FROM it (each
    // (doc, token) appears once, so a plain per-token count IS the
    // document frequency) — zero corpus passes here, where the naive
    // form re-explodes the corpus AND pays an Expand-based
    // countDistinct for df. Reading the store twice (tf + df legs) is
    // two scans of the compact posting parquet, not a recompute — and
    // not a `localCheckpoint`, whose pinned corpus-sized blocks were
    // the r6 verdict's one growing residency cost.
    val tf = postings(spark, dir)
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val byDoc = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
    tf.join(df, "token")
      .crossJoin(broadcast(n)) // 1-row scalar, in-plan
      .withColumn("tfidf",
        (col("cnt").cast(DoubleType) / col("len").cast(DoubleType)) *
          (col("n_docs").cast(DoubleType) / col("df").cast(DoubleType)))
      .withColumn("rank", row_number().over(byDoc).cast(LongType))
      .filter(col("rank") <= 3)
      .select("doc_id", "token", "cnt", "df", "tfidf", "rank")
      .orderBy("doc_id", "rank")
  }

  private[queries] val xTfidfTopTermsSql =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |e AS (SELECT doc_id, len(toks) AS len, unnest(toks) AS token FROM t),
       |tf AS (SELECT doc_id, len, token, COUNT(*) AS cnt FROM e GROUP BY 1, 2, 3),
       |df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM e GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT tf.doc_id, tf.token, tf.cnt, df.df,
       |    (CAST(tf.cnt AS DOUBLE) / CAST(tf.len AS DOUBLE))
       |      * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf
       |  FROM tf JOIN df USING (token) CROSS JOIN n)
       |SELECT doc_id, token, cnt, df, tfidf,
       |  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
       |FROM scored QUALIFY rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** Token-window chunking — the context-packing step of a training
    * pipeline: each document's token stream split into fixed 64-token
    * windows (last one ragged), emitted as (doc_id, chunk_idx, token
    * count, rejoined text). Pure map-side (sequence + slice + explode,
    * no shuffle); chunk count = floor((len+63)/64), exact in both
    * engines because /64 is a power-of-two division.
    */
  def xChunkTokens(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        posexplode(TextOps.chunks(col("toks"), 64)).as(Seq("pos", "chunk")))
      .select(
        col("doc_id"),
        col("pos").cast(LongType).as("chunk_idx"),
        size(col("chunk")).cast(LongType).as("n_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
      .orderBy("doc_id", "chunk_idx")
  }

  private[queries] val xChunkTokensSql =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |c AS (SELECT doc_id, toks,
       |    unnest(range(0, CAST(FLOOR((len(toks) + 63) / 64.0) AS BIGINT))) AS chunk_idx
       |  FROM t)
       |SELECT doc_id, chunk_idx,
       |  len(toks[(chunk_idx * 64 + 1):(chunk_idx * 64 + 64)]) AS n_tokens,
       |  array_to_string(toks[(chunk_idx * 64 + 1):(chunk_idx * 64 + 64)], ' ') AS chunk_text
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  // ===================================================================
  // Encoding quality: mojibake / control-char / replacement-char audit
  // ===================================================================

  /** Per-source encoding-health audit — the ftfy-shaped gate a crawl
    * pipeline runs before any text op: U+FFFD replacement characters
    * (a decoder already gave up), raw control characters outside
    * tab/newline/CR (binary junk or charset confusion), and the
    * classic UTF-8-read-as-Latin-1 mojibake markers ('\u00C3' from
    * mis-decoded 2-byte leads, '\u00E2\u20AC' from the E2-80-xx
    * punctuation family). All three are counted by exact character
    * arithmetic both engines share — occurrence count = (len −
    * len(replace(text, marker, ''))) div marker_len, control chars
    * via one regexp_replace character class (the p12 cross-engine
    * precedent; DuckDB needs the 'g' flag Spark implies) — then
    * aggregated per source with a quantized parts-per-million bad-
    * character rate, BIGINT div (no float in the rate). Map-side
    * gates + one source-cardinality aggregate: nothing corpus-sized
    * shuffles, the 100 TB shape of every other per-source audit. The
    * synthetic corpus is clean ASCII, so every source reads zero —
    * the honest answer — and the spec proves detection on crafted
    * mojibake/control/replacement fixtures.
    */
  def xEncodingQuality(spark: SparkSession, dir: String): DataFrame = {
    val t = col("text")
    // literal-substring counts via replace(), not regex: exact char
    // arithmetic with no cross-engine regex-dialect surface at all
    Tables.documents(spark, dir)
      .select(col("source"), length(t).cast(LongType).as("chars"),
        (length(t) - length(replace(t, lit("�"), lit(""))))
          .cast(LongType).as("repl"),
        (length(t) - length(regexp_replace(t, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")))
          .cast(LongType).as("ctrl"),
        ((length(t) - length(replace(t, lit("Ã"), lit("")))).cast(LongType) +
          expr("CAST((length(text) - length(replace(text, 'â€', ''))) AS BIGINT) div 2"))
          .as("moji"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("repl") + col("ctrl") + col("moji") > 0, 1L)
          .otherwise(0L)).as("n_flagged"),
        sum(col("repl")).as("repl_chars"),
        sum(col("ctrl")).as("ctrl_chars"),
        sum(col("moji")).as("moji_hits"),
        sum(col("chars")).as("n_chars_total"))
      .withColumn("bad_ppm",
        expr("((repl_chars + ctrl_chars + moji_hits) * 1000000) div n_chars_total"))
      .orderBy("source")
  }

  private[queries] val xEncodingQualitySql =
    s"""WITH s AS (SELECT source, CAST(length(text) AS BIGINT) AS chars,
       |    CAST(length(text) - length(replace(text, '�', '')) AS BIGINT) AS repl,
       |    CAST(length(text) - length(regexp_replace(text, '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', '', 'g')) AS BIGINT) AS ctrl,
       |    CAST(length(text) - length(replace(text, 'Ã', '')) AS BIGINT)
       |      + (CAST(length(text) - length(replace(text, 'â€', '')) AS BIGINT) // 2) AS moji
       |  FROM documents)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN repl + ctrl + moji > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       |  CAST(SUM(repl) AS BIGINT) AS repl_chars,
       |  CAST(SUM(ctrl) AS BIGINT) AS ctrl_chars,
       |  CAST(SUM(moji) AS BIGINT) AS moji_hits,
       |  CAST(SUM(chars) AS BIGINT) AS n_chars_total,
       |  ((CAST(SUM(repl) AS BIGINT) + CAST(SUM(ctrl) AS BIGINT) + CAST(SUM(moji) AS BIGINT)) * 1000000)
       |    // CAST(SUM(chars) AS BIGINT) AS bad_ppm
       |FROM s GROUP BY source ORDER BY source""".stripMargin

}
