package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

import graft.Tables
import graft.ext.{BpeTrainer, Dedup, Graph, IvfIndex, IvfStore, Multimodal, PqIndex, RelationStore, Similarity, TextOps, TopK, ZOrder}

/** Deduplication: exact/MinHash/LSH/Jaccard/edit/SimHash, components, canonical, incremental, PII, source caps, dup-source matrix
  * — split from the monolithic ExtQueries in r10; mixes into
  * [[ExtQueries]] (self-typed), which carries the oracle-strategy
  * contract and the `queries`/`oracleSql` registries.
  */
private[queries] trait DedupQueries { this: ExtQueries.type =>
  // ===================================================================
  // Deduplication
  // ===================================================================

  def xDedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDupRank(Tables.documents(spark, dir)).orderBy("doc_id")

  private[queries] val xDedupExactSql =
    """SELECT doc_id, md5(text) AS fp,
      |  COUNT(*) OVER (PARTITION BY md5(text)) AS group_size,
      |  ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS dup_rank,
      |  CASE WHEN ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1
      |    THEN 'Y' ELSE 'N' END AS is_dup
      |FROM documents ORDER BY doc_id""".stripMargin

  /** MinHash (k=8, 4 bands of 2) per-doc signature + max band-bucket
    * occupancy.
    */
  def xDedupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val banded = Dedup.minhashBands(parallelDocs(spark, dir), n = 3, k = 8, bands = 4)
    Dedup.explodedBands(banded) // materialized sketch rows (null keys kept — the oracle buckets them)
      .withColumn("bsize", count(lit(1)).over(Window.partitionBy("band", "key")))
      .groupBy("doc_id")
      .agg(max("sig_0").as("sig_0"), max("bsize").as("max_bucket"))
      .orderBy("doc_id")
  }

  /** CPU-heavy scoring inputs get fanned out to full parallelism
    * first: the testdata parquet is one row group → one scan task, so
    * a single-threaded map stage would serialize the (compute-bound)
    * signature pipeline. The shuffle moves only the raw text once —
    * negligible next to the per-shingle hashing — and on a well-split
    * production corpus (many files / row groups) it can be dropped.
    */
  private[queries] def parallelDocs(spark: SparkSession, dir: String) =
    Tables.documents(spark, dir).repartition(spark.sparkContext.defaultParallelism)

  /** LSH candidate pairs (docs sharing >= 1 of the 4 band buckets),
    * served from the shared stored candidate graph.
    */
  def xDedupMinhashPairs(spark: SparkSession, dir: String): DataFrame =
    candidatePairs(spark, dir).orderBy("doc_a", "doc_b")

  /** Shared CTE prefix computing the 8 minhash signatures + 4 band
    * keys per doc (mirrors Dedup.minhashBands with n=3, k=8, bands=4).
    */
  private[queries] val minhashBandsCte = {
    val sigs = (0 until 8).map(j => s"${minhashSql("hs", j)} AS sig_$j").mkString(",\n  ")
    val bandCase = (0 until 4).map { b =>
      s"WHEN $b THEN md5('$b:' || sig_${2 * b} || ',' || sig_${2 * b + 1})"
    }.mkString(" ")
    s"""t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |s AS (SELECT doc_id, list_transform(${shinglesSql("toks", 3)}, s -> ${shingleHashSql("s")}) AS hs FROM t),
       |sig AS (SELECT doc_id,
       |  $sigs
       |FROM s),
       |b AS (SELECT doc_id, sig_0, band, CASE band $bandCase END AS key
       |  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band))""".stripMargin
  }

  private[queries] val xDedupMinhashSql =
    s"""WITH $minhashBandsCte,
       |sized AS (SELECT doc_id, sig_0, COUNT(*) OVER (PARTITION BY band, key) AS bsize FROM b)
       |SELECT doc_id, MAX(sig_0) AS sig_0, MAX(bsize) AS max_bucket
       |FROM sized GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private[queries] val xDedupMinhashPairsSql =
    s"""WITH $minhashBandsCte
       |SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b, COUNT(*) AS shared_bands
       |FROM b a JOIN b b2 ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id
       |WHERE a.key IS NOT NULL
       |GROUP BY a.doc_id, b2.doc_id ORDER BY doc_a, doc_b""".stripMargin

  /** Exact 3-gram Jaccard verification over MinHash-band-blocked
    * candidate pairs (the skew-safe blocking: band keys are
    * md5-uniform, unlike a text-derived block column — see
    * `Dedup.ngramJaccardPairs`).
    */
  def xDedupNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardVerify(parallelDocs(spark, dir),
        candidatePairs(spark, dir).select("doc_a", "doc_b"), n = 3)
      .orderBy("doc_a", "doc_b")

  private[queries] val xDedupNgramJaccardSql =
    s"""WITH $minhashBandsCte,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM b a JOIN b b2 ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id
       |  WHERE a.key IS NOT NULL),
       |p AS (SELECT doc_id, list_distinct(${shinglesSql("toks", 3)}) AS shd FROM t),
       |pairs AS (
       |  SELECT c.doc_a, c.doc_b,
       |    len(list_filter(pa.shd, x -> list_contains(pb.shd, x))) AS n_inter,
       |    len(pa.shd) AS na, len(pb.shd) AS nb
       |  FROM cand c
       |  JOIN p pa ON c.doc_a = pa.doc_id
       |  JOIN p pb ON c.doc_b = pb.doc_id)
       |SELECT doc_a, doc_b, n_inter, na + nb - n_inter AS n_union,
       |  CAST(n_inter AS DOUBLE) / CAST(na + nb - n_inter AS DOUBLE) AS jaccard
       |FROM pairs ORDER BY doc_a, doc_b""".stripMargin

  /** Edit-distance verification over the same MinHash-band-blocked
    * candidate pairs ([[graft.ext.Dedup.editDistancePairs]]):
    * character-level Levenshtein on the 60-char prefix — the fuzzy
    * second-stage that catches typo-level rewrites shifting many
    * shingles at once. Levenshtein is a pure integer DP, identical in
    * Spark and DuckDB, so the oracle is exact including the derived
    * similarity ratio (one int/int IEEE division).
    */
  def xDedupEdit(spark: SparkSession, dir: String): DataFrame =
    Dedup.editDistanceVerify(parallelDocs(spark, dir),
        candidatePairs(spark, dir).select("doc_a", "doc_b"), prefixLen = 60)
      .orderBy("doc_a", "doc_b")

  private[queries] val xDedupEditSql =
    s"""WITH $minhashBandsCte,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM b a JOIN b b2 ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id
       |  WHERE a.key IS NOT NULL),
       |px AS (SELECT doc_id, left(text, 60) AS pfx FROM documents)
       |SELECT c.doc_a, c.doc_b,
       |  levenshtein(pa.pfx, pb.pfx) AS edit_dist,
       |  GREATEST(length(pa.pfx), length(pb.pfx)) AS max_len,
       |  1.0 - CAST(levenshtein(pa.pfx, pb.pfx) AS DOUBLE)
       |    / CAST(GREATEST(length(pa.pfx), length(pb.pfx)) AS DOUBLE) AS edit_sim
       |FROM cand c
       |JOIN px pa ON c.doc_a = pa.doc_id
       |JOIN px pb ON c.doc_b = pb.doc_id
       |ORDER BY doc_a, doc_b""".stripMargin

  /** MEASURED LSH dedup quality — precision AND recall of the MinHash
    * band-blocking candidate generator against EXACT 3-gram-Jaccard
    * ground truth at τ = 0.8 (the near-dup threshold of the
    * dedup literature), the honesty contract (`x_ann_recall`,
    * `x_semdedup_coverage`) applied to the TEXT dedup pipeline: every
    * kept near-dup pair the bands missed is a duplicate that ships in
    * the training set, and until this number exists that leakage is
    * an assumption. Measured on the doc_id % 3 sample.
    *
    * The ground-truth leg needs NO blocking assumption yet is never
    * |S|²: a pair with jaccard > 0 must share a shingle, so exact
    * per-pair intersection counts arrive from a shingle-postings
    * self-join (explode distinct shingles, equi-join on the shingle,
    * count per pair — work Σ df² over shingle doc-frequencies, the
    * inverted-index route to exact pair truth), then the τ filter
    * uses the set sizes. Candidates are the STORED band graph
    * restricted to the sample. r8 measurement (precision/recall at
    * τ=0.8): 1.00/1.00 at sf0.001, 0.375/1.00 at sf0.01, 0.44/1.00
    * at sf0.1 — the bands catch EVERY true near-dup pair (recall 1.0
    * at all three SFs: with 4 bands of 2, a j=0.8 pair fires a band
    * with prob 1−(1−0.8²)⁴ ≈ 0.98, and the corpus's true pairs are
    * mostly far above τ) while precision falls with corpus size as
    * 2-hash band collisions admit sub-threshold pairs — exactly why
    * the pipeline VERIFIES candidates with exact Jaccard before
    * dropping anything (`x_dedup_ngram_jaccard` is that stage).
    */
  def xDedupLshQuality(spark: SparkSession, dir: String): DataFrame = {
    val docs = parallelDocs(spark, dir).filter(col("doc_id") % 3 === 0)
    val prepared = docs.select(col("doc_id"),
      array_distinct(TextOps.shingles(TextOps.tokens(col("text")), 3)).as("sh"))
    val sizes = prepared.select(col("doc_id"), size(col("sh")).cast(LongType).as("n_sh"))
    val posts = prepared.select(col("doc_id"), explode(col("sh")).as("shingle"))
    val inter = posts.as("a").join(posts.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    val truth = inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .filter(col("n_inter").cast(DoubleType) /
        (col("na") + col("nb") - col("n_inter")).cast(DoubleType) >= lit(0.8))
      .select(col("doc_a"), col("doc_b"))
    val cand = candidatePairs(spark, dir)
      .filter(col("doc_a") % 3 === 0 && col("doc_b") % 3 === 0)
      .select(col("doc_a"), col("doc_b"))
    cand.withColumn("is_cand", lit(1L))
      .join(truth.withColumn("is_true", lit(1L)), Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(coalesce(col("is_true"), lit(0L))).as("n_true"),
        sum(coalesce(col("is_cand"), lit(0L))).as("n_cand"),
        sum(when(col("is_true").isNotNull && col("is_cand").isNotNull, 1L)
          .otherwise(0L)).as("n_hit"))
      .select(col("n_true"), col("n_cand"), col("n_hit"),
        (col("n_hit").cast(DoubleType) / col("n_cand").cast(DoubleType)).as("precision"),
        (col("n_hit").cast(DoubleType) / col("n_true").cast(DoubleType)).as("recall"))
  }

  private[queries] val xDedupLshQualitySql =
    s"""WITH $minhashBandsCte,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM b a JOIN b b2 ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id
       |  WHERE a.key IS NOT NULL AND a.doc_id % 3 = 0 AND b2.doc_id % 3 = 0),
       |sp AS (SELECT doc_id, list_distinct(${shinglesSql("toks", 3)}) AS sh
       |  FROM t WHERE doc_id % 3 = 0),
       |sz AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_sh FROM sp),
       |posts AS (SELECT doc_id, unnest(sh) AS shingle FROM sp),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b, COUNT(*) AS n_inter
       |  FROM posts a JOIN posts b2 ON a.shingle = b2.shingle AND a.doc_id < b2.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT i.doc_a, i.doc_b FROM inter i
       |  JOIN sz sa ON sa.doc_id = i.doc_a JOIN sz sb ON sb.doc_id = i.doc_b
       |  WHERE CAST(i.n_inter AS DOUBLE)
       |    / CAST(sa.n_sh + sb.n_sh - i.n_inter AS DOUBLE) >= 0.8),
       |j AS (
       |  SELECT COALESCE(c.doc_a, t2.doc_a) AS doc_a,
       |    CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_cand,
       |    CASE WHEN t2.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_true
       |  FROM cand c FULL OUTER JOIN truth t2
       |    ON c.doc_a = t2.doc_a AND c.doc_b = t2.doc_b)
       |SELECT CAST(SUM(is_true) AS BIGINT) AS n_true,
       |  CAST(SUM(is_cand) AS BIGINT) AS n_cand,
       |  CAST(SUM(is_cand * is_true) AS BIGINT) AS n_hit,
       |  CAST(SUM(is_cand * is_true) AS DOUBLE) / CAST(SUM(is_cand) AS DOUBLE) AS precision,
       |  CAST(SUM(is_cand * is_true) AS DOUBLE) / CAST(SUM(is_true) AS DOUBLE) AS recall
       |FROM j""".stripMargin

  /** PII redaction — the compliance pass every training-data pipeline
    * runs before a corpus ships: mask email addresses and phone-shaped
    * tokens, count what was masked. The corpus is synthetic word soup,
    * so deterministic PII is INJECTED first (doc_id-derived emails +
    * phone), then redacted — the query proves the full
    * detect-count-mask machinery against an oracle md5 of the redacted
    * text. Regexes stay on the syntax subset (explicit classes,
    * bounded quantifiers, no backrefs) where Java regex and DuckDB's
    * RE2 agree. Map-side, zero shuffle; at 100 TB this is a pure scan
    * the same way the quality gate is.
    */
  def xPiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val dirty = concat(
      col("text"), lit(" contact user"), col("doc_id").cast("string"),
      lit("@example.com or x.y+z"), col("doc_id").cast("string"),
      lit("@mail.org tel 555-"), col("doc_id").cast("string"), lit("."))
    val clean = regexp_replace(
      regexp_replace(dirty, EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(dirty, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
        size(regexp_extract_all(dirty, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
        md5(clean).as("clean_md5"))
      .orderBy("doc_id")
  }

  private[queries] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[queries] val PhoneRe = "555-[0-9]+"

  private[queries] val xPiiRedactSql = {
    val dirty = "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or x.y+z' " +
      "|| CAST(doc_id AS VARCHAR) || '@mail.org tel 555-' || CAST(doc_id AS VARCHAR) || '.'"
    // NOTE single-quoted SQL strings do not process backslashes, so the
    // Scala-escaped \\. arrives as the same \. Java saw
    val email = "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'"
    val phone = "'555-[0-9]+'"
    s"""SELECT doc_id,
       |  len(regexp_extract_all($dirty, $email)) AS n_emails,
       |  len(regexp_extract_all($dirty, $phone)) AS n_phones,
       |  md5(regexp_replace(regexp_replace($dirty, $email, '<EMAIL>', 'g'), $phone, '<PHONE>', 'g')) AS clean_md5
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Per-source document cap — dataset curation's domain-balancing
    * step (cap any one domain/source at N docs so a crawl-heavy source
    * cannot dominate the mixture): keep the first `cap` docs per
    * source in deterministic md5-hash order — an unbiased, seedless,
    * engine-reproducible sample (no `rand()`, same rows on any
    * cluster size — the same contract as `x_split_sample`). One
    * shuffle on source; output bounded at cap×|sources|. At 100 TB
    * the window sort is per-source and spill-safe; a bounded top-k
    * Aggregator (`ext.TopK`'s pattern) is the O(cap)-state variant if
    * source cardinality is tiny and rows per source are extreme.
    */
  def xSourceCap(spark: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("text"), col("doc_id").cast("string")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), h.as("h"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("h"), col("doc_id"))).cast("long"))
      .filter(col("rn") <= 20)
      .select(col("source"), col("rn"), col("doc_id"))
      .orderBy("source", "rn")
  }

  private[queries] val xSourceCapSql =
    """SELECT source, rn, doc_id FROM (
      |  SELECT doc_id, source,
      |    ROW_NUMBER() OVER (PARTITION BY source
      |      ORDER BY md5(text || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 20 ORDER BY source, rn""".stripMargin

  /** Component labels (node → component representative) as
    * MATERIALIZED STATE, built at most once per (JVM, corpus): the
    * LSH band → candidate pairs → iterative label-propagation chain
    * is the most expensive stage of the dedup surface, and BOTH
    * [[xDedupComponents]] (the keep/drop view) and [[xDedupCanonical]]
    * (the per-cluster selection) need exactly the same labels —
    * recomputing the fixpoint per consumer doubles the cost for no
    * new information. Stored via [[graft.ext.RelationStore]], so every
    * consumer reads the labels as a parquet scan — the label relation
    * is pair-graph-sized (docs in no pair never enter it), far below
    * corpus-sized.
    */
  /** The LSH candidate-pair list as stored state — the near-dup graph
    * EVERY pair-graph consumer shares (component labels, PageRank,
    * triangle census): band → bucket-join candidate generation is one
    * corpus-scale pass, and each consumer re-running it would triple
    * the cost for the same edges.
    */
  private[queries] def candidatePairs(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(RelationStore.ensure(s"dedup-cand-pairs:$dir") {
      Dedup.minhashCandidates(
        Dedup.minhashBands(parallelDocs(spark, dir), n = 3, k = 8, bands = 4))
    }) // (doc_a, doc_b, shared_bands) — consumers project what they need

  private[queries] def componentLabels(spark: SparkSession, dir: String): DataFrame = {
    val path = RelationStore.ensure(s"dedup-components:$dir") {
      Dedup.connectedComponents(candidatePairs(spark, dir))
    }
    spark.read.parquet(path)
  }

  /** Dedup GROUPS: LSH candidate pairs promoted to transitive
    * components (`Dedup.connectedComponents`) — every document labeled
    * with its group representative (component min doc_id) and group
    * size; docs in no pair are their own singleton group. This is the
    * keep/drop decision surface of a production dedup: keep
    * `doc_id == component`, drop the rest. Labels come from the
    * shared [[componentLabels]] materialized state.
    */
  def xDedupComponents(spark: SparkSession, dir: String): DataFrame = {
    val docs = parallelDocs(spark, dir)
    val comp = componentLabels(spark, dir)
    docs.select("doc_id")
      .join(comp, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("component"))
      .withColumn("group_size", count(lit(1)).over(Window.partitionBy("component")))
      .orderBy("doc_id")
  }

  /** Shared CTE chain: LSH candidates → undirected edges → recursive
    * transitive closure (set-semantics UNION terminates it) →
    * min-reachable label per node — exact parity with label
    * propagation's fixpoint. Consumed by both the components oracle
    * and the canonical-selection oracle built on top of it.
    */
  private[queries] val componentsCtes =
    s"""$minhashBandsCte,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM b a JOIN b b2 ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id
       |  WHERE a.key IS NOT NULL),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM cand
       |  UNION SELECT doc_b, doc_a FROM cand),
       |reach AS (
       |  SELECT * FROM (SELECT src, src AS dst FROM edges
       |                 UNION SELECT src, dst FROM edges)
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |comp AS (SELECT src AS node, MIN(dst) AS component FROM reach GROUP BY src)""".stripMargin

  private[queries] val xDedupComponentsSql =
    s"""WITH RECURSIVE $componentsCtes
       |SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component,
       |  COUNT(*) OVER (PARTITION BY COALESCE(c.component, d.doc_id)) AS group_size
       |FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
       |ORDER BY d.doc_id""".stripMargin

  /** Cross-source duplication attribution: every stored LSH near-dup
    * candidate pair labeled with its endpoints' (source, source) —
    * normalized so source_a <= source_b — and aggregated into the
    * source-pair matrix with per-pair counts and a quantized pair
    * RATE: pairs per 10⁹ POSSIBLE pairs, where the possible-pair
    * universe is n_a·n_b for cross-source rows and the n(n−1)/2
    * unordered pairs for diagonal (within-source) rows, so the two
    * row classes are directly comparable. This is the
    * provenance question a real crawl curation asks before dedup
    * policy: which sources duplicate each other (mirror sites, feed
    * syndication, CC-vs-curated overlap), and is the duplication
    * within-source (rotations, boilerplate) or cross-source
    * (syndication) — the matrix decides which source loses its copy.
    *
    * Scale shape: the pair graph is STORED state (the shared
    * `dedup-cand-pairs` relation — built once, pair-sized ≪ corpus by
    * LSH design); the corpus contributes ONE pruned (doc_id, source)
    * scan, reduced to pair-endpoint rows by a BROADCAST semi-join on
    * the distinct endpoint set (the `x_dedup_substring` dup-set-
    * broadcast precedent) — so the corpus is never shuffled; both
    * endpoint-labeling joins and the matrix aggregate are pair-sized.
    * Source counts are a map-side-combined source-cardinality
    * aggregate, broadcast back onto the matrix.
    */
  def xDupSourceMatrix(spark: SparkSession, dir: String): DataFrame = {
    val pairs = candidatePairs(spark, dir).select("doc_a", "doc_b")
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
    val cnt = src.groupBy("source").agg(count(lit(1)).as("n"))
    val ends = pairs.select(col("doc_a").as("doc_id"))
      .union(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val psrc = src.join(broadcast(ends), "doc_id")
    val labeled = pairs
      .join(psrc.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(psrc.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
    labeled.groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
      .join(broadcast(cnt.select(col("source").as("source_a"), col("n").as("n_docs_a"))), "source_a")
      .join(broadcast(cnt.select(col("source").as("source_b"), col("n").as("n_docs_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        col("n_docs_a"), col("n_docs_b"),
        // diagonal rows: the pair universe is the n(n-1)/2 UNORDERED
        // within-source pairs, not n² — without this the within- vs
        // cross-source comparison the matrix exists for reads ~2× low
        floor(col("n_pairs").cast(DoubleType) * lit(1e9)
          / when(col("source_a") === col("source_b"),
              col("n_docs_a").cast(DoubleType)
                * (col("n_docs_a").cast(DoubleType) - lit(1.0)) / lit(2.0))
            .otherwise(col("n_docs_a").cast(DoubleType) * col("n_docs_b").cast(DoubleType))
          + lit(0.5)).cast(LongType).as("rate_ppb"))
      .orderBy(col("n_pairs").desc, col("source_a"), col("source_b"))
  }

  private[queries] lazy val xDupSourceMatrixSql =
    s"""WITH $minhashBandsCte,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
       |  FROM b a JOIN b b2 ON a.band = b2.band AND a.key = b2.key AND a.doc_id < b2.doc_id
       |  WHERE a.key IS NOT NULL),
       |src AS (SELECT doc_id, source FROM documents),
       |cnt AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
       |p AS (
       |  SELECT LEAST(sa.source, sb.source) AS source_a,
       |    GREATEST(sa.source, sb.source) AS source_b, COUNT(*) AS n_pairs
       |  FROM cand c JOIN src sa ON c.doc_a = sa.doc_id
       |    JOIN src sb ON c.doc_b = sb.doc_id
       |  GROUP BY 1, 2)
       |SELECT p.source_a, p.source_b, p.n_pairs, ca.n AS n_docs_a, cb.n AS n_docs_b,
       |  CAST(FLOOR(CAST(p.n_pairs AS DOUBLE) * 1000000000.0
       |    / (CASE WHEN p.source_a = p.source_b
       |        THEN CAST(ca.n AS DOUBLE) * (CAST(ca.n AS DOUBLE) - 1) / 2.0
       |        ELSE CAST(ca.n AS DOUBLE) * CAST(cb.n AS DOUBLE) END) + 0.5) AS BIGINT) AS rate_ppb
       |FROM p JOIN cnt ca ON p.source_a = ca.source JOIN cnt cb ON p.source_b = cb.source
       |ORDER BY p.n_pairs DESC, p.source_a, p.source_b""".stripMargin

  /** Incremental dedup — today's batch against the STORED corpus
    * sketch index, the shape a production dedup actually runs daily:
    * the existing corpus is never re-sketched (its (band, key) sketch
    * relation is materialized state — `Dedup.explodedBands`' stored-
    * table contract); only the delta is sketched, map-side, and
    * joined against the index on the 8-byte band keys. Cost per day =
    * O(delta) sketching + one index join, independent of corpus
    * size — the dedup twin of `a10_incremental`'s no-rescan rule.
    * Every new doc is reported (left joins end-to-end): candidate
    * count, first matching existing doc, and the keep/drop flag.
    */
  def xDedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val docs = parallelDocs(spark, dir)
    val isNew = col("doc_id") % 10 === 0
    // stored index: (band, key) -> existing doc — REAL materialized
    // state since r5 (RelationStore parquet, built once per corpus),
    // so the existing corpus is never re-sketched even across query
    // invocations; only the delta is sketched below
    val index = spark.read.parquet(RelationStore.ensure(s"dedup-sketch-index:$dir") {
      Dedup.explodedBands(Dedup.minhashBands(docs.filter(!isNew), n = 3, k = 8, bands = 4))
        .filter(col("key").isNotNull)
        .select(col("doc_id").as("ex_id"), col("band"), col("key"))
    })
    val newBands = Dedup.minhashBands(docs.filter(isNew), n = 3, k = 8, bands = 4)
      .select(col("doc_id"), posexplode(col("band_keys")).as(Seq("band", "key")))
      .filter(col("key").isNotNull)
    val matched = newBands.join(index, Seq("band", "key"), "left")
      .groupBy("doc_id")
      .agg(countDistinct(col("ex_id")).as("n_candidates"), min(col("ex_id")).as("first_match"))
    docs.filter(isNew).select("doc_id")
      .join(matched, Seq("doc_id"), "left") // shingle-less new docs still report
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("first_match"),
        when(coalesce(col("n_candidates"), lit(0L)) > 0, "Y").otherwise("N").as("is_dup"))
      .orderBy("doc_id")
  }

  private[queries] val xDedupIncrementalSql =
    s"""WITH $minhashBandsCte,
       |ex AS (SELECT doc_id AS ex_id, band, key FROM b
       |  WHERE doc_id % 10 <> 0 AND key IS NOT NULL),
       |nw AS (SELECT doc_id, band, key FROM b
       |  WHERE doc_id % 10 = 0 AND key IS NOT NULL),
       |m AS (SELECT n.doc_id, COUNT(DISTINCT e.ex_id) AS n_candidates,
       |    MIN(e.ex_id) AS first_match
       |  FROM nw n LEFT JOIN ex e ON n.band = e.band AND n.key = e.key
       |  GROUP BY n.doc_id)
       |SELECT d.doc_id,
       |  CAST(COALESCE(m.n_candidates, 0) AS BIGINT) AS n_candidates,
       |  m.first_match,
       |  CASE WHEN COALESCE(m.n_candidates, 0) > 0 THEN 'Y' ELSE 'N' END AS is_dup
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
       |LEFT JOIN m USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** Canonical-document selection — the step that turns dedup GROUPS
    * into a curated corpus: within every duplicate cluster keep exactly
    * ONE representative (the longest document, ties to the lowest
    * doc_id — a deterministic quality proxy; swap in any scoring
    * column) and mark the rest dropped. This is the decision surface a
    * production pipeline materializes: `is_kept` filters the corpus,
    * `component` traces provenance. Scale shape: the cluster labels
    * come from [[xDedupComponents]]'s machinery (bucketed candidates,
    * O(log d) label propagation over the pair graph only); selection
    * itself is one window over `component` — a key-partitioned sort of
    * group-sized runs, never a global sort. The 500-doc corpus yields
    * 469 clusters / 31 dropped docs at sf0.01.
    */
  def xDedupCanonical(spark: SparkSession, dir: String): DataFrame = {
    val comp = componentLabels(spark, dir)
    val byComp = Window.partitionBy("component")
    Tables.documents(spark, dir).select("doc_id", "n_chars")
      .join(comp, col("doc_id") === col("node"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("component"),
        col("n_chars"))
      .withColumn("group_size", count(lit(1)).over(byComp))
      .withColumn("rnk", row_number().over(byComp.orderBy(col("n_chars").desc, col("doc_id"))))
      .select(col("doc_id"), col("component"), col("group_size"),
        (col("rnk") === 1).as("is_kept"))
      .orderBy("doc_id")
  }

  private[queries] val xDedupCanonicalSql =
    s"""WITH RECURSIVE $componentsCtes,
       |labeled AS (
       |  SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS component, d.n_chars
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
       |ranked AS (
       |  SELECT doc_id, component, n_chars,
       |    COUNT(*) OVER (PARTITION BY component) AS group_size,
       |    ROW_NUMBER() OVER (PARTITION BY component ORDER BY n_chars DESC, doc_id) AS rnk
       |  FROM labeled)
       |SELECT doc_id, component, group_size, (rnk = 1) AS is_kept
       |FROM ranked ORDER BY doc_id""".stripMargin

  /** 16-bit SimHash sketch + bucket occupancy per document. */
  def xDedupSimhash(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhashBuckets(Tables.documents(spark, dir)).orderBy("doc_id")

  private[queries] val xDedupSimhashSql =
    s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |s AS (SELECT doc_id, ${simhashSql("toks")} AS simhash FROM t)
       |SELECT doc_id, simhash,
       |  COUNT(*) OVER (PARTITION BY simhash) AS bucket_size,
       |  CASE WHEN COUNT(*) OVER (PARTITION BY simhash) > 1 THEN 'Y' ELSE 'N' END AS is_candidate
       |FROM s ORDER BY doc_id""".stripMargin

}
