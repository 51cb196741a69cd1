package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

import graft.Tables
import graft.ext.{BpeTrainer, Dedup, Graph, IvfIndex, IvfStore, Multimodal, PqIndex, RelationStore, Similarity, TextOps, TopK, ZOrder}

/** Shuffle-sharding, rendezvous resharding, BPE tokenizer lifecycle
  * — split from the monolithic ExtQueries in r10; mixes into
  * [[ExtQueries]] (self-typed), which carries the oracle-strategy
  * contract and the `queries`/`oracleSql` registries.
  */
private[queries] trait ShardBpeQueries { this: ExtQueries.type =>
  def xShuffleShard(spark: SparkSession, dir: String): DataFrame = {
    val key = TextOps.shingleHash(
      concat(lit("shuffle:"), col("doc_id").cast(StringType)))
    Tables.documents(spark, dir)
      .select(col("doc_id"), key.as("shuffle_key"))
      .withColumn("shard", (col("shuffle_key") % ShuffleShards).cast(IntegerType))
      .withColumn("position",
        row_number().over(Window.partitionBy("shard")
          .orderBy(col("shuffle_key"), col("doc_id"))).cast(LongType))
      .orderBy("shard", "position")
  }

  private[queries] val ShuffleShards = 8

  /** Rendezvous (highest-random-weight) re-sharding: assign every doc
    * to argmax over shards of `md5(doc_id:shard)` — the consistent-
    * placement rule whose defining property is that growing N → N+1
    * shards moves ONLY the docs the new shard now wins, an expected
    * 1/(N+1) of the corpus. The mod-N rule (`x_shuffle_shard`'s
    * in-place shuffle, where movement is free) would relocate
    * ~N/(N+1) of a MATERIALIZED sharded export on resize; for a
    * 100 TB corpus laid out as shard files, that difference is
    * rewriting ~11% vs ~89% of the store. The query emits both the
    * 8-shard and 9-shard assignment and the movement flag; `moved`
    * sums to the expected fraction (spec-asserted), and the whole
    * computation is map-side — zero shuffles before the output sort.
    * Ties (never observed on md5, but contractual): lowest shard id,
    * identical in both engines via the greatest + first-match CASE
    * chain mirrored as ROW_NUMBER in the oracle.
    */
  def xReshardRendezvous(spark: SparkSession, dir: String): DataFrame = {
    def w(s: Int) = TextOps.shingleHash(
      concat(col("doc_id").cast(StringType), lit("s:" + s)))
    def argmax(n: Int): Column = {
      val ws = (0 until n).map(w)
      val best = greatest(ws: _*)
      coalesce(ws.zipWithIndex.map { case (c, i) =>
        when(c === best, lit(i.toLong)) }: _*)
    }
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        argmax(ReshardFrom).as("shard_before"),
        argmax(ReshardFrom + 1).as("shard_after"))
      .withColumn("moved", col("shard_before") =!= col("shard_after"))
      .orderBy("doc_id")
  }

  private[queries] val ReshardFrom = 8

  private[queries] val xReshardRendezvousSql = {
    val n = ReshardFrom
    val ws = (0 to n).map(i =>
      s"${shingleHashSql(s"CAST(doc_id AS VARCHAR) || 's:$i'")} AS w$i").mkString(",\n  ")
    def pick(count: Int, g: String) =
      "CASE " + (0 until count).map(i => s"WHEN w$i = $g THEN CAST($i AS BIGINT)")
        .mkString(" ") + " END"
    s"""WITH h AS (SELECT doc_id,
       |  $ws
       |FROM documents),
       |g AS (SELECT *,
       |  GREATEST(${(0 until n).map("w" + _).mkString(", ")}) AS g_before,
       |  GREATEST(${(0 to n).map("w" + _).mkString(", ")}) AS g_after
       |FROM h)
       |SELECT doc_id,
       |  ${pick(n, "g_before")} AS shard_before,
       |  ${pick(n + 1, "g_after")} AS shard_after,
       |  ${pick(n, "g_before")} <> ${pick(n + 1, "g_after")} AS moved
       |FROM g ORDER BY doc_id""".stripMargin
  }

  /** BPE merge TRAINING — the tokenizer-construction step of a
    * training-data pipeline: learn the first `BpeSteps` byte-pair
    * merges from the corpus, greedy-by-frequency with a lexicographic
    * tie-break so the merge table is deterministic and
    * engine-identical.
    *
    * The classic algorithm, relationally: BPE trains on the WORD
    * FREQUENCY TABLE, not the corpus — so after one corpus-scale
    * token shuffle builds (word, freq), every iteration runs on a
    * vocabulary-sized relation (language-bounded, ~10^6 rows for web
    * text — tiny next to the corpus). Each step is: adjacent-symbol
    * pair extraction (map-side explode), one pair-cardinality
    * partial-agg shuffle, the argmax via TakeOrderedAndProject (1
    * row, broadcast back), and a map-side merge application — the
    * same fixed-iteration relational-loop shape as
    * `Dedup.connectedComponents` and `IvfIndex.train`.
    *
    * Determinism contract: symbol sequences live as space-delimited
    * strings with sentinel spaces (" j o i n "), merges apply via
    * literal `replace(' a b ' → ' ab ')` — leftmost non-overlapping
    * in BOTH engines (verified: Java String.replace and DuckDB
    * replace agree on the self-adjacent " a b a b " case), counts are
    * exact BIGINTs, and ties break on the pair's binary string order.
    * The oracle unrolls the identical five iterations as CTEs.
    *
    * Since r7 the trained merge table is STORED state (the tokenizer
    * lifecycle: train once per corpus snapshot, every consumer reads
    * the table) — this query audits the stored table;
    * [[xBpeEncode]] is the apply step.
    */
  def xBpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMergeStore(spark, dir).orderBy("step")

  /** The trained BPE merge table (step, pair, merged, cnt) as stored
    * state — the offline training job (see [[xBpeMerges]]'s scaladoc
    * for the algorithm + determinism contract), run once per corpus
    * snapshot and persisted via [[RelationStore]].
    */
  private[queries] def bpeMergeStore(spark: SparkSession, dir: String): DataFrame =
    bpeMergeStoreOn(spark, dir, s"bpe-merges:$dir", lit(true))

  /** The same stored training, parameterized by a document predicate —
    * the SNAPSHOT-trained tokenizer (`x_bpe_drift` trains on the
    * non-delta corpus so the delta is genuinely out-of-sample) shares
    * every mechanism with the corpus-trained one.
    */
  private[queries] def bpeMergeStoreOn(spark: SparkSession, dir: String,
      storeKey: String, docFilter: Column): DataFrame =
    spark.read.parquet(RelationStore.ensure(storeKey) {
      val words = Tables.documents(spark, dir).filter(docFilter)
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("freq"))
        // materialized: the ONE corpus-scale pass. Without the barrier
        // each merge step's argmax leg re-plans the corpus token
        // shuffle through its lazy lineage — 5 corpus scans for a
        // 1-scan algorithm. At 100 TB the corpus pass is the cost
        // that matters — the barrier is what makes it single (and the
        // whole training now runs at most once per JVM+corpus, inside
        // this store build).
        .localCheckpoint()
      var vocab = words.select(
        col("word"), col("freq"),
        concat(lit(" "),
          concat_ws(" ", filter(split(col("word"), ""), c => c =!= "")),
          lit(" ")).as("syms"))
      val steps = (1 to BpeSteps).map { s =>
        val arr = split(trim(col("syms")), " ")
        val pairs = vocab.select(col("freq"),
          explode(when(size(arr) >= 2,
              transform(sequence(lit(1), size(arr) - 1),
                i => concat(element_at(arr, i), lit(" "), element_at(arr, i + 1))))
            .otherwise(array().cast("array<string>"))).as("pair"))
        val top = pairs.groupBy("pair").agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("pair")).limit(1)
        vocab = vocab.crossJoin(broadcast(top))
          .withColumn("syms", call_function("replace", col("syms"),
            concat(lit(" "), col("pair"), lit(" ")),
            concat(lit(" "), call_function("replace", col("pair"), lit(" "), lit("")), lit(" "))))
          .drop("pair", "cnt")
        top.select(lit(s.toLong).as("step"), col("pair"),
          call_function("replace", col("pair"), lit(" "), lit("")).as("merged"),
          col("cnt"))
      }
      steps.reduce(_ unionByName _)
    })

  /** The SAME merge table via the VOCAB-LOCAL trainer
    * ([[graft.ext.BpeTrainer]]) — the production training path: the
    * stored corpus vocabulary coalesces into ONE task that runs the
    * classic in-memory merge loop, so the job count is O(1) instead
    * of O(merges) (the relational loop's scheduler-bound shape; see
    * BpeTrainer's cost model). Hash-verified against the SAME oracle
    * as `x_bpe_merges`, and `BpeTrainerSpec` pins the two paths equal
    * merge-for-merge — the audit-twin contract.
    */
  def xBpeMergesLocal(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // hoist the step count into a local: a lambda that read the trait
    // member directly would capture `this` (the non-serializable
    // ExtQueries singleton) into the task closure
    val steps = BpeSteps
    corpusVocab(spark, dir).filter(col("token") =!= "")
      .select(col("token"), col("cnt")).as[(String, Long)]
      .coalesce(1)
      .mapPartitions(it => BpeTrainer.train(it, steps).iterator)
      .toDF()
      .orderBy("step")
  }

  /** BPE ENCODE — the tokenizer APPLY step: segment every vocabulary
    * word into its trained subword pieces by applying the stored
    * merge table's merges in training order (the standard BPE apply
    * rule: merge priority = learn order), emitting the piece sequence
    * and piece count per word. Output ≡ the training chain's final
    * vocabulary state, so the oracle simply reads `v5` of the same
    * CTE chain — every replace agrees bit-for-bit (the [[xBpeMerges]]
    * determinism contract).
    *
    * Scale shape — ZERO corpus passes: the word table is the STORED
    * corpus vocabulary (`corpusVocab` — language-bounded), the merge
    * table is stored 5-row state pivoted onto one broadcast row, and
    * the merge application is map-side string work over the
    * vocab-sized relation. Encoding the CORPUS is then a broadcast
    * join of this word→pieces map against the token stream — the
    * standard vocabulary-memoized tokenizer deployment; the map is
    * what this query materializes.
    */
  def xBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val words = corpusVocab(spark, dir).filter(col("token") =!= "")
      .select(col("token").as("word"), col("cnt").as("freq"))
    bpeEncodeWith(bpeMergeStore(spark, dir), words).orderBy("word")
  }

  /** The tokenizer APPLY kernel over an arbitrary (word, freq)
    * relation with an arbitrary stored merge table — shared by the
    * corpus encode above and the snapshot-trained drift monitor.
    */
  private[queries] def bpeEncodeWith(merges: DataFrame, words: DataFrame): DataFrame = {
    val firsts = (1 to BpeSteps).flatMap(s => Seq(
      first(when(col("step") === s, col("pair")), ignoreNulls = true).as(s"p$s"),
      first(when(col("step") === s, col("merged")), ignoreNulls = true).as(s"m$s")))
    val mergeRow = merges.groupBy().agg(firsts.head, firsts.tail: _*)
    val base = words.crossJoin(broadcast(mergeRow))
      .withColumn("syms", concat(lit(" "),
        concat_ws(" ", filter(split(col("word"), ""), c => c =!= "")), lit(" ")))
    val encoded = (1 to BpeSteps).foldLeft(base) { (d, s) =>
      d.withColumn("syms", call_function("replace", col("syms"),
        concat(lit(" "), col(s"p$s"), lit(" ")),
        concat(lit(" "), col(s"m$s"), lit(" "))))
    }
    encoded.select(
      col("word"), col("freq"),
      trim(col("syms")).as("pieces"),
      size(split(trim(col("syms")), " ")).cast(LongType).as("n_pieces"))
  }

  private[queries] val BpeSteps = 5

  /** The BPE training chain as shared CTEs: words → v0 → (p_k, t_k,
    * v_k) per step. `t$k` is step k's merge row; `v$BpeSteps` is the
    * fully-encoded vocabulary — both oracle consumers read from the
    * same chain.
    */
  private[queries] def bpeTrainCtes: String = bpeTrainCtesWhere("")

  /** The same chain over a filtered document set (`where` is a full
    * `WHERE …` clause) — the snapshot-trained tokenizer's oracle twin.
    */
  private[queries] def bpeTrainCtesWhere(where: String): String = {
    def iter(k: Int): String = {
      val prev = if (k == 1) "v0" else s"v${k - 1}"
      s"""p$k AS (
         |  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
         |    SELECT freq, unnest(CASE WHEN len(l) >= 2
         |        THEN list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])
         |        ELSE [] END) AS pair
         |    FROM (SELECT freq, string_split(trim(syms), ' ') AS l FROM $prev))
         |  GROUP BY pair),
         |t$k AS (SELECT pair, cnt FROM p$k ORDER BY cnt DESC, pair LIMIT 1),
         |v$k AS (
         |  SELECT word, freq,
         |    replace(syms, ' ' || t.pair || ' ', ' ' || replace(t.pair, ' ', '') || ' ') AS syms
         |  FROM $prev CROSS JOIN t$k t)""".stripMargin
    }
    s"""words AS (
       |  SELECT t AS word, COUNT(*) AS freq FROM (
       |    SELECT unnest(string_split(trim(text), ' ')) AS t FROM documents $where)
       |  WHERE t <> '' GROUP BY t),
       |v0 AS (SELECT word, freq,
       |  ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS syms FROM words),
       |${(1 to BpeSteps).map(iter).mkString(",\n")}""".stripMargin
  }

  private[queries] val xBpeMergesSql = {
    val legs = (1 to BpeSteps).map(k =>
      s"SELECT CAST($k AS BIGINT) AS step, pair, replace(pair, ' ', '') AS merged, cnt FROM t$k")
    s"""WITH $bpeTrainCtes
       |${legs.mkString(" UNION ALL ")}
       |ORDER BY step""".stripMargin
  }

  private[queries] val xBpeEncodeSql =
    s"""WITH $bpeTrainCtes
       |SELECT word, freq, trim(syms) AS pieces,
       |  CAST(len(string_split(trim(syms), ' ')) AS BIGINT) AS n_pieces
       |FROM v$BpeSteps ORDER BY word""".stripMargin

  /** CORPUS tokenization through the trained BPE — the deployment
    * path [[xBpeEncode]]'s scaladoc promises, as a verified query:
    * one corpus token pass hash-joins each token against the
    * BROADCAST word→pieces map (vocabulary-bounded, not
    * corpus-bounded — the standard memoized-tokenizer serving shape),
    * aggregating per document into word count, subword piece count,
    * and the expansion ratio (one IEEE division of exact BIGINTs).
    * This is the number a training pipeline actually budgets with:
    * sequence lengths after tokenization, not whitespace words.
    */
  def xBpeCorpusTokens(spark: SparkSession, dir: String): DataFrame = {
    val pieceMap = xBpeEncode(spark, dir).select(col("word"), col("n_pieces"))
    val perDoc = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(pieceMap), Seq("word"))
      .groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"))
    // a document whose text tokenizes to nothing still reports (0, 0)
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"))
      .withColumn("expansion",
        when(col("n_words") === 0L, lit(0.0))
          .otherwise(col("n_pieces").cast(DoubleType) / col("n_words").cast(DoubleType)))
      .orderBy("doc_id")
  }

  private[queries] val xBpeCorpusTokensSql =
    s"""WITH $bpeTrainCtes,
       |enc AS (SELECT word, CAST(len(string_split(trim(syms), ' ')) AS BIGINT) AS n_pieces
       |  FROM v$BpeSteps),
       |tok AS (SELECT doc_id, t AS word FROM (
       |    SELECT doc_id, unnest($ToksSql) AS t FROM documents) WHERE t <> ''),
       |agg AS (
       |  SELECT t.doc_id, COUNT(*) AS n_words, CAST(SUM(e.n_pieces) AS BIGINT) AS n_pieces
       |  FROM tok t JOIN enc e USING (word) GROUP BY t.doc_id)
       |SELECT d.doc_id,
       |  COALESCE(a.n_words, 0) AS n_words,
       |  COALESCE(a.n_pieces, 0) AS n_pieces,
       |  CASE WHEN COALESCE(a.n_words, 0) = 0 THEN 0.0
       |       ELSE CAST(a.n_pieces AS DOUBLE) / CAST(a.n_words AS DOUBLE) END AS expansion
       |FROM documents d LEFT JOIN agg a USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** TOKENIZER FERTILITY per language — pieces-per-word (and
    * chars-per-piece) of the stored BPE merge table, grouped by the
    * corpus' language column. Fertility is THE deployment-equity
    * number for a tokenizer: a language with 2× the fertility pays 2×
    * the sequence length (= context budget and training cost) for the
    * same text, which is how under-represented-in-training-data
    * languages get quietly taxed; a tokenizer refresh is judged by
    * this table moving toward uniform. Same broadcast word→pieces
    * deployment join as [[xBpeCorpusTokens]] (vocab-sized map-side
    * work, one corpus token pass), aggregated to the language-
    * cardinality grain — the cheap per-snapshot heartbeat beside the
    * per-doc table.
    */
  def xBpeFertility(spark: SparkSession, dir: String): DataFrame = {
    val pieceMap = xBpeEncode(spark, dir).select(col("word"), col("n_pieces"))
    Tables.documents(spark, dir)
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(pieceMap), Seq("word"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_words"),
        sum(col("n_pieces")).as("n_pieces"),
        sum(length(col("word")).cast(LongType)).as("n_chars_tok"))
      .select(col("lang"), col("n_words"), col("n_pieces"), col("n_chars_tok"),
        (col("n_pieces").cast(DoubleType) / col("n_words").cast(DoubleType))
          .as("fertility"),
        (col("n_chars_tok").cast(DoubleType) / col("n_pieces").cast(DoubleType))
          .as("chars_per_piece"))
      .orderBy("lang")
  }

  private[queries] val xBpeFertilitySql =
    s"""WITH $bpeTrainCtes,
       |enc AS (SELECT word, CAST(len(string_split(trim(syms), ' ')) AS BIGINT) AS n_pieces
       |  FROM v$BpeSteps),
       |tok AS (SELECT lang, t AS word FROM (
       |    SELECT lang, unnest($ToksSql) AS t FROM documents) WHERE t <> '')
       |SELECT t.lang, COUNT(*) AS n_words,
       |  CAST(SUM(e.n_pieces) AS BIGINT) AS n_pieces,
       |  CAST(SUM(len(t.word)) AS BIGINT) AS n_chars_tok,
       |  CAST(SUM(e.n_pieces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fertility,
       |  CAST(SUM(len(t.word)) AS DOUBLE) / CAST(SUM(e.n_pieces) AS DOUBLE) AS chars_per_piece
       |FROM tok t JOIN enc e USING (word)
       |GROUP BY t.lang ORDER BY t.lang""".stripMargin

  /** TOKENIZER DRIFT on the daily delta — the monitoring number that
    * decides a tokenizer REFRESH, the way `x_ivf_retrain_drift`
    * decides an index retrain. The tokenizer is trained on the
    * SNAPSHOT (the non-delta corpus — yesterday's data), so today's
    * arrivals (the `doc_id % 10` delta convention of
    * `x_dedup_incremental` / `x_contamination_incr`) are genuinely
    * out-of-sample: per language, the delta reports its
    * out-of-vocabulary rate (words the snapshot vocabulary never saw
    * — the left-join nulls) and matched-word fertility beside the
    * snapshot's own training-time fertility baseline. A rising
    * `oov_rate` or a `drift` pulling away from 0 is the signal that
    * the deployed merge table no longer fits the incoming
    * distribution. Scale shape: snapshot training is the stored
    * once-per-snapshot cost ([[bpeMergeStoreOn]]); the monitor itself
    * is one delta-sized token pass + one snapshot-sized baseline pass
    * against the broadcast vocab-sized map — per-day cost ∝ delta +
    * one baseline that amortizes across days, language-cardinality
    * output.
    */
  def xBpeDrift(spark: SparkSession, dir: String): DataFrame = {
    val snapFilter = col("doc_id") % 10 =!= 0
    val merges = bpeMergeStoreOn(spark, dir, s"bpe-merges-snap:$dir", snapFilter)
    val snapWords = Tables.documents(spark, dir).filter(snapFilter)
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val pieceMap = bpeEncodeWith(merges, snapWords)
      .select(col("word"), col("n_pieces"))
    val delta = Tables.documents(spark, dir).filter(col("doc_id") % 10 === 0)
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(pieceMap), Seq("word"), "left")
      .groupBy("lang").agg(
        count(lit(1)).as("n_words"),
        sum(when(col("n_pieces").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("n_pieces"), lit(0L))).as("np"))
    val baseline = Tables.documents(spark, dir).filter(snapFilter)
      .select(col("lang"), explode(TextOps.tokens(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(broadcast(pieceMap), Seq("word"))
      .groupBy("lang").agg(
        (sum(col("n_pieces")).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("fertility_base"))
    delta.join(baseline, Seq("lang"))
      .select(col("lang"), col("n_words"), col("n_oov"),
        (col("n_oov").cast(DoubleType) / col("n_words").cast(DoubleType))
          .as("oov_rate"),
        when(col("n_words") === col("n_oov"), lit(0.0))
          .otherwise(col("np").cast(DoubleType) /
            (col("n_words") - col("n_oov")).cast(DoubleType))
          .as("fertility_delta"),
        col("fertility_base"))
      .withColumn("drift", col("fertility_delta") - col("fertility_base"))
      .orderBy("lang")
  }

  private[queries] val xBpeDriftSql =
    s"""WITH ${bpeTrainCtesWhere("WHERE doc_id % 10 <> 0")},
       |enc AS (SELECT word, CAST(len(string_split(trim(syms), ' ')) AS BIGINT) AS n_pieces
       |  FROM v$BpeSteps),
       |dtok AS (SELECT lang, t AS word FROM (
       |    SELECT lang, unnest($ToksSql) AS t FROM documents WHERE doc_id % 10 = 0)
       |  WHERE t <> ''),
       |dd AS (
       |  SELECT lang, COUNT(*) AS n_words,
       |    CAST(SUM(CASE WHEN e.n_pieces IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |    CAST(SUM(COALESCE(e.n_pieces, 0)) AS BIGINT) AS np
       |  FROM dtok t LEFT JOIN enc e USING (word) GROUP BY lang),
       |stok AS (SELECT lang, t AS word FROM (
       |    SELECT lang, unnest($ToksSql) AS t FROM documents WHERE doc_id % 10 <> 0)
       |  WHERE t <> ''),
       |cf AS (
       |  SELECT lang,
       |    CAST(SUM(e.n_pieces) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS fertility_base
       |  FROM stok t JOIN enc e USING (word) GROUP BY lang)
       |SELECT lang, n_words, n_oov, oov_rate, fertility_delta, fertility_base,
       |  fertility_delta - fertility_base AS drift
       |FROM (
       |  SELECT d.lang, d.n_words, d.n_oov,
       |    CAST(d.n_oov AS DOUBLE) / CAST(d.n_words AS DOUBLE) AS oov_rate,
       |    CASE WHEN d.n_words = d.n_oov THEN 0.0
       |         ELSE CAST(d.np AS DOUBLE) / CAST(d.n_words - d.n_oov AS DOUBLE) END
       |      AS fertility_delta,
       |    cf.fertility_base
       |  FROM dd d JOIN cf USING (lang))
       |ORDER BY lang""".stripMargin

  /** PUBLIC per-document curation-gate entry for an arbitrary
    * (doc_id, text) relation against `dir`'s stored benchmark grams —
    * the one engine under the batch gates and the streaming ingest
    * twin ([[graft.streaming.EventStream.runCurationGateStream]]
    * gates each arriving micro-batch through here). Emits the three
    * flags and the fused keep decision; `CurationSpec` pins each flag
    * equal to its full-corpus gate query (`xQualityFilter.keep`,
    * `xRepetition.keep`, the contamination rule incl. the
    * benchmark-bucket drop) so batch funnel and stream cannot
    * diverge. Quality/repetition are per-row map-side expressions;
    * contamination is the doc's distinct 4-gram hashes against the
    * BROADCAST stored bench set (`x_contamination_incr`'s serving
    * economics) — per-batch cost ∝ the batch, the corpus never
    * rescanned.
    */
}
