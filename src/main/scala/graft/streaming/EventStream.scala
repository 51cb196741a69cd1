package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** Structured Streaming surface. The reference has no streaming at all
  * (SURVEY.md §2.10) — its archived/last file pair + EXCEPT + date
  * split (`main.py:63-67,89-93,128-135`) is a hand-rolled batch
  * simulation of an incremental stream. This module is the Spark-first
  * re-expression of that design: a file-source stream processed with
  * `Trigger.AvailableNow` gives exactly-once incremental batches with
  * checkpointed progress, replacing the manual file diffing.
  *
  * The transformations here are the SAME logical plans as the batch
  * queries (`ExtQueries.xEventsWindow`'s tumbling agg), applied to a
  * streaming DataFrame — Catalyst plans them incrementally with state
  * in the aggregation operator. `StreamingSpec` asserts stream output
  * == batch output over the same rows.
  *
  * Scale posture: watermark bounds state (late rows beyond 2 hours are
  * dropped, so state is O(active windows), not O(stream length));
  * shuffle partitions carry the stateful agg — on a cluster, state
  * lives in the state store per shuffle partition.
  */
object EventStream {

  /** Tumbling 1-hour windowed aggregation with a 2-hour watermark —
    * the streaming twin of `ExtQueries.xEventsWindow` (minus the
    * distinct-user count: `countDistinct` isn't incrementally
    * computable; use `approx_count_distinct` in streams).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(20, 2))).cast(DoubleType).as("sum_value"),
        approx_count_distinct("user_id").as("approx_users"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"), col("approx_users"))

  /** Incremental file-source pipeline: read new parquet files under
    * `inDir` (the streaming analogue of the reference's raw/last zone),
    * aggregate, and append complete windows to `outDir`. AvailableNow
    * processes everything pending, then stops — the exactly-once
    * version of the reference's daily batch.
    */
  def runAvailableNow(
      spark: SparkSession, inDir: String, outDir: String, checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    hourlyAgg(stream).writeStream
      .outputMode(OutputMode.Append) // only watermark-closed windows emit
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** A user's open session in the state store (epoch millis). */
  case class OpenSession(startMs: Long, lastMs: Long, n: Long)

  /** One closed session (the streaming twin of the batch
    * `session_window(ts, '6 hours')` aggregation in
    * `ExtQueries.xEventsSession`).
    */
  case class ClosedSession(
      user_id: Long, session_start: java.sql.Timestamp, n_events: Long,
      last_ts: java.sql.Timestamp)

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

  /** Custom stateful sessionization via `flatMapGroupsWithState`
    * (event-time timeout): per user, events within < 6 h of the last
    * one extend the open session; a ≥ 6 h gap closes it (exactly
    * `session_window`'s merge rule — a window spans [start,
    * last + gap)). Sessions also close when the WATERMARK passes
    * last + gap with no newer event (the timeout path), which is the
    * part a windowed aggregation cannot express per-group — this is
    * the "custom state" escape hatch for logic beyond built-in
    * windows.
    *
    * Scale posture: state is one small record per ACTIVE user (not
    * per event), partitioned by the groupByKey shuffle; the watermark
    * timeout bounds state lifetime.
    */
  def sessionize(events: DataFrame, spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    val gapMs = 6L * 3600 * 1000
    events
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts")).as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          def emit(s: OpenSession) = ClosedSession(
            uid, new java.sql.Timestamp(s.startMs), s.n, new java.sql.Timestamp(s.lastMs))
          val rows = it.toSeq.sortBy(_.ts.getTime)
          val out = Seq.newBuilder[ClosedSession]
          if (rows.isEmpty) {
            // event-time timeout: watermark passed last + gap
            state.getOption.foreach(s => out += emit(s))
            state.remove()
          } else {
            var st = state.getOption
            rows.foreach { r =>
              val t = r.ts.getTime
              st match {
                case Some(s) if t - s.lastMs >= gapMs => out += emit(s); st = Some(OpenSession(t, t, 1))
                case Some(s) =>
                  // merge, extending BOTH ends: a late-but-in-watermark
                  // event can precede the open session's start (the
                  // watermark delay < gap guarantees it still overlaps,
                  // so session_window would merge it too)
                  st = Some(OpenSession(
                    math.min(s.startMs, t), math.max(s.lastMs, t), s.n + 1))
                case None => st = Some(OpenSession(t, t, 1))
              }
            }
            state.update(st.get)
            state.setTimeoutTimestamp(st.get.lastMs + gapMs)
          }
          out.result().iterator
      }
  }

  /** File-source sessionization pipeline: one micro-batch per input
    * file (so the watermark advances between files and event-time
    * timeouts actually fire), closed sessions appended to `outDir`.
    */
  def runSessionize(
      spark: SparkSession, inDir: String, outDir: String, checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    sessionize(stream, spark).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Watermarked stream-stream interval join: each click joins the
    * same user's purchases from the preceding hour. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * the state store can evict rows once the watermark passes —
    * bounded state, the streaming counterpart of the batch as-of/range
    * join family.
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", "2 hours")
    clicks.join(purchases,
      col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
        col("purchase_ts") <= col("click_ts"))
      .select(col("click_id"), col("user_id"),
        date_format(col("click_ts"), "yyyy-MM-dd HH:mm:ss").as("click_ts"),
        col("purchase_id"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
        col("purchase_value"))
  }

  def runStreamStreamJoin(
      spark: SparkSession, inDir: String, outDir: String, checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    clickPurchaseJoin(stream).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Stream-STATIC dimension enrichment — the "decorate events with a
    * reference table" production pattern (the streaming twin of J1's
    * broadcast dimension join). The static side is a plain DataFrame:
    * Spark re-plans the join every micro-batch and BROADCASTS the dim,
    * so the enrichment is STATELESS — no state store, no watermark, no
    * stream-side shuffle (unlike the stream-stream interval join,
    * whose both sides buffer in state). Left join: an event with no
    * dim row passes through null-extended rather than silently
    * dropping from the feed. At 100 TB-of-events scale the stream side
    * never moves; every task hashes into its executor's broadcast
    * copy. NOTE on dim refresh: the per-batch re-plan re-broadcasts
    * the dim DATAFRAME, but a file-backed static frame pins its file
    * LISTING at creation — overwriting the dim directory under a
    * long-running stream serves stale rows or fails on the deleted
    * files. A daily-refreshed mapping needs the dim re-created per run
    * (the AvailableNow batch cadence used here) or a refreshable table
    * format.
    */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  def runEnrichStream(
      spark: SparkSession, inDir: String, dim: DataFrame, outDir: String,
      checkpointDir: String, key: String): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    enrich(stream, dim, key).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Streaming twin of the stored-ANN-index INGESTION side
    * ([[graft.ext.IvfStore]]): new embedding rows arriving as a file
    * stream are cell-assigned against the PERSISTED centroids —
    * boundary-replicated exactly like the offline build (each vector
    * under its top-2 cells) — and appended in the index's assignment
    * layout, so the probe self-join sees old and new vectors
    * uniformly. No retraining and no state store: the centroid row is
    * a broadcast static relation and assignment is the same map-side
    * codegen'd expression chain the batch build uses, so continuous
    * ingestion costs O(new rows) — the ANN twin of
    * `x_dedup_incremental`'s delta-only contract. Production cadence:
    * stream-assign arrivals continuously; retrain offline
    * (`IvfStore.ensure` under a fresh snapshot key) when drift
    * accumulates.
    */
  def runIvfAssignStream(
      spark: SparkSession, inDir: String, centroidsPath: String, k: Int,
      outDir: String, checkpointDir: String): StreamingQuery = {
    val cents = graft.ext.IvfIndex.pivotRow(
      spark.read.parquet(centroidsPath).select("c_id", "c_emb"), k)
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    graft.ext.IvfIndex.probeCells(
        stream.withColumn("v_norm", graft.ext.Similarity.norm(col("embedding"))),
        cents, k, nprobe = 2)
      .select(col("vec_id"), col("embedding"), col("v_norm"),
        col("cell"), col("cell_rank"))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Streaming twin of the stored-ANN-index SERVING side — the online
    * complement of [[runIvfAssignStream]]'s ingestion: QUERY vectors
    * arriving as a file stream are served per micro-batch through the
    * SAME probe path as the batch `x_ann_query_novel`
    * ([[graft.queries.ExtQueries.serveAnn]] — centroid-assign against
    * the stored pivot, probe the top-nprobe stored cells, rank
    * top-k), so online answers are row-identical to offline ones for
    * the same vectors (`EventStreamSpec` pins exactly that). No
    * retraining, no state store: the only state touched is the
    * already-persisted index (centroids + cell-bucketed assignment),
    * read-only — per-batch cost ∝ |batch| · probed cells, never
    * corpus. `foreachBatch` because the ranking window over candidate
    * rows is a batch-only operation; idempotence on replay comes from
    * writing each batch's results under its own `batch=<id>` subdir
    * with overwrite (a restarted micro-batch rewrites the same leaf,
    * exact duplicate of the first attempt — the same re-delivery
    * contract as the LWW sink's `_batchid` marker, in directory form).
    */
  def runAnnServeStream(
      spark: SparkSession, inDir: String, corpusDir: String,
      outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    runServeBatches(spark, inDir, outDir, checkpointDir, maxFilesPerTrigger)(
      batch => graft.queries.ExtQueries.serveAnn(spark, corpusDir, batch))

  /** Streaming SEMANTIC-DEDUP GATE — the arrival-side twin of the
    * batch `x_semantic_dedup_incr`: each micro-batch of incoming
    * vectors is gated through the same stored-index serving path
    * (centroid-assign against the reloaded pivot, probe top-2 cells,
    * drop iff any stored member is τ-close) via
    * [[graft.queries.ExtQueries.serveSemanticGate]]. Read-only
    * against stored state — no retrain, no state store, no index
    * mutation; per-batch cost ∝ |batch| · probed cell size. Same
    * replay-idempotence contract as [[runAnnServeStream]].
    */
  def runSemanticGateStream(
      spark: SparkSession, inDir: String, corpusDir: String,
      outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    runServeBatches(spark, inDir, outDir, checkpointDir, maxFilesPerTrigger)(
      batch => graft.queries.ExtQueries.serveSemanticGate(spark, corpusDir, batch))

  /** Streaming TOMBSTONE ingestion — the erasure-request feed: each
    * micro-batch of (vec_id) delete requests lands as its own
    * idempotent `batch=<id>` overwrite leaf (same replay contract as
    * the serving twins — a replayed batch rewrites the same leaf), so
    * the accumulated directory IS the tombstone relation the gated
    * serving path anti-joins
    * ([[graft.queries.ExtQueries.serveAnnExcluding]]). Deduplication
    * inside a batch is map-side `distinct`; duplicates ACROSS batches
    * are harmless by construction — an anti-join treats one tombstone
    * and five identically, so no state store or read-modify-write is
    * needed, the same reasoning that keeps posting maintenance
    * stateless. The index itself is never touched: deletes take
    * effect at read time, and the periodic rebuild
    * (`x_ivf_retrain_drift`'s decision) compacts them away.
    */
  def runTombstoneStream(
      spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    runServeBatches(spark, inDir, outDir, checkpointDir, maxFilesPerTrigger)(
      batch => batch.select(col("vec_id")).distinct())

  /** Streaming SPLIT ASSIGNMENT at ingest: every arriving document
    * gets its train/val/test decision (both the naive id-hash and the
    * dedup-group-keyed rule against the STORED component labels) the
    * moment it lands — the posture that makes eval-leakage-by-
    * late-assignment impossible: a doc's split is fixed before
    * anything downstream sees it. Stateless map-side hash + one
    * broadcastable label join per micro-batch
    * ([[graft.queries.ExtQueries.serveSplitAssign]] — one engine
    * under batch and stream); a doc the labels don't know yet gets
    * the provisional singleton-group split until the next dedup
    * refresh, which cannot MOVE any already-assigned doc whose label
    * is unchanged (the hash has no corpus-state input).
    */
  /** Streaming twin of the whitening application: the top-component
    * parameters (μ, v) are solved ONCE from the offline corpus at
    * stream build time ([[graft.queries.ExtQueries.whitenParams]] —
    * the same one-pass bounded Gram build the batch query runs) and
    * enter the stream as array literals; every arriving vector is
    * then whitened by the SAME stateless projection the batch
    * `x_whiten_top` uses ([[graft.queries.ExtQueries.whitenApply]] —
    * literally the shared function, so stream rows are bit-identical
    * to batch rows for the same vectors; `EventStreamSpec` pins it).
    * Append-only, no state store, no retrain — per-batch cost ∝ the
    * batch; the whitening parameters refresh when the corpus snapshot
    * does, never per-batch.
    */
  def runWhitenStream(
      spark: SparkSession, inDir: String, corpusDir: String,
      outDir: String, checkpointDir: String): StreamingQuery = {
    val (v, mu) = graft.queries.ExtQueries.whitenParams(spark, corpusDir)
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    graft.queries.ExtQueries.whitenApply(
        stream.select(col("vec_id"), col("embedding")), v, mu)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  def runSplitStream(
      spark: SparkSession, inDir: String, corpusDir: String,
      outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    runServeBatches(spark, inDir, outDir, checkpointDir, maxFilesPerTrigger)(
      batch => graft.queries.ExtQueries.serveSplitAssign(spark, corpusDir, batch))

  /** Streaming CURATION GATE at ingest: every arriving document gets
    * its quality / repetition / decontamination flags and the fused
    * keep decision per micro-batch
    * ([[graft.queries.ExtQueries.serveCurationGate]] — one engine
    * under the batch funnel and the stream). Quality and repetition
    * are stateless per-row expressions; decontamination probes the
    * BROADCAST stored benchmark-gram set — so per-batch cost ∝ the
    * batch and the only state is the bench relation, refreshed when
    * the benchmark is (never per-batch). The dedup-canonical stage is
    * deliberately NOT here: canonicality is a corpus-wide ranking
    * that belongs to the batch refresh, and gating it at ingest would
    * make a doc's keep decision depend on arrival order.
    */
  def runCurationGateStream(
      spark: SparkSession, inDir: String, corpusDir: String,
      outDir: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery =
    runServeBatches(spark, inDir, outDir, checkpointDir, maxFilesPerTrigger)(
      batch => graft.queries.ExtQueries.serveCurationGate(spark, corpusDir, batch))

  /** Shared micro-batch serving harness: file-stream `inDir`, apply
    * `f` per batch, write each batch's result under its own
    * idempotent `batch=<id>` overwrite leaf (a replayed batch
    * rewrites the same leaf — exact duplicate of the first attempt).
    */
  private def runServeBatches(
      spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, maxFilesPerTrigger: Option[Int])(
      f: DataFrame => DataFrame): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(inDir)
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        f(batch.toDF())
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming POSTING-INDEX maintenance — the text-retrieval twin of
    * [[runIvfAssignStream]]: arriving documents are exploded into the
    * stored (doc_id, len, token, cnt) posting layout and APPENDED, so
    * the TF-IDF / inverted-index / BM25 consumers see old and new
    * documents uniformly. Posting maintenance is append-only because
    * doc_ids are unique across batches — no read-modify-write of
    * existing postings, no state store, no watermark: the per-document
    * term frequency is computed MAP-SIDE (explode distinct tokens,
    * count occurrences inside the row's own token array) rather than
    * via a streaming aggregation, which keeps the query stateless and
    * the per-batch cost O(new documents). Document-frequency and
    * corpus statistics are intentionally NOT maintained here — both
    * derive from the posting relation at read time exactly as the
    * batch consumers do, so there is no second state table to drift.
    * Exactly-once comes from the file sink's checkpoint +
    * `_spark_metadata` manifest, same as every append sink here.
    */
  def runPostingsStream(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String, maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    import graft.ext.TextOps
    val schema = spark.read.parquet(inDir).schema
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(inDir)
    stream
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
        col("toks"), explode(array_distinct(col("toks"))).as("token"))
      .select(col("doc_id"), col("len"), col("token"),
        size(filter(col("toks"), x => x === col("token"))).cast("long").as("cnt"))
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Streaming twin of the batch text pipeline: quality-gate then
    * chunk incoming documents into fixed 64-token training windows.
    * Everything here is a stateless map-side Column expression
    * (`ext.TextOps`), so the SAME logical plan the batch queries use
    * runs incrementally with no state store and no watermark — the
    * ingestion shape of a continuous training-data feed.
    */
  def textPipeline(docs: DataFrame): DataFrame = {
    import graft.ext.TextOps
    docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(TextOps.qualityKeep(col("toks"))) // the FULL batch gate, shared thresholds
      .select(col("doc_id"),
        posexplode(TextOps.chunks(col("toks"), 64)).as(Seq("pos", "chunk")))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        size(col("chunk")).cast("long").as("chunk_tokens"),
        array_join(col("chunk"), " ").as("chunk_text"))
  }

  def runTextPipeline(
      spark: SparkSession, inDir: String, outDir: String, checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    textPipeline(stream).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Streaming deduplication with BOUNDED state:
    * `dropDuplicatesWithinWatermark` keeps each key's state only until
    * the watermark passes its event time — the streaming twin of the
    * batch exact-dedup operator, and the state-safety property a plain
    * `dropDuplicates` lacks on an unbounded stream (its key set grows
    * forever). Exactly-once per key within the watermark horizon;
    * replays of a late duplicate beyond the horizon are the documented
    * trade-off of bounded state.
    */
  def dedupByKey(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(keyCols)

  def runDedupStream(
      spark: SparkSession, inDir: String, outDir: String, checkpointDir: String,
      keyCols: Seq[String]): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(inDir)
    dedupByKey(stream, keyCols).writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** foreachBatch upsert sink: each micro-batch LWW-merges into the
    * target table — the streaming version of the reference's staged
    * DWH upsert (`load_functions.py:2-60`), with the micro-batch as
    * the staging side.
    */
  /** @param maxFilesPerTrigger bound files per micro-batch (None = all
    *        pending in one batch) — lets tests drive multi-batch runs
    *        and checkpoint-restart behavior deterministically.
    */
  def runUpsertSink(
      spark: SparkSession, inDir: String, targetDir: String, checkpointDir: String,
      keys: Seq[String], versionCol: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(inDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        mergeIntoTarget(spark, targetDir, batch, batch.schema)(
          graft.ops.Upsert.lwwUpsert(_, _, keys, Some(versionCol)))
      }
      .start()
  }

  /** Crash-safe read-merge-swap of a parquet target table: read the
    * current target (empty relation with `emptySchema` on first
    * batch), `merge(target, batch)`, write `.next`, swap via
    * rename-aside (target → `.old`, `.next` → target, drop `.old`).
    * A crash at any point leaves either the old table in place or a
    * recoverable copy at `.old` — restored here on replay BEFORE
    * reading, else the replayed batch would merge into an empty
    * target and the `.old` cleanup would erase the last copy. Not
    * transactional (a lakehouse format would be), but never a lost
    * table, which the naive delete-then-rename order risks. Uses the
    * TARGET path's filesystem, not the default one (targetDir may
    * carry a non-default scheme).
    */
  /** @param batchMarker when set, `_batchid` (underscore prefix —
    *        invisible to Spark's file index) is written INSIDE `.next`
    *        before the swap, so the marker becomes visible atomically
    *        WITH the merged state; [[mergeAggBatch]] reads it to make
    *        a non-idempotent merge replay-safe.
    */
  private def mergeIntoTarget(
      spark: SparkSession, targetDir: String, batch: DataFrame,
      emptySchema: org.apache.spark.sql.types.StructType,
      batchMarker: Option[Long] = None)(
      merge: (DataFrame, DataFrame) => DataFrame): Unit = {
    val tgt = new org.apache.hadoop.fs.Path(targetDir)
    val next = new org.apache.hadoop.fs.Path(targetDir + ".next")
    val old = new org.apache.hadoop.fs.Path(targetDir + ".old")
    val fs = tgt.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def renameOrFail(a: org.apache.hadoop.fs.Path, b: org.apache.hadoop.fs.Path): Unit =
      // Hadoop rename reports failure by returning false — an
      // unchecked false here would silently corrupt the target
      // (rename INTO an existing dir nests instead of replacing)
      if (!fs.rename(a, b)) throw new java.io.IOException(s"merge sink: rename $a -> $b failed")
    if (!fs.exists(tgt) && fs.exists(old)) renameOrFail(old, tgt)
    val target =
      try spark.read.parquet(targetDir)
      catch {
        case _: Exception =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
      }
    merge(target, batch).write.mode("overwrite").parquet(targetDir + ".next")
    batchMarker.foreach { bid =>
      val out = fs.create(new org.apache.hadoop.fs.Path(targetDir + ".next/_batchid"), true)
      try out.write(bid.toString.getBytes("UTF-8")) finally out.close()
    }
    fs.delete(old, true) // stale .old from a crash AFTER its swap completed
    if (fs.exists(tgt)) renameOrFail(tgt, old)
    renameOrFail(next, tgt)
    fs.delete(old, true)
    ()
  }

  /** Reads the `_batchid` marker of a state table (None if absent). */
  private def lastMergedBatch(spark: SparkSession, stateDir: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(stateDir + "/_batchid")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Streaming incremental-aggregation sink — the streaming twin of
    * the batch `a10_incremental` pattern: each micro-batch reduces to
    * its own partial aggregate STATE (decimal-exact sum / count /
    * max per event_type — a commutative monoid), which merges into
    * the stored state table by re-aggregation. The stored state is
    * group-cardinality rows regardless of how much history has
    * flowed; raw events are never rescanned, and the merge cost per
    * batch is state-sized, not history-sized — a continuously
    * maintained dashboard table. foreachBatch is AT-LEAST-once and a
    * sum-merge is not idempotent, so exactly-once is enforced by a
    * `_batchid` marker swapped in atomically WITH the merged state: a
    * replayed batch whose id is already recorded is a no-op (the LWW
    * sink needs no marker — its merge is idempotent). Decimal sums
    * make the final state bit-identical to a batch recompute over all
    * events regardless of how the stream was chopped into batches
    * (spec-asserted, including the double-merge replay guard).
    */
  def aggState(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(38, 2))).as("s_sum"),
        count(lit(1)).as("s_cnt"),
        max(col("ts")).as("s_max_ts"))

  def mergeAggState(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy("event_type")
      .agg(
        sum(col("s_sum")).cast(org.apache.spark.sql.types.DecimalType(38, 2)).as("s_sum"),
        sum(col("s_cnt")).as("s_cnt"),
        max(col("s_max_ts")).as("s_max_ts"))

  /** One micro-batch's merge, replay-safe: skips if `batchId` is
    * already recorded in the state table's `_batchid` marker (the
    * crash window: swap completed, streaming checkpoint commit did
    * not — Spark then replays the batch). Visible for the spec to
    * drive the replay path deterministically.
    */
  def mergeAggBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
      batchId: Long): Unit =
    if (!lastMergedBatch(spark, stateDir).contains(batchId)) {
      val delta = aggState(batch)
      mergeIntoTarget(spark, stateDir, delta, delta.schema, Some(batchId))(mergeAggState)
    }

  def runAggStateSink(
      spark: SparkSession, inDir: String, stateDir: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(inDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeAggBatch(spark, stateDir, batch, batchId)
      }
      .start()
  }

  /** One micro-batch's curation-funnel partial counters: the arriving
    * documents run the SAME gate as the batch funnel
    * ([[graft.queries.ExtQueries.serveCurationGate]]) and reduce to a
    * single row of stage-survivor counts — n0 arrivals, n1 past
    * quality, n2 past repetition, n3 past decontamination. Counts are
    * a commutative monoid, so per-batch partials sum-merge into the
    * stored funnel state exactly like [[aggState]]. The canonical-
    * dedup stage is deliberately absent, same reasoning as
    * [[runCurationGateStream]]: corpus-wide ranking belongs to the
    * batch refresh, not ingest.
    */
  def funnelCounters(spark: SparkSession, corpusDir: String, docs: DataFrame): DataFrame =
    graft.queries.ExtQueries.serveCurationGate(spark, corpusDir, docs)
      .agg(
        count(lit(1)).as("n0"),
        sum(when(col("qk"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("qk") && col("rk"), 1L).otherwise(0L)).as("n2"),
        sum(when(col("qk") && col("rk") && col("ck"), 1L).otherwise(0L)).as("n3"))

  def mergeFunnelState(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .agg(sum(col("n0")).as("n0"), sum(col("n1")).as("n1"),
        sum(col("n2")).as("n2"), sum(col("n3")).as("n3"))

  /** Sum-merge is not idempotent → the same `_batchid` replay guard
    * as [[mergeAggBatch]].
    */
  def mergeFunnelBatch(spark: SparkSession, stateDir: String, corpusDir: String,
      batch: DataFrame, batchId: Long): Unit =
    if (!lastMergedBatch(spark, stateDir).contains(batchId)) {
      val delta = funnelCounters(spark, corpusDir, batch)
      mergeIntoTarget(spark, stateDir, delta, delta.schema, Some(batchId))(mergeFunnelState)
    }

  /** The stored funnel counters formatted as the batch data card's
    * stage rows (stage, n_in, n_kept, drop_rate) — the LIVE view of
    * `x_curation_funnel`'s first three stages, readable mid-stream at
    * any point. Spec-pinned row-equal to the batch funnel over the
    * same documents.
    */
  def funnelStages(state: DataFrame): DataFrame = {
    def stage(name: String, nIn: String, nKept: String): DataFrame =
      state.select(lit(name).as("stage"), col(nIn).as("n_in"), col(nKept).as("n_kept"),
        ((col(nIn) - col(nKept)).cast(org.apache.spark.sql.types.DoubleType)
          / col(nIn).cast(org.apache.spark.sql.types.DoubleType)).as("drop_rate"))
    stage("1_quality", "n0", "n1")
      .unionByName(stage("2_repetition", "n1", "n2"))
      .unionByName(stage("3_decontamination", "n2", "n3"))
      .orderBy("stage")
  }

  /** Streaming curation-funnel maintenance: the live data-card view.
    * Each arriving micro-batch of documents reduces to its 1-row
    * stage-counter partial (gate cost ∝ batch; the only reference
    * state is the broadcast benchmark-gram relation), merged into the
    * single-row stored funnel state. State stays one row forever;
    * documents are never rescanned.
    */
  def runFunnelStream(
      spark: SparkSession, inDir: String, corpusDir: String, stateDir: String,
      checkpointDir: String, maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(inDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeFunnelBatch(spark, stateDir, corpusDir, batch, batchId)
      }
      .start()
  }

  def mergeReleaseLedgerState(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy("kind", "source", "bucket", "shard")
      .agg(sum(col("n")).as("n"))

  /** Sum-merge is not idempotent → the same `_batchid` replay guard
    * as [[mergeAggBatch]].
    */
  def mergeReleaseLedgerBatch(spark: SparkSession, stateDir: String, corpusDir: String,
      batch: DataFrame, batchId: Long): Unit =
    if (!lastMergedBatch(spark, stateDir).contains(batchId)) {
      // the ledger delta references the micro-batch from several
      // joined branches (gate, canonical, split, scalar counters);
      // uncached, the one merge write re-scans the batch once per
      // branch — measured ~6x input amplification in the sf1
      // streaming run (SCALING_sf1.md) — so pin it for the merge
      val cached = batch.persist()
      try {
        val delta = graft.queries.ExtQueries.releaseLedgerDelta(spark, corpusDir, cached)
        mergeIntoTarget(spark, stateDir, delta, delta.schema, Some(batchId))(mergeReleaseLedgerState)
      } finally {
        cached.unpersist()
        ()
      }
    }

  /** Streaming RELEASE LEDGER maintenance — the ingest-time release
    * manifest (the r10 verdict's item 6, extending [[runFunnelStream]]
    * past the gate): each arriving micro-batch of documents runs the
    * batch release's own serving paths and merges its
    * mixture/shard-sufficient partials (three scalar stage counters +
    * the (source, bucket, shard) train-survivor count ledger) into
    * stored state, so `ExtQueries.releaseManifestFromLedger` can
    * render the full x_release_pipeline manifest — including mixture
    * and per-shard accounting — at ANY point mid-ingest, without
    * rescanning a single document. State cardinality is bounded by
    * |sources|×10000×shards, corpus-independent (the CMS-sink
    * economics). Spec-pinned row-equal to the batch manifest over the
    * same documents, with batch chopping invisible.
    */
  def runReleaseLedgerStream(
      spark: SparkSession, inDir: String, corpusDir: String, stateDir: String,
      checkpointDir: String, maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(inDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeReleaseLedgerBatch(spark, stateDir, corpusDir, batch, batchId)
      }
      .start()
  }

  /** Streaming COUNT-MIN SKETCH maintenance — the online form of
    * `x_countmin`, and the shape the sketch actually earns its keep
    * in at 100 TB: no vocabulary is ever materialized; each arriving
    * micro-batch of documents reduces to ITS OWN D×W partial counter
    * table (fixed size no matter how many rows the batch carried —
    * CMS counters are linear in token counts, so partial aggregation
    * IS the sketch's mergeability), which sum-merges into the stored
    * counter state. State stays D×W rows forever; the raw text is
    * never rescanned; a frequency estimate for ANY later query token
    * is servable from the store at any point mid-stream. The batch
    * query and this sink share the same `cmsFan` bucket expressions,
    * so streamed counters are bit-equal to a batch build over the
    * same documents regardless of how the stream was chopped
    * (spec-asserted). Sum-merge is not idempotent → the same
    * `_batchid` replay guard as [[mergeAggBatch]].
    */
  def cmsBatchCounters(docs: DataFrame): DataFrame =
    graft.queries.ExtQueries.cmsCounters(
      docs.select(explode(graft.ext.TextOps.tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("cnt")))

  def mergeCmsState(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy("r", "bucket").agg(sum(col("c")).as("c"))

  def mergeCmsBatch(spark: SparkSession, stateDir: String, batch: DataFrame,
      batchId: Long): Unit =
    if (!lastMergedBatch(spark, stateDir).contains(batchId)) {
      val delta = cmsBatchCounters(batch)
      mergeIntoTarget(spark, stateDir, delta, delta.schema, Some(batchId))(mergeCmsState)
    }

  /** Exactly-once streaming APPEND into a Delta table — the protocol's
    * own idempotence mechanism, not a side-channel marker: every
    * micro-batch lands as one [[graft.sources.DeltaLog.append]] commit
    * stamped with a `txn` action (appId, batchId), and a replayed
    * batch — foreachBatch redelivery after a crash, or an operator
    * re-running the WHOLE stream with a fresh checkpoint directory —
    * is skipped because the table itself remembers the epoch
    * ([[graft.sources.DeltaLog.lastTxnVersion]], preserved across
    * checkpoint compaction). This is how delta-spark's own streaming
    * sink achieves exactly-once; spec-pinned row-equal to the batch
    * relation with a deliberate whole-stream replay.
    */
  def runDeltaAppendStream(
      spark: SparkSession, inDir: String, tablePath: String, checkpointDir: String,
      appId: String = "graft-stream",
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(inDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.DeltaLog.append(spark, tablePath, batch,
          txn = Some((appId, batchId)))
        ()
      }
      .start()
  }

  /** Exactly-once ICEBERG streaming sink — the [[runDeltaAppendStream]]
    * twin on the other table format: each micro-batch lands through
    * `IcebergTable.appendOnce`, whose epoch stamp in the snapshot
    * SUMMARY absorbs the batch replayed after a crash-restart (the
    * same contract Flink's Iceberg committer keys on checkpoint ids).
    */
  def runIcebergAppendStream(
      spark: SparkSession, inDir: String, tablePath: String, checkpointDir: String,
      appId: String = "graft-stream",
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(inDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.IcebergTable.appendOnce(spark, tablePath, batch, appId, batchId)
        ()
      }
      .start()
  }

  def runCmsStream(
      spark: SparkSession, inDir: String, stateDir: String, checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val schema = spark.read.parquet(inDir).schema
    val reader = spark.readStream.schema(schema)
    val stream = maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(inDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeCmsBatch(spark, stateDir, batch, batchId)
      }
      .start()
  }
}
