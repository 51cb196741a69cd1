package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EventStreamSpec extends SparkSpec {

  private def mkEvents = {
    import spark.implicits._
    (0 until 200).map { i =>
      (i.toLong, Timestamp.valueOf(f"2024-01-01 ${i % 5}%02d:${i % 60}%02d:00"),
        (i % 7).toLong, Seq("click", "view", "purchase")(i % 3), i * 1.5, s"""{"k": ${i % 10}}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("IVF assign stream: arrivals index against the STORED centroids, bit-equal to the batch build") {
    import graft.ext.{IvfIndex, IvfStore, Similarity}
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-ivf-stream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    // offline build on the existing corpus
    val corpus = graft.Tables.embeddings(spark, sfDir)
      .withColumn("v_norm", Similarity.norm(col("embedding")))
    val st = IvfStore.ensure(corpus, key = s"$sfDir-ivf-stream-spec",
      k = 4, iters = 2, nassign = 2, dim = 64)
    // "day 2": new vectors the index has never seen (shifted ids,
    // perturbed embeddings), landing as a stream batch
    val novel = graft.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + 100000L).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.01f)).as("embedding"),
        col("label"))
    novel.write.parquet(in)

    val q = EventStream.runIvfAssignStream(spark, in, st.centroidsPath, 4, out, ck)
    assert(q.awaitTermination(120000), "stream did not terminate within the timeout")

    // streamed assignment == the batch assignment chain on the same rows
    val streamed = spark.read.parquet(out)
      .select("vec_id", "cell", "cell_rank")
    val cents = IvfIndex.pivotRow(
      spark.read.parquet(st.centroidsPath).select("c_id", "c_emb"), 4)
    val batch = IvfIndex.probeCells(
        spark.read.parquet(in).withColumn("v_norm", Similarity.norm(col("embedding"))),
        cents, 4, nprobe = 2)
      .select("vec_id", "cell", "cell_rank")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // and the output unions cleanly with the stored assignment layout
    val merged = spark.read.parquet(st.assignedPath).unionByName(
      spark.read.parquet(out))
    assert(merged.count() ==
      2 * corpus.count() + 2 * spark.read.parquet(in).count())
  }

  test("ANN serve stream: micro-batch serving row-equal to x_ann_query_novel on the same vectors") {
    import graft.queries.ExtQueries
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-ann-serve-stream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    // the EXACT novel-query vectors of the batch query, landed as TWO
    // files so maxFilesPerTrigger=1 splits serving across micro-batches
    val q = ExtQueries.novelQueries(spark).select("query_id", "embedding")
    q.filter(col("query_id") % 2 === 0).coalesce(1).write.parquet(in)
    q.filter(col("query_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(in)

    val sq = EventStream.runAnnServeStream(spark, in, sfDir, out, ck,
      maxFilesPerTrigger = Some(1))
    assert(sq.awaitTermination(180000), "stream did not terminate within the timeout")

    // two micro-batches, each under its own idempotent batch=<id> leaf
    assert(new java.io.File(out).listFiles().count(_.getName.startsWith("batch=")) == 2)
    // online results == the offline serving query, row for row (cos
    // included: same stored index, same probe path, same arithmetic)
    val streamed = spark.read.parquet(out).drop("batch")
      .select("query_id", "rank", "vec_id", "cos")
    val batch = ExtQueries.queries("x_ann_query_novel")(spark, sfDir)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() == batch.count())
  }

  test("semantic gate stream: micro-batch arrival gating row-equal to x_semantic_dedup_incr") {
    import graft.queries.ExtQueries
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-semgate-stream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    val q = ExtQueries.novelQueries(spark).select("query_id", "embedding")
    q.filter(col("query_id") % 2 === 0).coalesce(1).write.parquet(in)
    q.filter(col("query_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(in)

    val sq = EventStream.runSemanticGateStream(spark, in, sfDir, out, ck,
      maxFilesPerTrigger = Some(1))
    assert(sq.awaitTermination(180000), "stream did not terminate within the timeout")

    val streamed = spark.read.parquet(out).drop("batch")
      .select("query_id", "keep")
    val batch = ExtQueries.queries("x_semantic_dedup_incr")(spark, sfDir)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() == batch.count())
  }

  test("split stream: ingest-time split assignment row-equal to x_split_assign") {
    import graft.queries.ExtQueries
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-split-stream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    // the corpus docs landed as TWO files so assignment spans two
    // micro-batches; the decision must not depend on batch boundaries
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(in)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(in)

    val sq = EventStream.runSplitStream(spark, in, sfDir, out, ck,
      maxFilesPerTrigger = Some(1))
    assert(sq.awaitTermination(180000), "stream did not terminate within the timeout")

    val streamed = spark.read.parquet(out).drop("batch")
      .select("doc_id", "component", "split", "split_group")
    val batch = ExtQueries.queries("x_split_assign")(spark, sfDir)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() == batch.count())
  }

  test("whiten stream: arriving vectors whitened bit-identically to the batch projection") {
    import graft.queries.ExtQueries
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-whiten-stream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    // arrivals split over two files => two micro-batches; whitening
    // is stateless so results must not depend on batch boundaries
    val emb = graft.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    emb.filter(col("vec_id") % 2 === 0).coalesce(1).write.parquet(in)
    emb.filter(col("vec_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(in)

    val sq = EventStream.runWhitenStream(spark, in, sfDir, out, ck)
    assert(sq.awaitTermination(180000), "stream did not terminate within the timeout")

    val streamed = spark.read.parquet(out)
      .select("vec_id", "t_q", "orig_q", "res_q")
    val (v, mu) = ExtQueries.whitenParams(spark, sfDir)
    val batch = ExtQueries.whitenApply(emb, v, mu)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() == batch.count())
  }

  test("curation gate stream: ingest-time gating row-equal to the batch gate entry") {
    import graft.queries.ExtQueries
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-gate-stream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(in)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(in)

    val sq = EventStream.runCurationGateStream(spark, in, sfDir, out, ck,
      maxFilesPerTrigger = Some(1))
    assert(sq.awaitTermination(180000), "stream did not terminate within the timeout")

    val streamed = spark.read.parquet(out).drop("batch")
      .select("doc_id", "qk", "rk", "ck", "keep")
    val batch = ExtQueries.serveCurationGate(spark, sfDir,
      graft.Tables.documents(spark, sfDir))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    assert(streamed.count() == batch.count())
  }

  test("funnel stream: live stage counters equal x_curation_funnel on the same documents") {
    import graft.queries.ExtQueries
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-funnel-stream").toString
    val in = s"$dir/in"; val st = s"$dir/state"; val ck = s"$dir/ck"
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    // two files + maxFilesPerTrigger=1 forces multi-batch merging: the
    // summed partials must make batch chopping invisible
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(in)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(in)
    val sq = EventStream.runFunnelStream(spark, in, sfDir, st, ck,
      maxFilesPerTrigger = Some(1))
    assert(sq.awaitTermination(180000), "stream did not terminate within the timeout")

    // the live view's three gate stages are row-equal to the batch
    // data-card funnel over the same corpus (the canonical-dedup stage
    // is batch-refresh-only by design — see runCurationGateStream)
    val live = EventStream.funnelStages(spark.read.parquet(st))
    val batch = ExtQueries.xCurationFunnel(spark, sfDir)
      .filter(col("stage").isin("1_quality", "2_repetition", "3_decontamination"))
    assert(live.exceptAll(batch).isEmpty && batch.exceptAll(live).isEmpty)
    assert(live.count() == 3)

    // replayed micro-batch is a no-op (sum-merge is not idempotent)
    val b = docs.limit(10)
    EventStream.mergeFunnelBatch(spark, st, sfDir, b, batchId = 99L)
    val once = spark.read.parquet(st).collect()(0).getLong(0)
    EventStream.mergeFunnelBatch(spark, st, sfDir, b, batchId = 99L)
    assert(spark.read.parquet(st).collect()(0).getLong(0) == once)
  }

  test("release-ledger stream: mid-ingest manifest equals x_release_pipeline on the same documents") {
    import graft.queries.ExtQueries
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-release-stream").toString
    val in = s"$dir/in"; val st = s"$dir/state"; val ck = s"$dir/ck"
    // FULL document rows (the ledger needs source for mixture rates),
    // chopped into two files + maxFilesPerTrigger=1: the summed
    // partials must make batch chopping invisible — including the
    // mixture thresholds, which are only correct if the ledger carries
    // the right per-(source, bucket) sufficient statistics
    val docs = graft.Tables.documents(spark, sfDir)
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(in)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(in)
    val sq = EventStream.runReleaseLedgerStream(spark, in, sfDir, st, ck,
      maxFilesPerTrigger = Some(1))
    assert(sq.awaitTermination(180000), "stream did not terminate within the timeout")

    val live = ExtQueries.releaseManifestFromLedger(spark.read.parquet(st))
    val batch = ExtQueries.xReleasePipeline(spark, sfDir)
    assert(live.exceptAll(batch).isEmpty && batch.exceptAll(live).isEmpty,
      s"stream manifest != batch manifest:\nlive=${live.collect().mkString(",")}\n" +
        s"batch=${batch.collect().mkString(",")}")
    assert(live.count() == batch.count())

    // replayed micro-batch is a no-op (sum-merge is not idempotent)
    val b = docs.limit(10)
    EventStream.mergeReleaseLedgerBatch(spark, st, sfDir, b, batchId = 99L)
    val once = ExtQueries.releaseManifestFromLedger(spark.read.parquet(st))
      .collect().map(_.toString).toSeq
    EventStream.mergeReleaseLedgerBatch(spark, st, sfDir, b, batchId = 99L)
    val twice = ExtQueries.releaseManifestFromLedger(spark.read.parquet(st))
      .collect().map(_.toString).toSeq
    assert(once == twice)
  }

  test("tombstone stream: streamed erasure requests gate serving row-equal to x_ann_delete") {
    import graft.queries.ExtQueries
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-tomb-stream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    // the batch query's tombstone set (vec_id % 11 == 3), landed as TWO
    // files — with one id duplicated ACROSS batches to exercise the
    // no-state-needed claim (an anti-join treats 1 and 2 tombstones
    // identically)
    val tomb = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id")).filter(col("vec_id") % 11 === 3)
    tomb.filter(col("vec_id") % 2 === 0).coalesce(1).write.parquet(in)
    tomb.filter(col("vec_id") % 2 =!= 0)
      .unionByName(tomb.filter(col("vec_id") === 14L)) // cross-batch dup
      .coalesce(1).write.mode("append").parquet(in)

    val sq = EventStream.runTombstoneStream(spark, in, out, ck,
      maxFilesPerTrigger = Some(1))
    assert(sq.awaitTermination(180000), "stream did not terminate within the timeout")

    // accumulated delete store -> the SAME gated serving entry the
    // batch query uses; results must match it row for row
    val streamedTombs = spark.read.parquet(out).select("vec_id")
    val served = ExtQueries.serveAnnExcluding(spark, sfDir,
      ExtQueries.novelQueries(spark), streamedTombs)
    val batch = ExtQueries.queries("x_ann_delete")(spark, sfDir)
    assert(served.exceptAll(batch).isEmpty && batch.exceptAll(served).isEmpty)
    assert(served.count() == batch.count())
    // and no served id is ever a streamed tombstone
    assert(served.join(streamedTombs, Seq("vec_id"), "left_semi").isEmpty)
  }

  test("postings stream: incremental index maintenance row-equal to the batch posting build") {
    import graft.ext.TextOps
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-postings-stream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    // land the corpus as TWO separate files so maxFilesPerTrigger=1
    // genuinely exercises multi-batch incremental appends
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(in)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(in)

    val q = EventStream.runPostingsStream(spark, in, out, ck, maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000), "stream did not terminate within the timeout")

    // streamed posting state == the batch (doc,token) build on the
    // same rows — the exact layout the TF-IDF / inverted-index / BM25
    // consumers read
    val streamed = spark.read.parquet(out)
      .select("doc_id", "len", "token", "cnt")
    val batch = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("len"),
        explode(col("toks")).as("token"))
      .groupBy("doc_id", "len", "token").agg(count(lit(1)).as("cnt"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // df derived from the streamed state matches the batch df
    val dfS = streamed.groupBy("token").count()
    val dfB = batch.groupBy("token").count()
    assert(dfS.exceptAll(dfB).isEmpty && dfB.exceptAll(dfS).isEmpty)
  }

  test("CMS stream: counters merged across micro-batches bit-equal the batch sketch build") {
    val sfDir = "/root/testdata/sf0.001"
    val dir = Files.createTempDirectory("graft-cms-stream").toString
    val in = s"$dir/in"; val st = s"$dir/state"; val ck = s"$dir/ck"
    // two files -> two micro-batches at maxFilesPerTrigger=1, so the
    // sum-merge path (not just the first-batch write) is exercised
    val docs = graft.Tables.documents(spark, sfDir).select("doc_id", "text")
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(in)
    docs.filter(col("doc_id") % 2 =!= 0).coalesce(1).write.mode("append").parquet(in)

    val q = EventStream.runCmsStream(spark, in, st, ck, maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000), "stream did not terminate within the timeout")

    // streamed counter state == the batch sketch over the same rows:
    // CMS counters are linear in token counts, so HOW the stream was
    // chopped cannot show in the state
    val streamed = spark.read.parquet(st).select("r", "bucket", "c")
    val batch = EventStream.cmsBatchCounters(docs)
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
    // replay guard: re-merging the last batch is a no-op (sum-merge
    // is not idempotent; the _batchid marker must gate it)
    val lastBatch = docs.filter(col("doc_id") % 2 =!= 0)
    EventStream.mergeCmsBatch(spark, st, lastBatch, batchId = 1L)
    val after = spark.read.parquet(st).select("r", "bucket", "c")
    assert(after.exceptAll(batch).isEmpty && batch.exceptAll(after).isEmpty)
  }

  test("AvailableNow file stream: windowed agg matches the batch twin on closed windows") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    mkEvents.write.parquet(in)

    val q = EventStream.runAvailableNow(spark, in, out, ck)
    assert(q.awaitTermination(120000), "stream did not terminate within the timeout")

    val streamed = spark.read.parquet(out)
    val batch = EventStream.hourlyAgg(spark.read.parquet(in))
    // Append mode only emits watermark-closed windows; every emitted
    // row must match the batch plan exactly.
    val sCols = streamed.select("hour_start", "event_type", "n", "sum_value").collect().toSet
    val bCols = batch.select("hour_start", "event_type", "n", "sum_value").collect().toSet
    assert(sCols.nonEmpty)
    assert(sCols.subsetOf(bCols))
  }

  test("flatMapGroupsWithState sessionization: gap-closed and timeout-closed sessions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sess").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    def ev(id: Long, ts: String, uid: Long) =
      (id, Timestamp.valueOf(ts), uid, "click", 1.0, "{}")
    // file 1: user 1 has a 2-event session then a >=6h gap opens a new
    // one; user 2 has one session
    Seq(
      ev(0, "2024-01-01 00:00:00", 1), ev(1, "2024-01-01 01:00:00", 1),
      ev(2, "2024-01-01 08:00:00", 1), // >= 6h after 01:00 -> new session
      ev(3, "2024-01-01 02:00:00", 2))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(in)
    // file 2: a LATE event (>= watermark 06:00, before user 1's open
    // session start 08:00) must merge and extend the session start
    // BACKWARD, like session_window would
    Seq(ev(9, "2024-01-01 07:00:00", 1))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(in)
    // file 3: a much later event pushes the watermark (2h delay) far
    // past every earlier session's last + 6h -> timeouts fire
    Seq(ev(4, "2024-01-03 00:00:00", 3))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(in)

    val q = EventStream.runSessionize(spark, in, out, ck)
    assert(q.awaitTermination(180000), "stream did not terminate within the timeout")

    val got = spark.read.parquet(out)
      .collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[Timestamp]("session_start").toString,
        r.getAs[Long]("n_events"),
        r.getAs[Timestamp]("last_ts").toString)).toSet
    // user 1 session A closed by the in-batch gap; session B grew
    // BACKWARD to 07:00 from file 2's late event, then closed (with
    // user 2's) by the event-time timeout once file 3's watermark
    // passed; user 3's session stays open (never emitted)
    assert(got == Set(
      (1L, "2024-01-01 00:00:00.0", 2L, "2024-01-01 01:00:00.0"),
      (1L, "2024-01-01 07:00:00.0", 2L, "2024-01-01 08:00:00.0"),
      (2L, "2024-01-01 02:00:00.0", 1L, "2024-01-01 02:00:00.0")))
  }

  test("stream-stream interval join matches the batch twin") {
    val dir = Files.createTempDirectory("graft-ssj").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    mkEvents.write.parquet(in)

    val q = EventStream.runStreamStreamJoin(spark, in, out, ck)
    assert(q.awaitTermination(180000), "stream did not terminate within the timeout")

    val streamed = spark.read.parquet(out)
    val batch = EventStream.clickPurchaseJoin(spark.read.parquet(in))
    val s = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s.nonEmpty)
    // inner interval join over a single AvailableNow pass emits every
    // in-window pair; both plans must agree exactly
    assert(s == b)
  }

  test("stream-static enrich: broadcast dim join matches the batch twin, unmatched passes through") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-enrich").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    mkEvents.write.parquet(in)
    // dim deliberately misses 'view': left-join must null-extend, not drop
    val dim = Seq(("click", "engagement", 1.0), ("purchase", "revenue", 5.0))
      .toDF("event_type", "category", "weight")

    val q = EventStream.runEnrichStream(spark, in, dim, out, ck, "event_type")
    assert(q.awaitTermination(120000), "stream did not terminate within the timeout")

    val streamed = spark.read.parquet(out)
    val batch = EventStream.enrich(spark.read.parquet(in), dim, "event_type")
    val s = streamed.collect().map(_.toSeq).toSet
    val b = batch.collect().map(_.toSeq).toSet
    assert(s == b)
    // the stateless join: every input event present exactly once,
    // including the unmatched 'view' rows (null category)
    assert(streamed.count() == mkEvents.count())
    assert(streamed.filter(col("category").isNull).select("event_type")
      .distinct().collect().map(_.getString(0)).toSeq == Seq("view"))
  }

  test("foreachBatch LWW upsert sink merges micro-batches into the target table") {
    val dir = Files.createTempDirectory("graft-upsert").toString
    val in = s"$dir/in"; val tgt = s"$dir/target"; val ck = s"$dir/ck"
    import spark.implicits._
    Seq((1L, "a", 100L), (2L, "b", 100L)).toDF("k", "s", "ver").write.parquet(in)
    val q1 = EventStream.runUpsertSink(spark, in, tgt, ck, Seq("k"), "ver")
    assert(q1.awaitTermination(120000), "stream did not terminate within the timeout")
    // second batch: newer version for k=1, new key 3
    Seq((1L, "a2", 200L), (3L, "c", 50L)).toDF("k", "s", "ver")
      .write.mode("append").parquet(in)
    val q2 = EventStream.runUpsertSink(spark, in, tgt, ck, Seq("k"), "ver")
    assert(q2.awaitTermination(120000), "stream did not terminate within the timeout")
    val out = spark.read.parquet(tgt).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("s")).toMap
    assert(out == Map(1L -> "a2", 2L -> "b", 3L -> "c"))
  }

  test("agg-state sink: state merged across micro-batches equals a batch recompute over all events") {
    val dir = Files.createTempDirectory("graft-aggstate").toString
    val in = s"$dir/in"; val st = s"$dir/state"; val ck = s"$dir/ck"
    // many small files + maxFilesPerTrigger=1 forces multi-batch
    // merging — the decimal monoid must make batch chopping invisible
    mkEvents.repartition(5).write.parquet(in)
    val q = EventStream.runAggStateSink(spark, in, st, ck, maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(120000), "stream did not terminate within the timeout")
    val state = spark.read.parquet(st).collect()
      .map(r => (r.getAs[String]("event_type"),
        (r.getAs[java.math.BigDecimal]("s_sum"), r.getAs[Long]("s_cnt"),
          r.getAs[Timestamp]("s_max_ts")))).toMap
    val batch = EventStream.aggState(spark.read.parquet(in)).collect()
      .map(r => (r.getAs[String]("event_type"),
        (r.getAs[java.math.BigDecimal]("s_sum"), r.getAs[Long]("s_cnt"),
          r.getAs[Timestamp]("s_max_ts")))).toMap
    assert(state.keySet == batch.keySet && state.keySet.nonEmpty)
    state.foreach { case (k, (s, c, m)) =>
      val (bs, bc, bm) = batch(k)
      assert(s.compareTo(bs) == 0 && c == bc && m == bm, s"$k: $s/$c/$m vs $bs/$bc/$bm")
    }
    // incremental day-2: appending more events only reprocesses the delta
    mkEvents.withColumn("value", col("value") + 1.0).repartition(3)
      .write.mode("append").parquet(in)
    val q2 = EventStream.runAggStateSink(spark, in, st, ck, maxFilesPerTrigger = Some(1))
    assert(q2.awaitTermination(120000), "stream did not terminate within the timeout")
    val total = spark.read.parquet(st).agg(sum("s_cnt")).collect()(0).getLong(0)
    assert(total == 400L, s"expected 400 events in state, got $total")
  }

  test("agg-state sink: a replayed micro-batch is a no-op (sum-merge is not idempotent)") {
    val dir = Files.createTempDirectory("graft-aggreplay").toString
    val st = s"$dir/state"
    val batch = mkEvents
    // foreachBatch is at-least-once: the crash window is swap-complete
    // but checkpoint-uncommitted, after which Spark re-delivers the
    // SAME batch id — the _batchid marker must make the second merge
    // a no-op, or every crash doubles the replayed events' sums
    EventStream.mergeAggBatch(spark, st, batch, batchId = 7L)
    val once = spark.read.parquet(st).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("s_cnt")).toMap
    EventStream.mergeAggBatch(spark, st, batch, batchId = 7L) // replay
    val twice = spark.read.parquet(st).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("s_cnt")).toMap
    assert(once == twice, s"replay double-merged: $once vs $twice")
    // and the NEXT batch id still merges
    EventStream.mergeAggBatch(spark, st, batch, batchId = 8L)
    val next = spark.read.parquet(st).agg(sum("s_cnt")).collect()(0).getLong(0)
    assert(next == 2L * batch.count(), s"batch 8 should merge: $next")
  }

  test("streaming text pipeline == batch twin (stateless map-side ops compose)") {
    val dir = Files.createTempDirectory("graft-textpipe").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    import spark.implicits._
    Seq(
      (1L, (0 until 100).map(i => s"tok$i").mkString(" ")), // 100 diverse tokens -> 2 chunks
      (2L, "too short"),                                    // gated out (< 5 tokens)
      (3L, (0 until 64).map(i => s"word$i").mkString(" "))) // exactly one full chunk
      .toDF("doc_id", "text")
      .coalesce(1).write.parquet(in)

    val q = EventStream.runTextPipeline(spark, in, out, ck)
    assert(q.awaitTermination(120000), "stream did not terminate within the timeout")

    val streamed = spark.read.parquet(out).collect().map(_.toSeq).toSet
    val batch = EventStream.textPipeline(spark.read.parquet(in)).collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty && streamed == batch)
    // doc 2 gated out; doc 1 split 64+36; doc 3 one chunk of 64
    val byDoc = spark.read.parquet(out).collect()
      .groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length).toMap
    assert(byDoc == Map(1L -> 2, 3L -> 1))
  }

  test("dropDuplicatesWithinWatermark: cross-batch duplicates collapse, state stays bounded") {
    val dir = Files.createTempDirectory("graft-dedup").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ck = s"$dir/ck"
    import spark.implicits._
    def ev(id: Long, ts: String) = (id, Timestamp.valueOf(ts), 1L, "click", 1.0, "{}")
    // file 1: e1, e2; file 2 (separate micro-batch): DUPLICATE e1
    // within the watermark + new e3
    Seq(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:30:00"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(in)
    Seq(ev(1, "2024-01-01 10:00:00"), ev(3, "2024-01-01 11:00:00"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("append").parquet(in)

    val q = EventStream.runDedupStream(spark, in, out, ck, Seq("event_id"))
    assert(q.awaitTermination(180000), "stream did not terminate within the timeout")

    val ids = spark.read.parquet(out).select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L)) // e1 emitted exactly once across batches
  }

  test("delta append sink: exactly-once across batches AND a whole-stream replay") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-delta-sink").toString
    val in = s"$dir/in"; val tbl = s"$dir/table"
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag").coalesce(1).write.parquet(in)
    Seq((3L, "c")).toDF("id", "tag").coalesce(1).write.mode("append").parquet(in)
    val q = EventStream.runDeltaAppendStream(spark, in, tbl, s"$dir/ck1",
      maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(180000), "stream did not terminate")
    val once = graft.sources.DeltaLog.read(spark, tbl).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(once == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // the operator accident the txn action exists for: re-run the
    // WHOLE stream with a FRESH checkpoint dir — batch ids restart at
    // 0, but the TABLE remembers the epochs and skips every one
    val q2 = EventStream.runDeltaAppendStream(spark, in, tbl, s"$dir/ck2",
      maxFilesPerTrigger = Some(1))
    assert(q2.awaitTermination(180000), "replayed stream did not terminate")
    assert(graft.sources.DeltaLog.read(spark, tbl).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == once,
      "whole-stream replay must not duplicate rows")
  }

  test("iceberg append sink: exactly-once across batches AND a whole-stream replay") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ice-sink").toString
    val in = s"$dir/in"; val tbl = s"$dir/table"
    Seq((1L, "a"), (2L, "b")).toDF("id", "tag").coalesce(1).write.parquet(in)
    Seq((3L, "c")).toDF("id", "tag").coalesce(1).write.mode("append").parquet(in)
    val q = EventStream.runIcebergAppendStream(spark, in, tbl, s"$dir/ck1",
      maxFilesPerTrigger = Some(1))
    assert(q.awaitTermination(180000), "stream did not terminate")
    val once = graft.sources.IcebergTable.read(spark, tbl).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(once == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // fresh checkpoint dir -> batch ids restart at 0, but the snapshot
    // SUMMARY remembers the epochs and absorbs every replayed batch
    val q2 = EventStream.runIcebergAppendStream(spark, in, tbl, s"$dir/ck2",
      maxFilesPerTrigger = Some(1))
    assert(q2.awaitTermination(180000), "replayed stream did not terminate")
    assert(graft.sources.IcebergTable.read(spark, tbl).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq == once,
      "whole-stream replay must not duplicate rows")
  }

  test("iceberg streaming SOURCE: replicate resumes after a mid-stream kill, row-equal to the batch poll") {
    import spark.implicits._
    import graft.sources.IcebergTable
    val dir = Files.createTempDirectory("graft-ice-repl").toString
    val src = s"$dir/src"; val dst = s"$dir/dst"
    IcebergTable.append(spark, src,
      (0 until 20).map(i => (i.toLong, "a")).toDF("id", "tag"))
    IcebergTable.append(spark, src,
      (20 until 40).map(i => (i.toLong, "b")).toDF("id", "tag").repartition(3))
    // a maintenance pass between appends: contributes NO rows — a
    // replica double-reading after compaction would be the bug
    IcebergTable.rewriteDataFiles(spark, src, minFileSizeBytes = Long.MaxValue)
    IcebergTable.append(spark, src,
      (40 until 60).map(i => (i.toLong, "c")).toDF("id", "tag"))
    // KILL after two batches — the restart must resume from the
    // summary-stamped cursor, not re-read or skip
    assert(IcebergTable.replicate(spark, src, dst, maxBatches = 2) == 2)
    assert(IcebergTable.read(spark, dst).count() == 40)
    assert(IcebergTable.replicate(spark, src, dst) == 1)
    val got = IcebergTable.read(spark, dst).select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 60L))
    // idle poll: nothing new -> zero batches, zero commits
    assert(IcebergTable.replicate(spark, src, dst) == 0)
    // row-equal to the one-shot batch poll over the full range
    val ids = IcebergTable.snapshotsTable(spark, src)
      .filter(col("operation") === "append")
      .orderBy("lineage").select("snapshot_id").as[Long].collect()
    val batchPoll = IcebergTable.read(spark, src, Some(ids.head))
      .unionByName(IcebergTable.readAppendsBetween(spark, src, ids.head, ids.last))
      .select("id").as[Long].collect().sorted
    assert(batchPoll.toSeq == got.toSeq)
    // a row-removing source snapshot refuses loudly
    IcebergTable.deleteRowsDv(spark, src, col("id") === 0L)
    IcebergTable.append(spark, src, Seq((100L, "d")).toDF("id", "tag"))
    assert(intercept[IllegalArgumentException](
      IcebergTable.replicate(spark, src, dst))
      .getMessage.contains("append-only"))
  }

  test("checkpoint restart: sink killed mid-run resumes and converges exactly once") {
    val dir = Files.createTempDirectory("graft-restart").toString
    val in = s"$dir/in"; val tgt = s"$dir/target"; val ck = s"$dir/ck"
    import spark.implicits._
    // three files -> three micro-batches (maxFilesPerTrigger = 1)
    Seq((1L, "a", 100L), (2L, "b", 100L)).toDF("k", "s", "ver")
      .coalesce(1).write.parquet(in)
    Seq((1L, "a2", 200L), (3L, "c", 50L)).toDF("k", "s", "ver")
      .coalesce(1).write.mode("append").parquet(in)
    Seq((2L, "b0", 50L), (4L, "d", 10L)).toDF("k", "s", "ver") // k=2 OLDER -> loses LWW
      .coalesce(1).write.mode("append").parquet(in)

    // kill as soon as the first micro-batch commits — with batches
    // still pending, so the restart genuinely resumes mid-stream
    val q1 = EventStream.runUpsertSink(spark, in, tgt, ck, Seq("k"), "ver",
      maxFilesPerTrigger = Some(1))
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (q1.recentProgress.isEmpty && q1.isActive && System.nanoTime() < deadline)
      Thread.sleep(25)
    q1.stop()
    assert(q1.awaitTermination(120000), "stream did not terminate within the timeout")

    // resume from the same checkpoint: committed batches must NOT
    // re-apply (file-source offsets are checkpointed), pending ones run
    val q2 = EventStream.runUpsertSink(spark, in, tgt, ck, Seq("k"), "ver",
      maxFilesPerTrigger = Some(1))
    assert(q2.awaitTermination(180000), "stream did not terminate within the timeout")

    val out = spark.read.parquet(tgt).collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("s"), r.getAs[Long]("ver")))
    assert(out.map(_._1).distinct.length == out.length, s"duplicate keys in $out")
    assert(out.toSet == Set((1L, "a2", 200L), (2L, "b", 100L), (3L, "c", 50L), (4L, "d", 10L)))
  }
}
