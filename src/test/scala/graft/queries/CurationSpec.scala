package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-4 corpus-curation operators: repetition gate, benchmark
  * contamination, span-level dedup, BM25 retrieval. Correctness is the
  * DuckDB oracle's job (hash-match at sf0.01); these tests pin the
  * SEMANTIC invariants and the plan shapes the 100 TB posture relies
  * on, on the sf0.001 testdata.
  */
class CurationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("a4 exact-percentile guard: trips fast on an oversized group, names it, prescribes a6") {
    import spark.implicits._
    val df = (1 to 100).map(i => (if (i <= 80) "hot" else "cold", i.toDouble))
      .toDF("grp", "v")
    // under the threshold: no-op
    CoreQueries.requireGroupsFitExactPercentile(df, Seq("grp"), maxGroupRows = 80)
    // over it: fails FAST (before any value buffering), naming the hot
    // group and pointing at the constant-memory sketch path
    val e = intercept[IllegalStateException] {
      CoreQueries.requireGroupsFitExactPercentile(df, Seq("grp"), maxGroupRows = 50)
    }
    assert(e.getMessage.contains("grp=hot"), e.getMessage)
    assert(e.getMessage.contains("80 values"), e.getMessage)
    assert(e.getMessage.contains("approx_percentile"), e.getMessage)
  }

  test("x_bpe_merges: greedy-by-frequency with deterministic ties on a hand-checked corpus") {
    import spark.implicits._
    // banana+bandana: adjacent pairs tally 'a n':4, 'n a':3, 'b a':2,
    // 'n d':1, 'd a':1 -> the first learned merge MUST be ('a n', 4)
    val df = Seq((1L, "banana bandana", "en", "t", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpe").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = ExtQueries.xBpeMerges(spark, tmp).collect()
    assert(rows.length == 5)
    assert(rows.head.getAs[String]("pair") == "a n", rows.head.toString)
    assert(rows.head.getAs[String]("merged") == "an")
    assert(rows.head.getAs[Long]("cnt") == 4L)
    // every merge is the pair with the space removed, and no merge repeats
    rows.foreach(r => assert(
      r.getAs[String]("merged") == r.getAs[String]("pair").replace(" ", "")))
    assert(rows.map(_.getAs[String]("pair")).distinct.length == 5)
  }

  test("x_reshard_rendezvous: growing N->N+1 moves only docs won by the NEW shard, ~1/(N+1) of corpus") {
    val rows = ExtQueries.xReshardRendezvous(spark, dir).collect()
    assert(rows.nonEmpty)
    val moved = rows.filter(_.getAs[Boolean]("moved"))
    // the defining rendezvous property: an existing doc only moves
    // when the ADDED shard out-weighs its old winner — never between
    // surviving shards (a mod-N rule fails exactly this)
    moved.foreach(r => assert(r.getAs[Long]("shard_after") == 8L, r.toString))
    // and the movement fraction is ~1/9, nowhere near mod-N's ~8/9
    val frac = moved.length.toDouble / rows.length
    assert(frac < 0.25, s"moved fraction $frac — rendezvous should move ~11%")
  }

  test("x_repetition: signals are in range and the gate is non-degenerate") {
    val rows = ExtQueries.xRepetition(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dup = r.getAs[Double]("dup_bigram_frac")
      val top = r.getAs[Double]("top_token_frac")
      assert(dup >= 0.0 && dup < 1.0, s"dup_bigram_frac out of range: $dup")
      // every non-empty doc has a mode token, so (0, 1]
      assert(top > 0.0 && top <= 1.0, s"top_token_frac out of range: $top")
    }
    val keeps = rows.count(_.getAs[String]("keep") == "Y")
    assert(keeps > 0 && keeps < rows.length,
      s"gate degenerate: $keeps/${rows.length} keep")
  }

  test("x_repetition: a hammered-token doc is dropped, a diverse doc kept") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam spam spam spam spam", "en", "t", 50L),
      (2L, "one two three four five six seven eight nine ten", "en", "t", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-rep").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = ExtQueries.xRepetition(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("keep")).toMap
    assert(out(1L) == "N" && out(2L) == "Y", out.toString)
  }

  test("x_contamination: benchmark docs are excluded and overlap is bounded by gram count") {
    val rows = ExtQueries.xContamination(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_grams"), r.toString)
    }
    // the output is the TRAIN+VALID side only: strictly fewer rows than
    // the corpus (the bench slice is ~10%), never zero
    val corpus = graft.Tables.documents(spark, dir).count()
    assert(rows.length < corpus && rows.length > 0, s"${rows.length} vs $corpus")
  }

  test("x_contamination: a verbatim copy of a benchmark doc is fully contaminated") {
    import spark.implicits._
    // doc_id buckets (shingleHash(id) % 100): need one id >= 90 and a
    // copy < 90. Probe the bucket rule directly to pick ids.
    val bucketOf = graft.ext.TextOps.shingleHash(col("v").cast("string")) % 100
    val ids = spark.range(0, 200).select(col("id").as("v"), bucketOf.as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val benchId = ids.collectFirst { case (id, b) if b >= 90 => id }.get
    val trainId = ids.collectFirst { case (id, b) if b < 80 => id }.get
    val text = "alpha beta gamma delta epsilon zeta eta theta"
    val df = Seq(
      (benchId, text, "en", "t", 8L),
      (trainId, text, "en", "t", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-cont").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = ExtQueries.xContamination(spark, tmp).collect()
    assert(out.length == 1 && out.head.getAs[Long]("doc_id") == trainId)
    assert(out.head.getAs[Long]("n_overlap") == out.head.getAs[Long]("n_grams"))
    assert(out.head.getAs[String]("contaminated") == "Y")
  }

  test("x_dedup_substring: shared 8-token span flags both docs, unique text stays clean") {
    import spark.implicits._
    val span = "one two three four five six seven eight"
    val df = Seq(
      (1L, s"intro words here then $span", "en", "t", 1L),
      (2L, s"$span and a different tail entirely", "en", "t", 1L),
      (3L, "totally unrelated content with no copied span at all", "en", "t", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-span").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = ExtQueries.xDedupSubstring(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dup_windows")).toMap
    assert(out(1L) > 0 && out(2L) > 0, out.toString)
    assert(out(3L) == 0, out.toString)
  }

  test("x_countmin: CMS invariant — estimate never undercounts; collisions overcount") {
    val rows = ExtQueries.xCountMin(spark, dir).collect()
    assert(rows.nonEmpty)
    // est >= cnt for EVERY token: each token's own occurrences land in
    // all D of its counters, so the min over rows still contains them
    rows.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("cnt"),
        s"undercount at ${r.getAs[String]("token")}: $r")
      assert(r.getAs[Long]("overcount") == r.getAs[Long]("est") - r.getAs[Long]("cnt"))
    }
    // W=8 < vocabulary size forces collisions: the sketch must be a
    // genuine approximation on this corpus, not an exact pass-through
    assert(rows.exists(_.getAs[Long]("overcount") > 0), rows.mkString("\n"))
  }

  test("x_semantic_dedup: kept set is tau-independent per cell; every drop is justified") {
    import graft.Tables
    import graft.ext.Similarity
    val out = ExtQueries.xSemanticDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") -> (r.getAs[Long]("cell"), r.getAs[String]("keep")))
      .toMap
    val emb = Tables.embeddings(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")).toMap
    def cos(a: scala.collection.Seq[Float], b: scala.collection.Seq[Float]): Double = {
      def dot(x: scala.collection.Seq[Float], y: scala.collection.Seq[Float]) =
        x.iterator.zip(y.iterator).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    }
    val byCell = out.groupBy(_._2._1)
    byCell.foreach { case (_, members) =>
      val kept = members.collect { case (id, (_, "Y")) => id }.toSeq.sorted
      // greedy keep-lowest invariant 1: no two kept cell members are
      // tau-close (the higher-id one would have been dropped)
      for (i <- kept.indices; j <- 0 until i)
        assert(cos(emb(kept(j)), emb(kept(i))) < 0.25,
          s"kept pair ${kept(j)}/${kept(i)} is tau-close")
      // invariant 2: every dropped member has SOME lower-id cell
      // member at >= tau (the justification for dropping it)
      val ids = members.keys.toSeq.sorted
      members.collect { case (id, (_, "N")) => id }.foreach { d =>
        assert(ids.filter(_ < d).exists(o => cos(emb(o), emb(d)) >= 0.25),
          s"dropped $d has no tau-close lower-id neighbor")
      }
    }
    assert(out.values.exists(_._2 == "N") && out.values.exists(_._2 == "Y"))
  }

  test("x_countmin: counters are mergeable — union sketch == summed part sketches") {
    // the property that makes CMS a distributed sketch: counters over
    // the whole relation equal the element-wise sum of counters built
    // over any disjoint partition of it (this is exactly what
    // Catalyst's partial aggregation exploits on stream ingestion)
    import spark.implicits._
    val vocab = (1 to 40).map(i => (s"tok$i", (i * 3 + 1).toLong)).toDF("token", "cnt")
    val whole = ExtQueries.cmsCounters(vocab)
    val partA = ExtQueries.cmsCounters(vocab.filter(col("cnt") % 2 === 0))
    val partB = ExtQueries.cmsCounters(vocab.filter(col("cnt") % 2 =!= 0))
    val merged = partA.unionByName(partB)
      .groupBy("r", "bucket").agg(sum(col("c")).as("c"))
    assert(whole.exceptAll(merged).isEmpty && merged.exceptAll(whole).isEmpty)
  }

  test("x_bm25: scores ranked desc, ties broken by doc_id, k bounded") {
    val rows = ExtQueries.xBm25(spark, dir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, scores.toSeq)
    // a fixed query over the shared vocabulary must match something
    assert(scores.head > 0.0)
  }

  test("x_bm25: top-k is TakeOrdered, stats broadcast — no global sort, no token shuffle") {
    val p = ExtQueries.xBm25(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Generate explode"), p) // df comes from the 1-row agg, not an explode
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("x_mixture_sample: per-source keep counts track the 1/3 : 2/3 : 1 target rates") {
    val rows = ExtQueries.xMixtureSample(spark, dir).collect()
    val bySrc = rows.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    // weight class w = (N % 3) + 1 → rate w/3; sources have 25 docs each.
    // Hash acceptance is binomial around 25·w/3, so assert ordering +
    // the exact rate-1 class (threshold 10000 keeps everything).
    def classAvg(wm1: Int): Double = {
      val xs = bySrc.collect { case (s, n) if s.drop(3).toInt % 3 == wm1 => n }
      xs.sum.toDouble / xs.size
    }
    assert(classAvg(2) == 25.0, s"rate-1 class must keep all: $bySrc")
    assert(classAvg(0) < classAvg(1) && classAvg(1) < classAvg(2), bySrc.toString)
  }

  test("x_mixture_sample: corpus is never shuffled — no exchange on doc-sized data") {
    val p = ExtQueries.xMixtureSample(spark, dir).queryExecution.executedPlan.toString
    // the doc side joins the 20-row rate table via broadcast; the only
    // hash exchanges are the source-cardinality aggregates
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("x_pack_sequences: packing is gap-free and dense within each source") {
    val rows = ExtQueries.xPackSequences(spark, dir).collect()
    rows.groupBy(_.getAs[String]("source")).foreach { case (src, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("doc_id"))
      var expect = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("cum_before") == expect, s"$src gap at $r")
        assert(r.getAs[Long]("seq_id") == expect / 256, r.toString)
        assert(r.getAs[Long]("seq_off") == expect % 256, r.toString)
        expect += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("x_pack_sequences: window is per-source — no single-partition exchange") {
    val p = ExtQueries.xPackSequences(spark, dir).queryExecution.executedPlan.toString
    // the final presentation orderBy is a range exchange; the WINDOW
    // itself must partition by source, never collapse to one partition
    assert(p.contains("hashpartitioning(source"), p)
  }

  test("x_contamination / x_dedup_substring: shuffles carry 8-byte hashes, never gram text") {
    for (name <- Seq("x_contamination", "x_dedup_substring")) {
      val plan = graft.SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      // every Exchange's output should be hash/id columns — the gram/
      // win string is consumed map-side by shingleHash and never
      // appears in an exchange's partitioning expressions
      assert(!"hashpartitioning\\((gram|win)".r.findFirstIn(plan).isDefined, plan)
    }
  }

  test("x_lm_score: scores are valid frequencies and rare-token docs rank below common-token docs") {
    val rows = ExtQueries.xLmScore(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Double]("avg_freq")
      assert(f > 0.0 && f <= 1.0, s"avg_freq out of range: $r")
      // every token occurs at least once (itself), so cnt_sum >= n_tokens
      assert(r.getAs[Long]("cnt_sum") >= r.getAs[Long]("n_tokens"), r.toString)
    }
  }

  test("x_lm_score: a doc of corpus-unique gibberish scores strictly below a doc of corpus-common words") {
    import spark.implicits._
    val common = Seq.fill(20)("alpha beta gamma delta").mkString(" ")
    val df = (Seq(
      (1L, common, "en", "t", 100L),
      (2L, "zzqx1 zzqx2 zzqx3 zzqx4 zzqx5 zzqx6 zzqx7 zzqx8", "en", "t", 100L)) ++
      (3L to 10L).map(i => (i, common, "en", "t", 100L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = ExtQueries.xLmScore(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_freq")).toMap
    assert(out(2L) < out(1L), out.toString)
  }

  test("x_lm_score: vocabulary joins broadcast — the corpus text is never shuffled") {
    val p = ExtQueries.xLmScore(spark, dir).queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("x_pagerank: no cartesian blowup, no global-sort window in the iteration") {
    val p = ExtQueries.xPagerank(spark, dir).queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p) // rank state is pure join+agg, never a window
  }

  test("x_ann_delete: tombstoned ids can never be served; churn equals top-1 erasures") {
    // the erasure contract: no served row may carry a deleted id —
    // this is the GDPR-shaped assertion, stronger than hash-matching
    // one fixture. And the two churn columns are equal BY THEOREM
    // (dropping a non-top candidate cannot change top-1); published
    // separately because their divergence at real scale flags a query
    // whose candidate set emptied — the spec pins the theorem so a
    // refactor that breaks it (e.g. re-ranking after a lossy rewrite)
    // fails here, not in production
    val served = ExtQueries.xAnnDelete(spark, dir).collect()
    assert(served.nonEmpty)
    assert(served.forall(r => r.getAs[Long]("vec_id") % 11 != 3),
      served.filter(r => r.getAs[Long]("vec_id") % 11 == 3).mkString(","))
    val churn = ExtQueries.xAnnDeleteChurn(spark, dir).collect().head
    assert(churn.getAs[Long]("n_changed") == churn.getAs[Long]("n_top1_tombstoned"),
      churn.toString)
  }

  test("NB classifier learns when the tokens carry the label (crafted corpus)") {
    import spark.implicits._
    // the testdata corpus is UNLEARNABLE by construction (one shared
    // vocabulary across langs — x_nb_eval measures accuracy below the
    // majority baseline and that verdict is the product). This fixture
    // proves the identical train->store->score->measure pipeline
    // learns for real the moment signal exists: en docs speak
    // {the,a,fast}, others {der,das,und}, with one shared noise token
    val docs = (0L until 60L).map { i =>
      val en = i % 2 == 0
      val text = if (en) "the a fast the noise" else "der das und der noise"
      (i, text, if (en) "en" else "de", s"src${i % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-nb").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val e = ExtQueries.xNbEval(spark, tmp).collect().head
    assert(e.getAs[Long]("n_eval") == 12L, e.toString)
    val acc = e.getAs[Double]("accuracy")
    assert(acc >= 0.9, s"expected >=0.9 held-out accuracy on separable tokens, got $acc")
    // and the stored model itself ranks the class markers correctly:
    // positive llr for en markers, negative for de markers
    val m = ExtQueries.xNbModel(spark, tmp).collect()
      .map(r => r.getAs[String]("token") -> r.getAs[Long]("llr_q")).toMap
    assert(m("the") > 0 && m("fast") > 0, m.toString)
    assert(m("der") < 0 && m("und") < 0, m.toString)
  }

  test("LR gate distillation learns the gate on a separable corpus; class weights balance") {
    import spark.implicits._
    // on the testdata corpus the gate keeps ~96% and the honest eval
    // reads drop_recall 1.0 / drop_precision ~0.36 (the measurement is
    // the product). This fixture is BALANCED and separable — half the
    // docs are one token repeated 40x (uniq 0.025, far under the 0.3
    // gate), half are 20 distinct tokens — so the distilled scorer
    // must recover the gate nearly perfectly or the machinery is wrong
    val diverse = (1 to 20).map(i => s"w$i").mkString(" ")
    val junk = Seq.fill(40)("junk").mkString(" ")
    val docs = (0L until 60L).map { i =>
      val good = i % 2 == 0
      val text = if (good) diverse else junk
      (i, text, "en", s"src${i % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lr").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val e = ExtQueries.xLrEval(spark, tmp).collect().head
    assert(e.getAs[Long]("n_eval") == 12L, e.toString)
    assert(e.getAs[Double]("accuracy") >= 0.9, e.toString)
    assert(e.getAs[Double]("drop_recall") >= 0.9, e.toString)
    assert(e.getAs[Double]("drop_precision") >= 0.9, e.toString)
    // balanced classes -> both class weights collapse to 1
    val m = ExtQueries.xLrModel(spark, tmp).collect().head
    assert(m.getAs[Long]("cw_pos") == 1L && m.getAs[Long]("cw_neg") == 1L, m.toString)
    // and the learned separator leans on the diversity feature the
    // gate actually thresholds: positive weight on uniq-ratio
    assert(m.getAs[Long]("w2") > 0, m.toString)
  }

  test("LR operating curve: recall monotone nondecreasing, anchored at 1.0, counts consistent") {
    import spark.implicits._
    // same separable fixture as the distillation test: the curve's
    // STRUCTURE is what this pins — the threshold grid covers the
    // score range, the predicted-drop set grows with i (so recall is
    // monotone and ends at 1.0), and hit counts can never exceed
    // predicted or true drops. The interior trade is the product.
    val diverse = (1 to 20).map(i => s"w$i").mkString(" ")
    val junk = Seq.fill(40)("junk").mkString(" ")
    val docs = (0L until 60L).map { i =>
      (i, if (i % 2 == 0) diverse else junk, "en", s"src${i % 3}",
        (if (i % 2 == 0) diverse else junk).length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lrpr").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = ExtQueries.xLrPrCurve(spark, tmp).collect()
    assert(rows.length == 11, rows.mkString(","))
    val recalls = rows.map(_.getAs[Double]("drop_recall"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"drop_recall not monotone: ${recalls.mkString(",")}")
    assert(recalls.last == 1.0, s"i=10 (threshold=smax) must catch every drop: ${recalls.last}")
    rows.foreach { r =>
      val (hit, pred, truth) = (r.getAs[Long]("n_drop_hit"),
        r.getAs[Long]("n_pred_drop"), r.getAs[Long]("n_drop_true"))
      assert(hit <= pred && hit <= truth, r.toString)
    }
    // thresholds span the score range and are strictly ordered unless
    // the range collapses
    val thr = rows.map(_.getAs[Long]("threshold"))
    assert(thr.zip(thr.tail).forall { case (a, b) => a <= b }, thr.mkString(","))
  }

  test("x_encoding_quality detects mojibake, control chars and U+FFFD on crafted docs") {
    import spark.implicits._
    // the testdata corpus is clean ASCII (every source reads zero —
    // the honest answer); this fixture plants each defect class in
    // its own source and asserts the audit isolates them
    val docs = Seq(
      (0L, "clean text here ok", "en", "clean", 18L),
      (1L, "bad � twice � here", "en", "repl", 20L),
      (2L, "ctrl\u0001and\u0002chars", "en", "ctrl", 14L),
      // classic UTF-8-as-Latin-1: 'Ã©' (é) and 'â€™' (right quote)
      (3L, "cafÃ© and â€™quoted", "en", "moji", 20L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-enc").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = ExtQueries.xEncodingQuality(spark, tmp).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("clean").getAs[Long]("n_flagged") == 0L, rows("clean").toString)
    assert(rows("clean").getAs[Long]("bad_ppm") == 0L)
    assert(rows("repl").getAs[Long]("repl_chars") == 2L, rows("repl").toString)
    assert(rows("repl").getAs[Long]("n_flagged") == 1L)
    assert(rows("ctrl").getAs[Long]("ctrl_chars") == 2L, rows("ctrl").toString)
    assert(rows("moji").getAs[Long]("moji_hits") == 2L, rows("moji").toString)
    assert(rows("moji").getAs[Long]("bad_ppm") > 0L)
  }

  test("LR training refuses a single-class split (constant-function guard)") {
    import spark.implicits._
    val diverse = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = (0L until 30L).map(i =>
      (i, diverse, "en", "src0", diverse.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-lr1c").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      ExtQueries.xLrModel(spark, tmp).collect()
    }
    assert(e.getMessage.contains("single-class"), e.getMessage)
  }

  test("x_dsir_select enriches the target language when the tokens carry it (crafted corpus)") {
    import spark.implicits._
    // same separable fixture as the NB lifecycle test: on the real
    // testdata the llrs are noise and x_dsir_select's shares move only
    // by sampling noise (the documented null); here the density ratio
    // is real and importance resampling must concentrate the budget
    // on the target slice
    val docs = (0L until 60L).map { i =>
      val en = i % 2 == 0
      val text = if (en) "the a fast the noise" else "der das und der noise"
      (i, text, if (en) "en" else "de", s"src${i % 3}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = ExtQueries.xDsirSelect(spark, tmp).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_sel"), r.getAs[Double]("share_after"))).toMap
    // budget = 60/5 = 12 docs, all of it spent on the target slice
    assert(rows.values.map(_._2).sum == 12L, rows.toString)
    assert(rows("en")._3 >= 0.9, s"expected >=0.9 en share after selection, got $rows")
    // and before-shares still describe the unselected corpus
    assert(rows("en")._1 == 30L && rows("de")._1 == 30L, rows.toString)
  }

  test("x_token_budget: scarce sources repeat more and waste more (crafted 100:1 corpus)") {
    import spark.implicits._
    // 100:1 token skew: temperature allocation forces the scarce
    // source through many epochs, where the 3/4-decay makes later
    // passes worth geometrically less — utilization must fall exactly
    // where repeats concentrate, and the epoch clamp must engage
    val docs = (0L until 101L).map { i =>
      val big = i < 100
      val text = "tok " * 9 + "tok" // 10 tokens
      (i, text, "en", if (big) "big" else "small", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-budget").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = ExtQueries.xTokenBudget(spark, tmp).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val (big, small) = (rows("big"), rows("small"))
    assert(small.getAs[Double]("epochs") > big.getAs[Double]("epochs"))
    assert(small.getAs[Double]("utilization") < big.getAs[Double]("utilization"))
    // scarce source: requested = ~2020*0.0909 tokens over n=10 → clamp
    assert(small.getAs[Long]("full_epochs") == 12L, small.toString)
    rows.values.foreach { r =>
      assert(r.getAs[Double]("effective") <= r.getAs[Long]("requested").toDouble, r.toString)
    }
    // floor-division allocation never overspends the budget
    val total = rows.values.map(_.getAs[Long]("n_tokens")).sum
    assert(rows.values.map(_.getAs[Long]("requested")).sum <= 2L * total)
  }

  test("x_pca_power finds a planted dominant direction (crafted anisotropic fixture)") {
    import spark.implicits._
    // the real embeddings are isotropic noise (measured EVR ~= 1.2/D,
    // the honest reading); this fixture plants variance on dim 0 and
    // the power iteration must recover it: loadings concentrate on
    // dim 0 and EVR reads near 1
    val dim = 64
    val vecs = (0L until 40L).map { i =>
      val a = if (i % 2 == 0) 1.0f else -1.0f
      val emb = Array.tabulate(dim)(j =>
        if (j == 0) a else 0.001f * (((i + j) % 7).toFloat - 3.0f))
      (i, emb, (i % 2).toInt)
    }.toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("graft-pca").toString
    vecs.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = ExtQueries.xPcaPower(spark, tmp).collect().sortBy(_.getAs[Long]("i"))
    assert(rows.length == dim)
    // dominant loading on the planted dimension (unit vector scale 1e6)
    assert(math.abs(rows(0).getAs[Long]("load_q")) > 900000L, rows(0).toString)
    assert(rows.drop(1).forall(r => math.abs(r.getAs[Long]("load_q")) < 200000L))
    // variance concentrates: explained-variance ratio near 1
    assert(rows(0).getAs[Double]("evr") > 0.9, rows(0).toString)
    // and the component is (close to) unit norm in quantized units
    val n2 = rows.map(r => { val l = r.getAs[Long]("load_q"); l * l }).sum
    assert(math.abs(n2 - 1000000000000L) < 5000000000L, n2.toString)
  }

  test("x_zipf_fit recovers the exponent on an exact-Zipf fixture; synthetic corpus reads non-natural") {
    import spark.implicits._
    // crafted corpus with cnt(rank r) = floor(2000/r): a true Zipf
    // law with exponent -1. The OLS over (ln rank, ln cnt) must
    // recover slope ~ -1 with a near-perfect fit...
    val words = (1 to 30).flatMap(r => Seq.fill(2000 / r)(s"w$r"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    words.grouped(200).zipWithIndex
      .map { case (g, i) => (i.toLong, g.mkString(" ")) }.toSeq
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val fit = ExtQueries.xZipfFit(spark, tmp).collect().head
    assert(math.abs(fit.getAs[Double]("slope") + 1.0) < 0.03, fit.toString)
    assert(fit.getAs[Double]("r2") > 0.99, fit.toString)
    // ...while the uniform synthetic corpus honestly reads
    // non-natural: shallow slope, poor fit
    val real = ExtQueries.xZipfFit(spark, dir).collect().head
    assert(real.getAs[Double]("slope") > -0.5, real.toString)
    assert(real.getAs[Double]("r2") < 0.5, real.toString)
    // entropy agrees: the skewed Zipf fixture sits well below the
    // uniform ceiling, the synthetic corpus reads ~uniform (norm ~ 1)
    val hz = ExtQueries.xUnigramEntropy(spark, tmp).collect().head
    val hr = ExtQueries.xUnigramEntropy(spark, dir).collect().head
    assert(hz.getAs[Long]("hnorm_q") < 9000L, hz.toString)
    assert(hr.getAs[Long]("hnorm_q") > 9800L, hr.toString)
    // degenerate single-token vocabulary: both fits refuse loudly
    // instead of silently emitting engine-dependent NaN/Inf
    val deg = java.nio.file.Files.createTempDirectory("graft-zipf-deg").toString
    Seq((0L, "same same same")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$deg/documents.parquet")
    val e1 = intercept[IllegalArgumentException](ExtQueries.xZipfFit(spark, deg).collect())
    val e2 = intercept[IllegalArgumentException](ExtQueries.xUnigramEntropy(spark, deg).collect())
    assert(e1.getMessage.contains("degenerate") && e2.getMessage.contains("degenerate"))
  }

  test("x_heaps_law: growing-vocab fixture reads beta ~ 1; saturated synthetic corpus reads beta ~ 0") {
    import spark.implicits._
    // each doc introduces exactly one never-seen token (plus one
    // shared token), so V(n) = n + 1 and the log-log slope must
    // recover beta ~ 1; the synthetic corpus saturates its vocab in
    // the first decile and must read beta ~ 0
    val tmp = java.nio.file.Files.createTempDirectory("graft-heaps").toString
    (0L until 200L).map(i => (i, s"shared tok$i"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val grow = ExtQueries.xHeapsLaw(spark, tmp).collect()
    assert(grow.length == 10)
    assert(math.abs(grow.head.getAs[Long]("beta_q") - 10000L) < 500L, grow.head.toString)
    val sat = ExtQueries.xHeapsLaw(spark, dir).collect().head
    assert(math.abs(sat.getAs[Long]("beta_q")) < 500L, sat.toString)
    // cumulative counts are monotone and end at the full corpus
    val vs = grow.map(_.getAs[Long]("vocab"))
    assert(vs.sameElements(vs.sorted) && vs.last == 201L)
  }

  test("x_datacard_diff: the release properties hold — zero curated dup pairs, retained <= 1") {
    // every LSH candidate pair lies inside one dedup component and
    // canonical keeps one doc per component, so the curated side MUST
    // read zero near-dup pairs and zero dup-doc rate; a non-zero
    // reading means the dedup stage broke. Retention never exceeds 1
    // (curation only removes).
    val rows = ExtQueries.xDatacardDiff(spark, dir).collect()
      .map(r => r.getAs[String]("metric") -> r).toMap
    assert(rows("04_near_dup_pairs").getAs[Double]("curated") == 0.0)
    assert(rows("05_dup_doc_rate").getAs[Double]("curated") == 0.0)
    rows.values.foreach { r =>
      assert(r.getAs[Double]("curated") <= r.getAs[Double]("raw"), r.toString)
    }
    // and the curated doc count agrees with the funnel's final stage
    val n4 = ExtQueries.xCurationFunnel(spark, dir).collect()
      .find(_.getAs[String]("stage") == "4_dedup_canonical").get.getAs[Long]("n_kept")
    assert(rows("01_n_docs").getAs[Double]("curated") == n4.toDouble)
  }

  test("x_retained_by_source: partitions the release — sums equal the card totals, retained <= 1") {
    val rows = ExtQueries.xRetainedBySource(spark, dir).collect()
    val diff = ExtQueries.xDatacardDiff(spark, dir).collect()
      .map(r => r.getAs[String]("metric") -> r).toMap
    assert(rows.map(_.getAs[Long]("n_raw")).sum.toDouble ==
      diff("01_n_docs").getAs[Double]("raw"))
    assert(rows.map(_.getAs[Long]("n_curated")).sum.toDouble ==
      diff("01_n_docs").getAs[Double]("curated"))
    rows.foreach(r => assert(r.getAs[Double]("retained") <= 1.0, r.toString))
  }

  test("PcaGramAgg one-pass buffer == declarative outer-product twin (same quantized longs)") {
    // cross-implementation parity law: the typed Aggregator the
    // queries actually run must produce bit-identical Gram sums to
    // the declarative flatten-transform build (which itself mirrors
    // the oracle's self-join CTE) — the chain that makes the one-pass
    // fast path provably exact
    val st = ExtQueries.pcaState(spark, dir)
    val twin = ExtQueries.pcaGramSums(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(st.sMap == twin)
    assert(st.n == spark.read.parquet(s"$dir/embeddings.parquet").count())
  }

  test("x_whiten_top removes the planted dominant direction (res << orig on the fixture)") {
    import spark.implicits._
    // same planted-anisotropy fixture as x_pca_power: variance lives
    // on dim 0. Removing mean + top component must collapse each
    // top-|projection| vector's norm² — residual under 5% of the
    // centered original — while on-component projections stay large
    val dim = 64
    val vecs = (0L until 40L).map { i =>
      val a = if (i % 2 == 0) 1.0f else -1.0f
      val emb = Array.tabulate(dim)(j =>
        if (j == 0) a else 0.001f * (((i + j) % 7).toFloat - 3.0f))
      (i, emb, (i % 2).toInt)
    }.toDF("vec_id", "embedding", "label")
    val tmp = java.nio.file.Files.createTempDirectory("graft-whiten").toString
    vecs.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    val rows = ExtQueries.xWhitenTop(spark, tmp).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val orig = r.getAs[Long]("orig_q")
      val res = r.getAs[Long]("res_q")
      // planted component carries ~all the energy: |t| ~ 1e6 (unit
      // projection in quantized units) and the residual collapses
      assert(math.abs(r.getAs[Long]("t_q")) > 900000L, r.toString)
      assert(res.toDouble < 0.05 * orig.toDouble, r.toString)
    }
  }

  test("x_pq_serve_agreement: rescoring can only help — rescored >= raw-ADC agreement") {
    // theorem: if the raw ADC top-1 equals the exact top-1, the exact
    // top-1 is inside the candidate cut, and the exact-cosine rescore
    // re-selects it; so column (b) dominates column (a) on any corpus.
    // A violation means the rescore stage lost a candidate (the exact
    // failure mode of a buggy fetch join)
    val r = ExtQueries.xPqServeAgreement(spark, dir).collect().head
    assert(r.getAs[Long]("n_rescored") >= r.getAs[Long]("n_adc_top1"), r.toString)
    assert(r.getAs[Long]("n_queries") == 24L, r.toString)
  }

  test("x_split: group-keyed assignment makes near-dup leakage structurally zero; naive rate near 1-sum(p^2)") {
    val asg = ExtQueries.xSplitAssign(spark, dir).collect()
    assert(asg.nonEmpty)
    // split is a pure function of doc_id, split_group of component
    asg.foreach { r =>
      val splits = Set("train", "val", "test")
      assert(splits(r.getAs[String]("split")) && splits(r.getAs[String]("split_group")), r.toString)
    }
    // every member of a component carries the SAME split_group (the
    // structural-leakage-zero property the leakage query publishes)
    asg.groupBy(_.getAs[Long]("component")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[String]("split_group")).distinct.length == 1)
    }
    // rough 8/1/1 shape on the naive rule (hash uniformity, loose band)
    val n = asg.length.toDouble
    val trainFrac = asg.count(_.getAs[String]("split") == "train") / n
    assert(trainFrac > 0.65 && trainFrac < 0.92, s"train fraction $trainFrac")
    val leak = ExtQueries.xSplitLeakage(spark, dir).collect().head
    assert(leak.getAs[Long]("n_cross_group") == 0L, leak.toString)
    assert(leak.getAs[Long]("n_pairs") > 0L)
    assert(leak.getAs[Long]("n_cross_naive") <= leak.getAs[Long]("n_pairs"))
  }

  test("x_hard_negatives: no negative is the anchor, its positive, or any same-component member") {
    val rows = ExtQueries.xHardNegatives(spark, dir).collect()
    assert(rows.nonEmpty)
    val comp = ExtQueries.xDedupComponents(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component")).toMap
    rows.foreach { r =>
      val a = r.getAs[Long]("anchor_id"); val n = r.getAs[Long]("neg_id")
      assert(n != a, r.toString)
      assert(n != r.getAs[Long]("pos_id"), s"positive mined as negative: $r")
      assert(comp.getOrElse(a, a) != comp.getOrElse(n, n),
        s"same-component false negative: $r")
    }
    // ranks are contiguous from 1 per anchor
    rows.groupBy(_.getAs[Long]("anchor_id")).foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("neg_rank")).sorted.sameElements(1L to rs.length))
    }
  }

  test("x_mixture_temperature: sqrt-temperature compresses source skew (crafted 100:1 corpus)") {
    import spark.implicits._
    // head source 400 docs, tail source 4: raw ratio 100x, alpha=0.5
    // target ratio must be sqrt(100) = 10x (the multilingual
    // rebalancing contract); the real corpus' uniform 250-doc sources
    // make temperature a documented no-op there, so the law needs a
    // skewed fixture
    val docs = ((1 to 400).map(i => (i.toLong, s"tok$i text", "en", "head", 10L)) ++
      (1 to 4).map(i => (400L + i, s"tok$i text", "en", "tail", 10L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-mixtemp").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = ExtQueries.xMixtureTemperature(spark, tmp).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val head = rows("head"); val tail = rows("tail")
    val rawRatio = head.getAs[Double]("p") / tail.getAs[Double]("p")
    val tempRatio = head.getAs[Double]("p_temp") / tail.getAs[Double]("p_temp")
    assert(math.abs(rawRatio - 100.0) < 1e-9, s"raw $rawRatio")
    assert(math.abs(tempRatio - 10.0) < 1e-3, s"temp $tempRatio")
    // the tail's acceptance rate rises relative to the head's
    assert(tail.getAs[Double]("rate") > head.getAs[Double]("rate"))
    // budgets sum to <= the budget (floor never overshoots)
    assert(rows.values.map(_.getAs[Long]("target_n")).sum <= 1000L)
  }

  test("serveCurationGate: per-doc flags equal the three batch gates' own decisions") {
    val gate = ExtQueries.serveCurationGate(spark, dir,
      graft.Tables.documents(spark, dir)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val q = ExtQueries.queries("x_quality_filter")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("keep") == "Y")).toMap
    val rr = ExtQueries.queries("x_repetition")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("keep") == "Y")).toMap
    // contamination relation covers only bucket<90 docs; bench-bucket
    // docs must gate to ck=false (the eval set is never trained on)
    val c = ExtQueries.queries("x_contamination")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[String]("contaminated") == "N")).toMap
    assert(gate.nonEmpty && gate.size == q.size)
    gate.foreach { case (id, r) =>
      assert(r.getAs[Boolean]("qk") == q(id), s"qk mismatch doc $id")
      assert(r.getAs[Boolean]("rk") == rr(id), s"rk mismatch doc $id")
      assert(r.getAs[Boolean]("ck") == c.getOrElse(id, false), s"ck mismatch doc $id")
      val fused = r.getAs[Boolean]("qk") && r.getAs[Boolean]("rk") && r.getAs[Boolean]("ck")
      assert((r.getAs[String]("keep") == "Y") == fused)
    }
  }

  test("x_bpe_drift: unseen delta words surface as OOV; the real corpus reads no-drift") {
    import spark.implicits._
    // crafted corpus: the snapshot (doc_id % 10 != 0) trains the
    // tokenizer; the delta doc carries two words the snapshot never
    // saw — they MUST surface as OOV, not silently tokenize
    val df = Seq(
      (1L, "alpha beta alpha beta gamma", "en", "t", 27L),
      (2L, "alpha beta gamma alpha", "en", "t", 22L),
      (10L, "alpha zzzunseen qqqunseen", "en", "t", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft-bpe-drift").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val crafted = ExtQueries.xBpeDrift(spark, tmp).collect()
    assert(crafted.length == 1)
    assert(crafted.head.getAs[Long]("n_words") == 3L)
    assert(crafted.head.getAs[Long]("n_oov") == 2L, crafted.head.toString)
    // matched-word fertility still reports over the in-vocab word
    assert(crafted.head.getAs[Double]("fertility_delta") > 0.0)
    // the real corpus draws delta and snapshot from one vocabulary:
    // the honest reading is zero OOV and drift near zero
    val real = ExtQueries.xBpeDrift(spark, dir).collect()
    assert(real.nonEmpty)
    real.foreach { r =>
      assert(r.getAs[Double]("oov_rate") == 0.0, r.toString)
      assert(math.abs(r.getAs[Double]("drift")) < 0.3, r.toString)
    }
  }

  test("x_containment: injected prefix copies surface at containment 1.0 where jaccard misses") {
    val rows = ExtQueries.xContainment(spark, dir).collect()
    // every sample doc at doc_id % 15 == 0 with >= 3 tokens contributed
    // a half-length prefix copy at id + 1e9; the prefix property makes
    // its shingle set a strict subset of the source's, so the pair MUST
    // appear at containment exactly 1.0
    val injected = rows.filter(_.getAs[Long]("doc_b") >= 1000000000L)
      .filter(r => r.getAs[Long]("doc_b") - 1000000000L == r.getAs[Long]("doc_a"))
    assert(injected.nonEmpty, "no injected (source, prefix-copy) pairs surfaced")
    injected.foreach { r =>
      assert(r.getAs[Double]("containment") == 1.0, r.toString)
      // the class the query exists for: symmetric jaccard stays below
      // the near-dup threshold on the same pair
      assert(r.getAs[Double]("jaccard") < 0.8, r.toString)
    }
    // containment dominates jaccard on EVERY pair (min <= union)
    rows.foreach(r =>
      assert(r.getAs[Double]("containment") >= r.getAs[Double]("jaccard"), r.toString))
  }

  test("x_containment: df-capped candidate generation keeps rare-shingle pairs, drops all-boilerplate pairs") {
    import spark.implicits._
    // the r11 reshape's semantic trade, pinned in both directions: a
    // contained pair sharing RARE shingles surfaces; a pair whose
    // EVERY shared shingle is corpus boilerplate (df > ContainDfCap)
    // generates no candidate and is excluded — the pairs a
    // containment audit should not surface anyway. doc_ids are % 3 ==
    // 0 (the sample) and % 15 != 0 (no injected copies muddying it).
    val boiler = "common words repeated all over this corpus boilerplate chunk"
    // 20 docs made ENTIRELY of the same boilerplate (df = 20 > 16 for
    // every shingle), so e.g. (3, 6) share only high-df shingles
    val boilerDocs = (0 until 20).map(i => (3L + 3 * i, boiler))
    // one rare containment pair: doc 63's text contained in doc 66's
    val rareA = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = (boilerDocs ++ Seq((63L, rareA), (66L, rareA + " iota kappa lambda mu")))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("src0").as("source"), length(col("text")).cast("long").as("n_chars"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-contain").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = ExtQueries.xContainment(spark, tmp).collect()
    // the rare pair is found at containment 1.0 (subset by construction)
    val rare = rows.filter(r => r.getAs[Long]("doc_a") == 63L && r.getAs[Long]("doc_b") == 66L)
    assert(rare.length == 1, rows.mkString(","))
    assert(rare.head.getAs[Double]("containment") == 1.0, rare.head.toString)
    // identical boilerplate docs have containment 1.0 — but every
    // shared shingle has df 20 > cap, so NO boiler pair surfaces
    val boilerPairs = rows.filter(r => r.getAs[Long]("doc_a") != 63L)
    assert(boilerPairs.isEmpty,
      s"all-boilerplate pairs must be excluded by the df cap: ${boilerPairs.mkString(",")}")
    // and the honesty audit MEASURES exactly that trade. Exact truth
    // at containment >= 0.8 on this fixture: C(20,2) = 190
    // boiler-boiler pairs, 4 injected half-prefix copies (of the
    // % 15 boilers) x 20 boilers = 80 copy-boiler pairs, C(4,2) = 6
    // copy-copy pairs, + the rare pair = 277. Every boiler shingle
    // has df 20 or 24 > cap, so the capped blocking finds ONLY the
    // rare pair and the reported recall is the honest fraction.
    val q = ExtQueries.xContainmentQuality(spark, tmp).collect().head
    assert(q.getAs[Long]("n_docs") == 26L, q.toString)
    assert(q.getAs[Long]("n_true_pairs") == 277L, q.toString)
    assert(q.getAs[Long]("n_found") == 1L, q.toString)
    assert(math.abs(q.getAs[Double]("blocking_recall") - 1.0 / 277.0) < 1e-12, q.toString)
  }

  test("x_shard_mixing: every shard's diversity tracks the corpus; counts are complete") {
    val rows = ExtQueries.xShardMixing(spark, dir).collect()
      .map(r => r.getAs[Int]("shard") -> r).toMap
    assert(rows.contains(-1), "corpus row (shard = -1) missing")
    val corpus = rows(-1)
    val shards = (rows - (-1)).values.toSeq
    assert(shards.nonEmpty)
    // shard doc counts partition the corpus count
    assert(shards.map(_.getAs[Long]("n_docs")).sum == corpus.getAs[Long]("n_docs"))
    // the well-mixed law: a deterministic-hash shuffle must not
    // concentrate a language; each shard's Gini-Simpson diversity
    // stays within a sampling-noise band of the corpus diversity
    val cs = corpus.getAs[Double]("simpson")
    shards.foreach { s =>
      val d = math.abs(s.getAs[Double]("simpson") - cs)
      assert(d < 0.15, s"shard ${s.getAs[Int]("shard")} simpson off corpus by $d")
    }
  }

  test("x_posting_skew: deciles partition the vocabulary with monotone df bands") {
    val rows = ExtQueries.xPostingSkew(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("decile")).toSeq == (1L to 10L))
    // decile df ranges are internally consistent and non-decreasing
    rows.foreach(r => assert(r.getAs[Long]("min_df") <= r.getAs[Long]("max_df")))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_df") <= b.getAs[Long]("min_df"),
        s"decile ${a.getAs[Long]("decile")} overlaps ${b.getAs[Long]("decile")}")
      case _ => ()
    }
    // token mass accounts for the whole vocabulary: sum(sum_tf) equals
    // the corpus token total
    val total = graft.Tables.documents(spark, dir)
      .select(org.apache.spark.sql.functions.explode(
        graft.ext.TextOps.tokens(col("text")))).count()
    assert(rows.map(_.getAs[Long]("sum_tf")).sum == total)
  }

  test("x_cluster_labels: ranks contiguous per cell; doc counts cover the corpus; lift coherent") {
    val rows = ExtQueries.xClusterLabels(spark, dir).collect()
    assert(rows.nonEmpty)
    // per-cell label lists are top-k: ranks 1..n with n <= 3, no gaps
    rows.groupBy(_.getAs[Long]("cell")).foreach { case (c, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.length <= 3 && ranks.sameElements(1L to ranks.length), s"cell $c: ${ranks.toSeq}")
    }
    // every corpus vector is in exactly one labeled region (rank-1
    // assignment is a partition of the corpus)
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(rows.map(r => (r.getAs[Long]("cell"), r.getAs[Long]("n_docs")))
      .distinct.map(_._2).sum == n)
    // a label is a positive-lift, min-support term
    rows.foreach { r =>
      assert(r.getAs[Long]("ct") >= 3L && r.getAs[Long]("lift_q") > 0L, r.toString)
    }
  }

  test("x_ivf_silhouette: every corpus vector audited once; scores in [0,1]") {
    val rows = ExtQueries.xIvfSilhouette(spark, dir).collect()
    assert(rows.nonEmpty)
    // the replicated index stores exactly one rank-1 and one rank-2
    // row per vector, so the audit covers each vector exactly once
    val n = graft.Tables.embeddings(spark, dir).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == n)
    // simplified silhouette is bounded [0,1]: rank order makes d2 >= d1
    rows.foreach { r =>
      val s = r.getAs[Double]("mean_sil")
      assert(s >= 0.0 && s <= 1.0, r.toString)
    }
  }

  test("x_release_pipeline: stages compose monotonically; exportRelease ships what the manifest counts") {
    val t0 = System.nanoTime()
    val manifest = ExtQueries.xReleasePipeline(spark, dir).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_rows")).toMap
    val tManifest = (System.nanoTime() - t0) / 1e9
    // the funnel narrows monotonically and every stage keeps something
    // on this corpus
    assert(manifest("1_corpus") >= manifest("2_curated"))
    assert(manifest("2_curated") >= manifest("3_train"))
    assert(manifest("3_train") >= manifest("4_mixture"))
    assert(manifest("4_mixture") > 0)
    // shard rows partition the final selection exactly
    val shardTotal = manifest.collect {
      case (k, v) if k.startsWith("5_shard_") => v
    }.sum
    assert(shardTotal == manifest("4_mixture"))
    // each stage agrees with its standalone verified query where the
    // input set matches: stage 2 = funnel's final survivor count
    val funnel = ExtQueries.xCurationFunnel(spark, dir).collect()
    assert(funnel.last.getAs[Long]("n_kept") == manifest("2_curated"))

    // export: JSONL shards land under shard=<k> dirs, and the written
    // row count equals the manifest's final selection
    val out = java.nio.file.Files.createTempDirectory("graft-release").toString + "/rel"
    val t1 = System.nanoTime()
    ExtQueries.exportRelease(spark, dir, out)
    val tExport = (System.nanoTime() - t1) / 1e9
    val written = spark.read.json(out)
    assert(written.count() == manifest("4_mixture"))
    assert(written.select("shard").distinct().count() ==
      manifest.keys.count(_.startsWith("5_shard_")))
    // every written row carries the payload a trainer needs
    assert(Set("doc_id", "source", "text", "shard", "shuffle_key")
      .subsetOf(written.columns.toSet))
    info(f"stage times: manifest $tManifest%.1fs, export $tExport%.1fs")
  }
}
