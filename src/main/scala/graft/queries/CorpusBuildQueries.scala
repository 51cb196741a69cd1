package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType, IntegerType, LongType, StringType, StructField, StructType}

import graft.Tables
import graft.ext.{BpeTrainer, Dedup, Graph, IvfIndex, IvfStore, Multimodal, PqIndex, RelationStore, Similarity, TextOps, TopK, ZOrder}

/** Corpus construction: DSIR, token budget, PCA/whitening, curriculum, mixtures, packing, bloom, join estimates
  * — split from the monolithic ExtQueries in r10; mixes into
  * [[ExtQueries]] (self-typed), which carries the oracle-strategy
  * contract and the `queries`/`oracleSql` registries.
  */
private[queries] trait CorpusBuildQueries { this: ExtQueries.type =>
  private[queries] val DsirBudgetDen = 5L

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): rank the corpus by
    * an importance weight — the log-likelihood ratio of each document
    * under a TARGET unigram LM vs the RAW corpus LM — and sample the
    * top fifth without replacement via Gumbel-top-k. Both model
    * halves are existing stored state: the llr table IS the stored NB
    * model (target = the `en` slice, raw = the rest — a density-ratio
    * reading of the same artifact the classifier lifecycle trains),
    * and per-doc weights are EXACT BIGINT sums Σ cnt·llr_q over the
    * stored posting relation. The paper's Gumbel noise (sampling ∝ w
    * rather than deterministic top-w) comes from the engine's
    * rand-free contract: u = (shingleHash(doc_id) bucket + 0.5)/10⁴,
    * g = −ln(−ln u), quantized at 1e-4 like the llrs themselves.
    *
    * Output is the selection AUDIT at language grain: per-lang corpus
    * share before vs after selection. On THIS corpus the llrs are
    * add-one-smoothing noise (the measured `x_nb_eval` verdict), so
    * enrichment is a documented null — shares move only by sampling
    * noise — while `CurationSpec` proves the identical pipeline
    * enriches the target hard on a crafted corpus where tokens carry
    * the language. Scale shape: weights are one broadcast-model join
    * over the stored postings + a doc_id aggregate; selection is a
    * distributed top-B (`TakeOrderedAndProject`, never a
    * single-partition sort); the audit is lang-cardinality. B derives
    * from one driver-side metadata count (the [[pqServeC]] rationale).
    */
  def xDsirSelect(spark: SparkSession, dir: String): DataFrame = {
    val model = nbModel(spark, dir).filter(col("token") =!= "__prior__")
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("lang"))
    val lw = postings(spark, dir)
      .join(broadcast(model), Seq("token"))
      .groupBy("doc_id").agg(sum(col("cnt") * col("llr_q")).as("lw_q"))
    val b = (Tables.documents(spark, dir).count() / DsirBudgetDen).toInt
    val u = ((TextOps.shingleHash(col("doc_id").cast(StringType)) % 10000)
      .cast(DoubleType) + lit(0.5)) / lit(10000.0)
    val sel = docs.join(lw, Seq("doc_id"), "left")
      .withColumn("key_q",
        coalesce(col("lw_q"), lit(0L)) +
          floor(-log(-log(u)) * lit(NbScale) + lit(0.5)).cast(LongType))
      .orderBy(col("key_q").desc, col("doc_id")).limit(b)
      .select("doc_id", "lang")
    val before = docs.groupBy("lang").agg(count(lit(1)).as("n_docs"))
    val after = sel.groupBy("lang").agg(count(lit(1)).as("n_sel"))
    val nTot = docs.agg(count(lit(1)).as("n"))
    val nSelTot = sel.agg(count(lit(1)).as("nb"))
    before.join(after, Seq("lang"), "left")
      .withColumn("n_sel", coalesce(col("n_sel"), lit(0L)))
      .crossJoin(broadcast(nTot)).crossJoin(broadcast(nSelTot)) // 1-row scalars
      .select(col("lang"), col("n_docs"), col("n_sel"),
        (col("n_docs").cast(DoubleType) / col("n").cast(DoubleType)).as("share_before"),
        (col("n_sel").cast(DoubleType) / col("nb").cast(DoubleType)).as("share_after"))
      .orderBy("lang")
  }

  private[queries] lazy val xDsirSelectSql = {
    val u = s"((CAST(${shingleHashSql("CAST(doc_id AS VARCHAR)")} % 10000 AS DOUBLE) + 0.5) / 10000.0)"
    s"""WITH $nbCtes,
       |pt AS (SELECT doc_id, $ToksSql AS toks FROM documents),
       |pe AS (SELECT doc_id, unnest(toks) AS token FROM pt),
       |post AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS cnt FROM pe GROUP BY 1, 2),
       |lw AS (
       |  SELECT doc_id, CAST(SUM(cnt * llr_q) AS BIGINT) AS lw_q
       |  FROM post JOIN nbmodel USING (token) GROUP BY doc_id),
       |keyed AS (
       |  SELECT d.doc_id, d.lang,
       |    COALESCE(l.lw_q, 0) +
       |      CAST(FLOOR(-ln(-ln($u)) * 10000.0 + 0.5) AS BIGINT) AS key_q
       |  FROM documents d LEFT JOIN lw l USING (doc_id)),
       |sel AS (
       |  SELECT doc_id, lang FROM (
       |    SELECT doc_id, lang,
       |      ROW_NUMBER() OVER (ORDER BY key_q DESC, doc_id) AS rnk
       |    FROM keyed)
       |  WHERE rnk <= (SELECT COUNT(*) // $DsirBudgetDen FROM documents)),
       |bf AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
       |af AS (SELECT lang, COUNT(*) AS n_sel FROM sel GROUP BY lang),
       |nt AS (SELECT COUNT(*) AS n FROM documents),
       |nst AS (SELECT COUNT(*) AS nb FROM sel)
       |SELECT b.lang, b.n_docs, CAST(COALESCE(a.n_sel, 0) AS BIGINT) AS n_sel,
       |  CAST(b.n_docs AS DOUBLE) / CAST(nt.n AS DOUBLE) AS share_before,
       |  CAST(COALESCE(a.n_sel, 0) AS DOUBLE) / CAST(nst.nb AS DOUBLE) AS share_after
       |FROM bf b LEFT JOIN af a USING (lang) CROSS JOIN nt CROSS JOIN nst
       |ORDER BY lang""".stripMargin
  }

  private[queries] val BudgetEpochClamp = 12L

  /** Data-constrained scaling planner (the Muennighoff et al. 2022
    * "Scaling Data-Constrained Language Models" question): given a
    * token BUDGET T = 2× the corpus and temperature-α=0.5 mixture
    * weights over per-source token counts, how many EPOCHS does each
    * source run, and how many of the requested tokens are still worth
    * anything once repeats decay? Per source: available tokens n_s
    * (from the stored posting relation — Σ cnt per doc ≡ len, no
    * corpus re-tokenize), allocated budget r_s = T·√n_s / Σ√n_s in
    * EXACT integer arithmetic (√ quantized at 1e-6 pre-normalization,
    * the `x_mixture_temperature` contract; the T·sq_q product runs in
    * DECIMAL(38,0) — Spark Long would wrap silently past ~3e8 corpus
    * tokens while the DuckDB twin raises, so both engines widen:
    * HUGEINT on the oracle side), full epochs f = r_s div
    * n_s, and EFFECTIVE tokens under per-epoch value decay δ = 3/4:
    *   eff = n·Σ_{k<f} δ^k + rem·δ^f = (4n(4^f−3^f) + rem·3^f) / 4^f
    * — the closed form in exact integers (δ is chosen the exact
    * rational 3/4 where the paper fits δ≈e^(−1/R*), R*≈15; the
    * SUBSTANCE — later epochs are worth geometrically less, so
    * utilization falls exactly where repeats concentrate — survives
    * the substitution, and the rational makes the oracle engine-exact
    * where a fitted δ would hinge on libm pow). 3^f/4^f recover their
    * exact integer values via floor(pow+0.5); f clamps at
    * [[BudgetEpochClamp]] so they stay well under 2^53 (a source
    * repeated 12+ times contributes ~nothing marginal anyway — the
    * clamp IS the paper's conclusion). On the uniform synthetic
    * corpus every source lands f=2, utilization 0.875 — the crafted
    * 100:1 fixture in CurationSpec shows the real shape: scarce
    * sources repeat more and waste more.
    *
    * Scale: per-source aggregate of the stored postings (one
    * source-cardinality shuffle), then source-row arithmetic with two
    * 1-row broadcast scalars. The plan a mixture designer runs before
    * committing a training job, derived from the same stores the
    * mixture queries consume.
    */
  def xTokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val docLen = postings(spark, dir).groupBy("doc_id")
      .agg(max(col("len")).as("len"))
    val src = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      .join(docLen, Seq("doc_id"))
      .groupBy("source").agg(sum(col("len")).as("n_tokens"))
      .withColumn("sq_q", floor(sqrt(col("n_tokens").cast(DoubleType)) * lit(1e6) + lit(0.5))
        .cast(LongType))
    val tot = src.agg(sum(col("n_tokens")).as("g"), sum(col("sq_q")).as("sq_sum"))
    val p3 = floor(pow(lit(3.0), col("f").cast(DoubleType)) + lit(0.5)).cast(LongType)
    val p4 = floor(pow(lit(4.0), col("f").cast(DoubleType)) + lit(0.5)).cast(LongType)
    src.crossJoin(broadcast(tot)) // 1-row scalar
      // g·sq_q overflows 2^63 once the corpus passes ~3e8 tokens
      // (g ~ 3e8, sq_q ~ 1e6·√n_s) — and Spark's non-ANSI Long mul
      // would WRAP silently while DuckDB raises. The product runs in
      // DECIMAL(38,0) on both engines (DuckDB: HUGEINT), headroom to
      // ~1e38, before the integral divide brings it back under 2g.
      .withColumn("requested",
        expr("CAST((CAST(2 AS DECIMAL(38,0)) * g * sq_q) div sq_sum AS BIGINT)"))
      .withColumn("f", least(expr("requested div n_tokens"), lit(BudgetEpochClamp)))
      .withColumn("rem", col("requested") - col("n_tokens") * col("f"))
      .withColumn("p3", p3).withColumn("p4", p4)
      .withColumn("effective",
        (lit(4L) * col("n_tokens") * (col("p4") - col("p3")) + col("rem") * col("p3"))
          .cast(DoubleType) / col("p4").cast(DoubleType))
      .select(col("source"), col("n_tokens"), col("requested"),
        (col("requested").cast(DoubleType) / col("n_tokens").cast(DoubleType)).as("epochs"),
        col("f").as("full_epochs"), col("effective"),
        (col("effective") / col("requested").cast(DoubleType)).as("utilization"))
      .orderBy("source")
  }

  private[queries] lazy val xTokenBudgetSql =
    s"""WITH pt AS (SELECT doc_id, len($ToksSql) AS len FROM documents),
       |src AS (
       |  SELECT d.source, CAST(SUM(p.len) AS BIGINT) AS n_tokens,
       |    CAST(FLOOR(SQRT(CAST(SUM(p.len) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS sq_q
       |  FROM documents d JOIN pt p USING (doc_id) GROUP BY d.source),
       |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS g, CAST(SUM(sq_q) AS BIGINT) AS sq_sum FROM src),
       |alloc AS (
       |  SELECT source, n_tokens,
       |    CAST((2 * CAST(g AS HUGEINT) * sq_q) // sq_sum AS BIGINT) AS requested
       |  FROM src CROSS JOIN tot),
       |ep AS (
       |  SELECT source, n_tokens, requested,
       |    LEAST(requested // n_tokens, $BudgetEpochClamp) AS f
       |  FROM alloc),
       |pw AS (
       |  SELECT source, n_tokens, requested, f,
       |    requested - n_tokens * f AS rem,
       |    CAST(FLOOR(POWER(3.0, CAST(f AS DOUBLE)) + 0.5) AS BIGINT) AS p3,
       |    CAST(FLOOR(POWER(4.0, CAST(f AS DOUBLE)) + 0.5) AS BIGINT) AS p4
       |  FROM ep)
       |SELECT source, n_tokens, requested,
       |  CAST(requested AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS epochs,
       |  f AS full_epochs,
       |  CAST(4 * n_tokens * (p4 - p3) + rem * p3 AS DOUBLE) / CAST(p4 AS DOUBLE) AS effective,
       |  (CAST(4 * n_tokens * (p4 - p3) + rem * p3 AS DOUBLE) / CAST(p4 AS DOUBLE))
       |    / CAST(requested AS DOUBLE) AS utilization
       |FROM pw ORDER BY source""".stripMargin

  private[queries] val PcaDim = 64
  private[queries] val PcaIters = 5

  /** Top principal component of the embedding corpus by POWER
    * ITERATION over the covariance — the anisotropy diagnostic
    * (Ethayarajh 2019; Mu & Viswanath 2018's "all-but-the-top"
    * whitening direction): a real LM embedding space concentrates
    * variance in a few directions (EVR = λ₁/trace ≫ 1/D) and
    * retrieval improves when that component is removed; an isotropic
    * space reads EVR ≈ 1/D. This corpus' synthetic noise embeddings
    * measure EVR = 0.0191 ≈ 1.2/D — honestly isotropic — while
    * `CurationSpec` proves the solver finds a planted dominant
    * direction (loadings and EVR) on a crafted anisotropic fixture.
    *
    * Scale split, explicitly two-tier: the CORPUS-SIZED work is one
    * pass — each row's D×D outer product materializes MAP-SIDE as a
    * flattened quantized-long array (N·D² product rows, never N²,
    * and no join: the only shuffle is the D²-key partial-aggregate
    * exchange, ≤4096 partial rows per task) feeding an exact BIGINT
    * Gram/mean aggregate (every product quantized at 1e-6 BEFORE the
    * sum, so partial aggregation is order-free and engine-exact);
    * the EIGENSOLVE is D²-sized
    * (4096 longs) and runs driver-side — the k-row-centroid /
    * vocab-local-BPE precedent: bounded hyperparameter state, never
    * corpus. Each power step re-quantizes per-term products to
    * BIGINT, so the 5-step trajectory is bit-identical to the
    * oracle's materialized relational iteration: same ints in, same
    * IEEE ÷/√ on 1-row scalars, same ints out. Sign is pinned by the
    * all-positive start vector; λ₁ is the final Rayleigh quotient,
    * trace from the covariance diagonal, both 1e-6-quantized sums.
    */


  /** Declarative audit twin of [[PcaGramAgg]]'s product sums: each
    * row's D×D outer product materializes MAP-SIDE as a flattened
    * quantized-long array (`transform`×`transform` inside one
    * projection — no self-join, no corpus shuffle), exploded straight
    * into a partial aggregate keyed by the D² flat position. The only
    * exchange in this plan is the D²-key hash partial-agg exchange
    * (≤4096 partial rows per task).
    */
  private[graft] def pcaGramSums(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(posexplode(expr(
        """flatten(transform(embedding, xi ->
          |  transform(embedding, xj ->
          |    CAST(FLOOR(CAST(xi AS DOUBLE) * CAST(xj AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT))))"""
          .stripMargin)))
      .groupBy("pos").agg(sum(col("col")).as("s_q"))
      .select(expr(s"CAST(pos div $PcaDim AS BIGINT)").as("i"),
        expr(s"CAST(pos % $PcaDim AS BIGINT)").as("j"), col("s_q"))


  private[graft] def pcaState(spark: SparkSession, dir: String): PcaState = {
    import spark.implicits._
    // ONE corpus pass, ONE job: Gram + means + count fold into a
    // single 33 KB buffer per task (see PcaGramAgg); the eigensolve
    // input is D²+D+1 longs regardless of corpus size
    val b = Tables.embeddings(spark, dir).select(col("embedding"))
      .as[Seq[Float]].select(PcaGramAgg.toColumn).head()
    val sMap = (for (i <- 0 until PcaDim; j <- 0 until PcaDim)
      yield (i.toLong, j.toLong) -> b.sums(i * PcaDim + j)).toMap
    val mMap = (0 until PcaDim).map(i => i.toLong -> b.means(i)).toMap
    PcaState(b.n, sMap, mMap)
  }

  def xPcaPower(spark: SparkSession, dir: String): DataFrame = {
    val st = pcaState(spark, dir)
    import st.c
    val v = st.solve()
    var lamQ = 0L; var trQ = 0L
    var i = 0
    while (i < PcaDim) {
      trQ += math.floor(c(i, i) * 1000000.0 + 0.5).toLong
      var j = 0
      while (j < PcaDim) {
        lamQ += math.floor(c(i, j) * v(i) * v(j) * 1000000.0 + 0.5).toLong; j += 1
      }
      i += 1
    }
    val evr = lamQ.toDouble / trQ.toDouble
    import spark.implicits._
    v.zipWithIndex.map { case (vi, idx) =>
      (idx.toLong, math.floor(vi * 1000000.0 + 0.5).toLong, lamQ, trQ, evr)
    }.toSeq.toDF("i", "load_q", "lam_q", "tr_q", "evr").orderBy("i")
  }

  /** Shared CTE prefix of the PCA oracles: exploded embeddings,
    * quantized Gram/mean sums, exact covariance, and the
    * [[PcaIters]]-step materialized power iteration ending in table
    * `it{PcaIters}` (i, v).
    */
  private[queries] lazy val pcaCtePrefix = {
    def step(prev: String, t: Int): String =
      s"""w$t AS (
         |  SELECT c.i, SUM(CAST(FLOOR(c.v_c * v.v * 1000000.0 + 0.5) AS BIGINT)) AS w
         |  FROM cov c JOIN $prev v ON c.j = v.i GROUP BY c.i),
         |n$t AS (SELECT SQRT(CAST(SUM(w * w) AS BIGINT)) AS nrm FROM w$t),
         |it$t AS (SELECT i, CAST(w AS DOUBLE) / nrm AS v FROM w$t CROSS JOIN n$t)""".stripMargin
    val steps = (1 to PcaIters).map(t => step(s"it${t - 1}", t)).mkString(",\n")
    s"""e AS (
       |  SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS BIGINT) AS i,
       |    CAST(unnest(embedding) AS DOUBLE) AS x
       |  FROM embeddings),
       |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM embeddings),
       |s AS (
       |  SELECT a.i, b.i AS j,
       |    CAST(SUM(CAST(FLOOR(a.x * b.x * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s_q
       |  FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2),
       |m AS (
       |  SELECT i, CAST(SUM(CAST(FLOOR(x * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS m_q
       |  FROM e GROUP BY i),
       |cov AS (
       |  SELECT s.i, s.j,
       |    CAST(s.s_q AS DOUBLE) / 1000000.0 / nn.nd -
       |      (CAST(mi.m_q AS DOUBLE) / 1000000.0 / nn.nd) *
       |      (CAST(mj.m_q AS DOUBLE) / 1000000.0 / nn.nd) AS v_c
       |  FROM s JOIN m mi ON s.i = mi.i JOIN m mj ON s.j = mj.i CROSS JOIN nn),
       |it0 AS (SELECT CAST(r.range AS BIGINT) AS i, CAST(0.125 AS DOUBLE) AS v FROM range(0, $PcaDim) r),
       |$steps""".stripMargin
  }

  private[queries] lazy val xPcaPowerSql =
    s"""WITH $pcaCtePrefix,
       |lam AS (
       |  SELECT CAST(SUM(CAST(FLOOR(c.v_c * vi.v * vj.v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS lam_q
       |  FROM cov c JOIN it$PcaIters vi ON c.i = vi.i JOIN it$PcaIters vj ON c.j = vj.i),
       |tr AS (SELECT CAST(SUM(CAST(FLOOR(v_c * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS tr_q
       |  FROM cov WHERE i = j)
       |SELECT v.i, CAST(FLOOR(v.v * 1000000.0 + 0.5) AS BIGINT) AS load_q,
       |  lam.lam_q, tr.tr_q,
       |  CAST(lam.lam_q AS DOUBLE) / CAST(tr.tr_q AS DOUBLE) AS evr
       |FROM it$PcaIters v CROSS JOIN lam CROSS JOIN tr ORDER BY i""".stripMargin

  /** All-but-the-top whitening APPLIED (Mu & Viswanath 2018): remove
    * the mean and the solved top principal component from every
    * embedding, reporting per-vector quantized projection coefficient
    * `t_q`, centered norm² `orig_q`, and residual norm² `res_q` for
    * the 20 vectors with the largest |projection| — the vectors the
    * dominant direction explains most. The post-processing step that
    * measurably improves similarity search on anisotropic LM spaces;
    * on this honest-isotropic synthetic corpus the removal is small
    * (res ≈ orig) but exactly measured.
    *
    * Scale shape: μ and v are D-bounded driver state from the shared
    * one-pass Gram build ([[pcaGramSums]] — map-side outer product,
    * one D²-key exchange); the whitening itself is PURE MAP-SIDE
    * (μ, v enter as array literals — no join, the corpus is never
    * shuffled) and the top-20 is a distributed TakeOrdered. Every
    * per-term product is 1e-6-quantized BEFORE its sum, so both
    * engines add the same longs in any order.
    */
  /** The PURE MAP-SIDE whitening application shared by the batch
    * [[xWhitenTop]] and the streaming twin
    * ([[graft.streaming.EventStream.runWhitenStream]]): μ and v enter
    * as array literals (D-bounded driver state), each input row gets
    * its quantized projection t_q, centered norm² orig_q, and
    * residual norm² res_q — a stateless projection, valid on batch
    * and streaming DataFrames alike.
    */
  private[graft] def whitenApply(df: DataFrame, v: Array[Double],
      mu: Array[Double]): DataFrame = {
    val vL = typedLit(v.toSeq)
    val muL = typedLit(mu.toSeq)
    val idx = sequence(lit(0), lit(PcaDim - 1))
    def term(j: Column): Column =
      col("embedding").getItem(j).cast(DoubleType) - muL.getItem(j)
    val tTerms = transform(idx, j =>
      floor(term(j) * vL.getItem(j) * lit(1e6) + lit(0.5)).cast(LongType))
    val rTerms = transform(idx, j =>
      floor((term(j) - col("t") * vL.getItem(j)) * lit(1e6) + lit(0.5))
        .cast(LongType))
    val oTerms = transform(idx, j =>
      floor(term(j) * lit(1e6) + lit(0.5)).cast(LongType))
    df.withColumn("t_q", aggregate(tTerms, lit(0L), (a, x) => a + x))
      .withColumn("t", col("t_q").cast(DoubleType) / lit(1e6))
      .withColumn("orig_q", aggregate(oTerms, lit(0L), (a, x) => a + x * x))
      .withColumn("res_q", aggregate(rTerms, lit(0L), (a, x) => a + x * x))
      .select("vec_id", "t_q", "orig_q", "res_q")
  }

  /** Solve the corpus top component once and hand back (v, μ) — the
    * D-bounded whitening parameters ([[pcaState]] + [[PcaState.solve]]).
    */
  private[graft] def whitenParams(spark: SparkSession, dir: String)
      : (Array[Double], Array[Double]) = {
    val st = pcaState(spark, dir)
    (st.solve(), Array.tabulate(PcaDim)(st.mu))
  }

  def xWhitenTop(spark: SparkSession, dir: String): DataFrame = {
    val (v, mu) = whitenParams(spark, dir)
    whitenApply(Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding")), v, mu)
      .orderBy(abs(col("t_q")).desc, col("vec_id"))
      .limit(20)
  }

  private[queries] lazy val xWhitenTopSql =
    s"""WITH $pcaCtePrefix,
       |mu AS (SELECT m.i, CAST(m.m_q AS DOUBLE) / 1000000.0 / nn.nd AS mu FROM m CROSS JOIN nn),
       |terms AS (
       |  SELECT e.vec_id, e.i, e.x - mu.mu AS term, v.v
       |  FROM e JOIN mu ON e.i = mu.i JOIN it$PcaIters v ON e.i = v.i),
       |tq AS (
       |  SELECT vec_id, CAST(SUM(CAST(FLOOR(term * v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS t_q
       |  FROM terms GROUP BY vec_id),
       |r AS (
       |  SELECT terms.vec_id,
       |    CAST(FLOOR((term - (CAST(t_q AS DOUBLE) / 1000000.0) * v) * 1000000.0 + 0.5) AS BIGINT) AS r_q,
       |    CAST(FLOOR(term * 1000000.0 + 0.5) AS BIGINT) AS o_q
       |  FROM terms JOIN tq ON terms.vec_id = tq.vec_id),
       |agg AS (
       |  SELECT vec_id, CAST(SUM(o_q * o_q) AS BIGINT) AS orig_q,
       |    CAST(SUM(r_q * r_q) AS BIGINT) AS res_q
       |  FROM r GROUP BY vec_id)
       |SELECT a.vec_id, t.t_q, a.orig_q, a.res_q
       |FROM agg a JOIN tq t ON a.vec_id = t.vec_id
       |ORDER BY ABS(t.t_q) DESC, a.vec_id LIMIT 20""".stripMargin

  /** Sequence-length CURRICULUM ordering (Bengio et al. 2009's
    * easy-to-hard schedule, with length as the standard difficulty
    * proxy): documents bucketed into length deciles, shuffled
    * deterministically WITHIN each bucket (the `x_split_sample` hash
    * contract — no `rand()`, reproducible across runs/engines/cluster
    * sizes), and assigned a single global `curriculum_rank` that
    * walks bucket 1 → 10. The training-order construction a
    * curriculum schedule feeds straight into a packed-sequence
    * writer.
    *
    * Scale shape — deliberately NO global-order window: decile
    * thresholds are a 1-row exact-percentile aggregate broadcast back
    * (guarded by [[CoreQueries.requireGroupsFitExactPercentile]];
    * swap to `approx_percentile` at 100 TB, cf. `a6`), bucket
    * assignment is map-side array arithmetic against the broadcast
    * thresholds, the within-bucket shuffle is a bucket-PARTITIONED
    * row_number (10-way parallel, no SinglePartition collapse), and
    * the global rank is within-bucket rank + the bucket's offset from
    * a 10-row broadcast cumulative-count relation — the two-level
    * ranking that keeps a total order scalable.
    */
  def xCurriculum(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir).select(col("doc_id"),
      size(TextOps.tokens(col("text"))).cast(LongType).as("n_tokens"))
    CoreQueries.requireGroupsFitExactPercentile(
      Tables.documents(spark, dir).select(lit(1).as("g")), Seq("g"))
    val th = base.agg(
      percentile(col("n_tokens"), typedLit((1 to 9).map(_ / 10.0))).as("th"))
    val bucketed = base.crossJoin(broadcast(th))
      .withColumn("bucket", (lit(1L) + aggregate(col("th"), lit(0L),
        (acc, t) => acc +
          when(t < col("n_tokens").cast(DoubleType), 1L).otherwise(0L))))
      .withColumn("h", TextOps.shingleHash(col("doc_id").cast(StringType)))
      .select("doc_id", "n_tokens", "bucket", "h")
    val byBucket = Window.partitionBy("bucket").orderBy(col("h"), col("doc_id"))
    val ranked = bucketed
      .withColumn("rk", row_number().over(byBucket).cast(LongType))
    val offsets = bucketed.groupBy("bucket").agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(sum(col("n")).over(Window.orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("bucket", "off")
    ranked.join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"), col("n_tokens"), col("bucket"),
        (col("rk") + col("off")).as("curriculum_rank"))
      .orderBy("curriculum_rank")
  }

  private[queries] lazy val xCurriculumSql = {
    val pcts = (1 to 9).map(i => (i / 10.0).toString).mkString("[", ", ", "]")
    s"""WITH base AS (
       |  SELECT doc_id, CAST(len($ToksSql) AS BIGINT) AS n_tokens FROM documents),
       |th AS (SELECT quantile_cont(CAST(n_tokens AS DOUBLE), $pcts) AS th FROM base),
       |b AS (
       |  SELECT doc_id, n_tokens,
       |    1 + CAST(len(list_filter(th.th, t -> t < CAST(n_tokens AS DOUBLE))) AS BIGINT) AS bucket,
       |    ${shingleHashSql("CAST(doc_id AS VARCHAR)")} AS h
       |  FROM base CROSS JOIN th),
       |r AS (
       |  SELECT doc_id, n_tokens, bucket,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY h, doc_id) AS BIGINT) AS rk
       |  FROM b),
       |off AS (SELECT bucket, COUNT(*) AS n FROM b GROUP BY bucket),
       |o2 AS (
       |  SELECT bucket, COALESCE(SUM(n) OVER (ORDER BY bucket
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
       |  FROM off)
       |SELECT r.doc_id, r.n_tokens, r.bucket,
       |  CAST(r.rk + o2.off AS BIGINT) AS curriculum_rank
       |FROM r JOIN o2 USING (bucket) ORDER BY curriculum_rank""".stripMargin
  }

  /** Deterministic training-mix construction (domain reweighting): given
    * per-source target weights, down-sample every source by a hash
    * threshold so the surviving corpus hits the target proportions —
    * the step that turns a raw crawl into a weighted pretraining mix
    * (e.g. the Pile / LLaMA mixture tables). Weights here derive from
    * the source id ((N % 3) + 1, normalized), so rates are the
    * non-degenerate 1/3, 2/3, 1 on the uniform synthetic corpus.
    *
    * The global scale T = min_s(n_s / target_s) is the largest total
    * for which no source must be UP-sampled; each source then keeps
    * docs whose md5 bucket falls under rate_s = target_s·T / n_s.
    * Acceptance is by deterministic hash (the `x_split_sample`
    * contract — reproducible across runs, engines, cluster sizes;
    * no `rand()`).
    *
    * Scale shape: per-source counts are a map-side-combined aggregate
    * of source-cardinality rows; T is a 1-row aggregate over those;
    * both broadcast back, and the per-document accept test is pure
    * map-side — the corpus itself is never shuffled at all.
    */
  def xMixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val w = (substring(col("source"), 4, 10).cast(IntegerType) % 3 + 1)
      .cast(LongType)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        (TextOps.shingleHash(col("doc_id").cast(StringType)) % 10000)
          .cast(IntegerType).as("bucket"))
    val counts = docs.groupBy("source")
      .agg(count(lit(1)).as("n"))
      .withColumn("w", w)
    val totals = counts.agg(sum(col("w")).as("wsum"))
    val withScale = counts.crossJoin(broadcast(totals))
      .withColumn("cap", col("n").cast(DoubleType) * col("wsum").cast(DoubleType)
        / col("w").cast(DoubleType))
    val t = withScale.agg(min(col("cap")).as("t"))
    val rates = withScale.crossJoin(broadcast(t))
      // explicit floor BEFORE the int cast: Spark's double->int cast
      // truncates but DuckDB's rounds to nearest — on a fractional
      // threshold (e.g. 6666.67 for every weight-2 source here) the
      // two engines would disagree by one bucket without it
      .withColumn("threshold",
        floor((col("w").cast(DoubleType) * col("t") * lit(10000.0))
          / (col("wsum").cast(DoubleType) * col("n").cast(DoubleType))).cast(IntegerType))
      .select("source", "threshold")
    docs.join(broadcast(rates), "source")
      .filter(col("bucket") < col("threshold"))
      .select("doc_id", "source", "bucket")
      .orderBy("doc_id")
  }

  private[queries] val xMixtureSampleSql = {
    val bucket = shingleHashSql("CAST(doc_id AS VARCHAR)") + " % 10000"
    s"""WITH d AS (SELECT doc_id, source, CAST($bucket AS INT) AS bucket FROM documents),
       |c AS (SELECT source, COUNT(*) AS n,
       |    CAST(CAST(substr(source, 4) AS INT) % 3 + 1 AS BIGINT) AS w
       |  FROM d GROUP BY source),
       |ws AS (SELECT SUM(w) AS wsum FROM c),
       |sc AS (SELECT source, n, w, wsum,
       |    CAST(n AS DOUBLE) * CAST(wsum AS DOUBLE) / CAST(w AS DOUBLE) AS cap
       |  FROM c CROSS JOIN ws),
       |t AS (SELECT MIN(cap) AS t FROM sc),
       |r AS (SELECT source,
       |    CAST(FLOOR((CAST(w AS DOUBLE) * t * 10000.0)
       |      / (CAST(wsum AS DOUBLE) * CAST(n AS DOUBLE))) AS INT) AS threshold
       |  FROM sc CROSS JOIN t)
       |SELECT doc_id, d.source, bucket
       |FROM d JOIN r ON d.source = r.source
       |WHERE bucket < threshold
       |ORDER BY doc_id""".stripMargin
  }

  /** Temperature-mixture sample budget. */
  private[queries] val MixTempBudget = 1000L

  /** TEMPERATURE-SCALED MIXTURE WEIGHTS (α = 0.5) — the multilingual/
    * multi-source rebalancing rule (sampling proportion ∝ n^α, α<1):
    * upsample the tail sources, damp the head, without the cliff of
    * [[xMixtureSample]]'s hard caps. α = 0.5 makes the scaled weight
    * an IEEE `sqrt` (correctly rounded in both engines); each √n is
    * quantized to BIGINT at 1e-6 BEFORE the cross-source sum so the
    * normalizing denominator is order-free exact (the NbScale/PSI
    * reasoning — a float Σ over a GROUP has no deterministic order).
    * Emits per source: n, raw proportion p, temperature proportion
    * p_temp, the integer draw budget at [[MixTempBudget]], and the
    * per-doc acceptance rate — the numbers a sampler joins back
    * against the corpus (the `x_mixture_sample` bucket mechanism).
    * One source-cardinality aggregate + a broadcast 1-row total.
    */
  def xMixtureTemperature(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.documents(spark, dir).groupBy("source")
      .agg(count(lit(1)).as("n"))
      .withColumn("sq",
        floor(sqrt(col("n").cast(DoubleType)) * lit(1e6) + lit(0.5)).cast(LongType))
    val tot = c.agg(sum(col("sq")).as("sqsum"), sum(col("n")).as("ntot"))
    c.crossJoin(broadcast(tot))
      .select(col("source"), col("n"),
        (col("n").cast(DoubleType) / col("ntot").cast(DoubleType)).as("p"),
        (col("sq").cast(DoubleType) / col("sqsum").cast(DoubleType)).as("p_temp"),
        floor(lit(MixTempBudget.toDouble) * col("sq").cast(DoubleType)
          / col("sqsum").cast(DoubleType)).cast(LongType).as("target_n"))
      .withColumn("rate",
        col("target_n").cast(DoubleType) / col("n").cast(DoubleType))
      .orderBy("source")
  }

  private[queries] val xMixtureTemperatureSql =
    s"""WITH mc AS (
       |  SELECT source, COUNT(*) AS n,
       |    CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS sq
       |  FROM documents GROUP BY source),
       |mt AS (SELECT CAST(SUM(sq) AS BIGINT) AS sqsum, CAST(SUM(n) AS BIGINT) AS ntot FROM mc)
       |SELECT source, n,
       |  CAST(n AS DOUBLE) / CAST(ntot AS DOUBLE) AS p,
       |  CAST(sq AS DOUBLE) / CAST(sqsum AS DOUBLE) AS p_temp,
       |  CAST(FLOOR($MixTempBudget.0 * CAST(sq AS DOUBLE) / CAST(sqsum AS DOUBLE)) AS BIGINT) AS target_n,
       |  CAST(CAST(FLOOR($MixTempBudget.0 * CAST(sq AS DOUBLE) / CAST(sqsum AS DOUBLE)) AS BIGINT) AS DOUBLE)
       |    / CAST(n AS DOUBLE) AS rate
       |FROM mc CROSS JOIN mt ORDER BY source""".stripMargin

  /** Greedy sequence packing: concatenate documents per source, in
    * deterministic doc_id order, into fixed 256-token training
    * sequences — `seq_id` = which sequence a document STARTS in
    * (floor(cumulative-tokens-before / 256)), `seq_off` its token
    * offset inside that sequence. The context-packing step after
    * `x_chunk_tokens`: chunking splits long docs, packing fuses short
    * ones so padding is not wasted.
    *
    * Scale shape: ONE shuffle on source, then a per-source running-sum
    * window (partition-parallel — no global order, no SinglePartition
    * exchange; sources are the unit of parallelism, exactly how a real
    * packer shards). Integer arithmetic throughout — exact oracle.
    */
  def xPackSequences(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    val bySrc = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), size(toks).cast(LongType).as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(bySrc), lit(0L)))
      // floor-div: Spark `/` on longs is DOUBLE division; cum_before
      // is ≥ 0 and < 2^53 so the quotient is exact and floor = trunc
      .withColumn("seq_id", floor(col("cum_before") / lit(256)).cast(LongType))
      .withColumn("seq_off", col("cum_before") % 256L)
      .orderBy("doc_id")
  }

  private[queries] val xPackSequencesSql =
    s"""WITH t AS (SELECT doc_id, source, len($ToksSql) AS n_tokens FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM t)
       |SELECT doc_id, source, n_tokens, cum_before,
       |  CAST(cum_before // 256 AS BIGINT) AS seq_id,
       |  CAST(cum_before % 256 AS BIGINT) AS seq_off
       |FROM c ORDER BY doc_id""".stripMargin

  /** Bloom layout: bits-per-item (m = max(1024, 16·n)), k hash
    * functions. m SCALES WITH THE ITEM COUNT — the r7 IVF lesson
    * (fixed k=12 → recall decay) replayed at the sketch tier: under a
    * FIXED m = 16384 this filter measured FPR 0.0013 → 0.495 → 1.0
    * (fully saturated, every bit set) as n grew 750 → 75 000 across
    * the SFs. At 16 bits/item and k = 4 the predicted FPR is
    * ≈ 0.0024 at EVERY scale; m is not a power of two because bit
    * addressing is `hash % m` — nothing in the relational layout
    * needs the pow-2 (that's a bit-twiddling micro-optimization a
    * packed implementation would add).
    */
  private[queries] val BloomBitsPerItem = 16L
  private[queries] val BloomBitsFloor = 1024L
  private[queries] val BloomK = 4

  /** BLOOM FILTER with MEASURED false-positive rate — the sketch that
    * completes the approximate-membership tier beside HLL
    * (cardinality) and CMS (frequency): build the bit set over the
    * even order keys (k = 4 deterministic shingle-hash functions into
    * m = 16384 bits, the filter = the DISTINCT set-bit relation —
    * broadcastable at any m a single filter would actually use), then
    * probe with the DISJOINT odd keys, so every positive is by
    * construction a false positive, and publish the measured FPR
    * beside the standard (1−(1−1/m)^{kn})^k prediction (quantized at
    * 1e-6 — `pow` carries no cross-engine correct-rounding guarantee,
    * the NbScale reasoning). The deployment read: measured ≈ theory
    * says the hash family is behaving; measured ≫ theory says the
    * hashes correlate on this key distribution — the thing you
    * validate BEFORE shipping a filter to gate a 100 TB anti-join
    * (the giant-tombstone-set escape [[xAnnDelete]]'s scaladoc
    * names). Build is one n·k map-side fan + distinct; probing is a
    * broadcast join against the bit relation.
    */
  def xBloomFilter(spark: SparkSession, dir: String): DataFrame = {
    def bitOf(j: Column, key: Column, m: Column): Column =
      TextOps.shingleHash(concat(j.cast(StringType), lit(":"), key.cast(StringType))) % m
    val js = spark.range(BloomK).select(col("id").as("j"))
    val members = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 2 === 0).select(col("o_orderkey").as("key"))
    val probes = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 2 === 1).select(col("o_orderkey").as("key"))
    val layout = members.agg(count(lit(1)).as("n_items"))
      .select(col("n_items"),
        greatest(lit(BloomBitsFloor), col("n_items") * BloomBitsPerItem).as("m"))
    val bits = members.crossJoin(broadcast(layout)).crossJoin(broadcast(js))
      .select(bitOf(col("j"), col("key"), col("m")).as("bit")).distinct()
    val probeHits = probes.crossJoin(broadcast(layout)).crossJoin(broadcast(js))
      .select(col("key"), bitOf(col("j"), col("key"), col("m")).as("bit"))
      .join(broadcast(bits.withColumn("set", lit(1))), Seq("bit"), "left")
      .groupBy("key")
      .agg(sum(when(col("set").isNotNull, 1L).otherwise(0L)).as("nset"))
    val nBits = bits.agg(count(lit(1)).as("n_bits_set"))
    probeHits.agg(
      count(lit(1)).as("n_probes"),
      sum(when(col("nset") === BloomK, 1L).otherwise(0L)).as("n_false_pos"))
      .crossJoin(broadcast(layout)).crossJoin(broadcast(nBits))
      .select(col("n_items"), col("m"), col("n_bits_set"), col("n_probes"),
        col("n_false_pos"),
        (col("n_false_pos").cast(DoubleType) / col("n_probes").cast(DoubleType))
          .as("fpr_measured"),
        (floor(pow(lit(1.0) - pow(lit(1.0) - lit(1.0) / col("m").cast(DoubleType),
          (col("n_items") * BloomK).cast(DoubleType)), BloomK) * lit(1e6) + lit(0.5))
          / lit(1e6)).as("fpr_theory"))
  }

  private[queries] val xBloomFilterSql = {
    def bitOf(j: String, key: String): String =
      shingleHashSql(s"CAST($j AS VARCHAR) || ':' || CAST($key AS VARCHAR)") + s" % bl.m"
    s"""WITH bj AS (SELECT unnest([0, 1, 2, 3]) AS j),
       |bm AS (SELECT o_orderkey AS key FROM orders WHERE o_orderkey % 2 = 0),
       |bp AS (SELECT o_orderkey AS key FROM orders WHERE o_orderkey % 2 = 1),
       |bl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       |    GREATEST($BloomBitsFloor, CAST(COUNT(*) AS BIGINT) * $BloomBitsPerItem) AS m
       |  FROM bm),
       |bbits AS (SELECT DISTINCT ${bitOf("bj.j", "bm.key")} AS bit
       |  FROM bm CROSS JOIN bl CROSS JOIN bj),
       |bph AS (
       |  SELECT key,
       |    CAST(SUM(CASE WHEN bit IN (SELECT bit FROM bbits) THEN 1 ELSE 0 END) AS BIGINT) AS nset
       |  FROM (SELECT bp.key, ${bitOf("bj.j", "bp.key")} AS bit
       |    FROM bp CROSS JOIN bl CROSS JOIN bj)
       |  GROUP BY key),
       |bnb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bits_set FROM bbits)
       |SELECT n_items, m, n_bits_set,
       |  CAST(COUNT(*) AS BIGINT) AS n_probes,
       |  CAST(SUM(CASE WHEN nset = $BloomK THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos,
       |  CAST(SUM(CASE WHEN nset = $BloomK THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS fpr_measured,
       |  FLOOR(POWER(1.0 - POWER(1.0 - 1.0 / CAST(m AS DOUBLE),
       |    CAST(n_items * $BloomK AS DOUBLE)), $BloomK) * 1000000.0 + 0.5)
       |    / 1000000.0 AS fpr_theory
       |FROM bph CROSS JOIN bl CROSS JOIN bnb
       |GROUP BY n_items, m, n_bits_set""".stripMargin
  }

  /** Key-domain sample rate for join-size estimation (percent). */
  private[queries] val JoinEstPct = 10

  /** SAMPLE-BASED JOIN CARDINALITY ESTIMATION, measured against the
    * exact count — the planning primitive behind every broadcast/
    * shuffle/skew decision this library makes by hand: estimate
    * |orders ⋈ lineitem| by hashing the JOIN-KEY DOMAIN to a
    * [[JoinEstPct]]% sample (keep a key iff shingleHash('card:'‖key)
    * mod 100 < 10), restrict BOTH sides to surviving keys, count
    * exactly, scale by 100/pct. Sampling KEYS — not rows — is the
    * load-bearing choice: independent row sampling estimates
    * Σ aₖbₖ with p² of each key's contribution surviving (a p⁻²
    * rescale whose variance explodes on skewed fan-out keys), while
    * key sampling keeps every surviving key's contribution INTACT
    * (per-key fan-out aₖ·bₖ preserved exactly; the estimator is
    * unbiased with variance ∝ the key-contribution spread). Published
    * beside the exact count and the relative error — the honesty
    * number that tells a planner how far to trust the estimate. At
    * 100 TB the estimate costs pct% of the join's shuffle (the same
    * pushed hash filter on both scans); the exact leg here is the
    * measurement contract, not the production path.
    */
  def xJoinSizeEst(spark: SparkSession, dir: String): DataFrame = {
    def keep(key: Column): Column =
      TextOps.shingleHash(concat(lit("card:"), key.cast(StringType))) % 100 < JoinEstPct
    val o = Tables.orders(spark, dir).select(col("o_orderkey").as("key"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey").as("key"))
    val est = o.filter(keep(col("key"))).join(l.filter(keep(col("key"))), Seq("key"))
      .agg((count(lit(1)) * (100L / JoinEstPct)).as("est_rows"))
    val exact = o.join(l, Seq("key")).agg(count(lit(1)).as("exact_rows"))
    est.crossJoin(exact)
      .select(col("est_rows"), col("exact_rows"),
        (abs(col("est_rows") - col("exact_rows")).cast(DoubleType) /
          col("exact_rows").cast(DoubleType)).as("rel_error"))
  }

  private[queries] val xJoinSizeEstSql = {
    val keep = shingleHashSql("'card:' || CAST(key AS VARCHAR)") + s" % 100 < $JoinEstPct"
    s"""WITH jo AS (SELECT o_orderkey AS key FROM orders),
       |jl AS (SELECT l_orderkey AS key FROM lineitem),
       |jest AS (
       |  SELECT CAST(COUNT(*) * ${100 / JoinEstPct} AS BIGINT) AS est_rows
       |  FROM (SELECT key FROM jo WHERE $keep) a
       |    JOIN (SELECT key FROM jl WHERE $keep) b USING (key)),
       |jex AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_rows FROM jo JOIN jl USING (key))
       |SELECT est_rows, exact_rows,
       |  CAST(ABS(est_rows - exact_rows) AS DOUBLE) / CAST(exact_rows AS DOUBLE) AS rel_error
       |FROM jest CROSS JOIN jex""".stripMargin
  }

  /** PACKING EFFICIENCY — the two numbers that judge a packer: per
    * source, the FILL RATE (token mass over sequence capacity — for
    * concat-packing, waste exists only in the last partial sequence,
    * so fill approaches 1 as the source grows; a no-split packer's
    * fill is bounded by bin-packing slack instead) and the
    * FRAGMENTATION RATE (documents straddling a 256-token sequence
    * boundary — the attention-fragmentation cost concat-packing pays
    * FOR that fill; the two rates are the packer's trade-off stated
    * as data). Derived from exactly [[xPackSequences]]'s cumulative
    * chain: same window, same floor-div; one source-grain aggregate
    * on top. A doc fragments iff its span [cum_before,
    * cum_before+n_tokens) crosses a multiple of 256; zero-token docs
    * cannot fragment (guarded by the max(…,1) end offset).
    */
  def xPackStats(spark: SparkSession, dir: String): DataFrame = {
    val packed = xPackSequences(spark, dir)
    packed
      .withColumn("end_seq",
        floor((col("cum_before") + greatest(col("n_tokens"), lit(1L)) - 1L)
          / lit(256)).cast(LongType))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (max(floor((col("cum_before") + col("n_tokens") + 255L) / lit(256)))
          .cast(LongType)).as("n_seqs"),
        sum(when(col("end_seq") =!= col("seq_id"), 1L).otherwise(0L))
          .as("n_fragmented"))
      .select(col("source"), col("n_docs"), col("total_tokens"), col("n_seqs"),
        (col("total_tokens").cast(DoubleType) /
          (col("n_seqs") * 256L).cast(DoubleType)).as("fill_rate"),
        col("n_fragmented"),
        (col("n_fragmented").cast(DoubleType) / col("n_docs").cast(DoubleType))
          .as("frag_rate"))
      .orderBy("source")
  }

  private[queries] val xPackStatsSql =
    s"""WITH t AS (SELECT doc_id, source, len($ToksSql) AS n_tokens FROM documents),
       |c AS (SELECT doc_id, source, n_tokens,
       |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM t),
       |e AS (SELECT source, n_tokens, cum_before,
       |    CAST(cum_before // 256 AS BIGINT) AS seq_id,
       |    CAST((cum_before + GREATEST(n_tokens, 1) - 1) // 256 AS BIGINT) AS end_seq
       |  FROM c)
       |SELECT source,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |  CAST(MAX((cum_before + n_tokens + 255) // 256) AS BIGINT) AS n_seqs,
       |  CAST(SUM(n_tokens) AS DOUBLE)
       |    / CAST(MAX((cum_before + n_tokens + 255) // 256) * 256 AS DOUBLE) AS fill_rate,
       |  CAST(SUM(CASE WHEN end_seq <> seq_id THEN 1 ELSE 0 END) AS BIGINT) AS n_fragmented,
       |  CAST(SUM(CASE WHEN end_seq <> seq_id THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS frag_rate
       |FROM e GROUP BY source ORDER BY source""".stripMargin

}

// Top-level (not trait members): `Encoders.product[GramBuf]` and the
// aggregator run inside task closures — as trait-nested classes they
// would need an outer pointer to the ExtQueries singleton, which is
// neither resolvable by the encoder nor serializable.

/** Single-buffer Gram/mean/count state for [[PcaGramAgg]]: D²
  * quantized product sums + D quantized mean sums + the row count,
  * all exact BIGINT — 33 KB regardless of corpus size.
  */
private[graft] case class GramBuf(sums: Array[Long], means: Array[Long],
    n: Long)

/** ONE-PASS map-side Gram accumulation as a bounded typed
  * `Aggregator` (the [[graft.ext.TopK]] precedent): each task folds
  * its rows into a single fixed D²+D+1-long buffer (every product
  * floor-quantized at 1e-6 BEFORE the add, so partials are
  * order-free and engine-exact), and the merge adds ≤one 33 KB
  * buffer per task through a SinglePartition exchange — the corpus
  * is read once, never exploded, never joined, never shuffled.
  * [[pcaGramSums]] is the declarative audit twin (same longs,
  * proven by spec).
  */
private[graft] object PcaGramAgg
    extends org.apache.spark.sql.expressions.Aggregator[Seq[Float], GramBuf, GramBuf] {
  private val D = ExtQueries.PcaDim
  override def zero: GramBuf =
    GramBuf(new Array[Long](D * D), new Array[Long](D), 0L)
  override def reduce(b: GramBuf, emb: Seq[Float]): GramBuf = {
    require(emb.length == D, s"embedding dim ${emb.length} != $D")
    val x = new Array[Double](D)
    var i = 0
    while (i < D) { x(i) = emb(i).toDouble; i += 1 }
    i = 0
    while (i < D) {
      val xi = x(i); val base = i * D
      var j = 0
      while (j < D) {
        b.sums(base + j) += math.floor(xi * x(j) * 1000000.0 + 0.5).toLong
        j += 1
      }
      b.means(i) += math.floor(xi * 1000000.0 + 0.5).toLong
      i += 1
    }
    GramBuf(b.sums, b.means, b.n + 1L)
  }
  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    var i = 0
    while (i < D * D) { a.sums(i) += b.sums(i); i += 1 }
    i = 0
    while (i < D) { a.means(i) += b.means(i); i += 1 }
    GramBuf(a.sums, a.means, a.n + b.n)
  }
  override def finish(r: GramBuf): GramBuf = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[GramBuf] =
    org.apache.spark.sql.Encoders.product[GramBuf]
  override def outputEncoder: org.apache.spark.sql.Encoder[GramBuf] =
    org.apache.spark.sql.Encoders.product[GramBuf]
}

/** Driver-side bounded PCA state shared by [[xPcaPower]] and
  * [[xWhitenTop]]: the collected Gram/mean quantized sums (D² longs
  * + D means — bounded regardless of corpus size), the exact
  * covariance accessor, and the power-iteration solve. Every
  * arithmetic step mirrors the oracle's relational iteration
  * term-for-term (per-term 1e-6 re-quantization, BIGINT norm², IEEE
  * ÷/√ on scalars) so the solved direction is bit-identical across
  * engines.
  */
private[graft] case class PcaState(n: Long, sMap: Map[(Long, Long), Long],
    mMap: Map[Long, Long]) {
  private val nD = n.toDouble
  def mu(i: Int): Double = mMap(i.toLong).toDouble / 1000000.0 / nD
  def c(i: Int, j: Int): Double =
    sMap((i.toLong, j.toLong)).toDouble / 1000000.0 / nD - mu(i) * mu(j)
  def solve(): Array[Double] = {
    var v = Array.fill(ExtQueries.PcaDim)(0.125)
    for (_ <- 1 to ExtQueries.PcaIters) {
      val w = Array.tabulate(ExtQueries.PcaDim) { i =>
        var acc = 0L; var j = 0
        while (j < ExtQueries.PcaDim) {
          acc += math.floor(c(i, j) * v(j) * 1000000.0 + 0.5).toLong; j += 1
        }
        acc
      }
      var n2 = 0L
      w.foreach(x => n2 += x * x)
      val norm = math.sqrt(n2.toDouble)
      v = w.map(_.toDouble / norm)
    }
    v
  }
}
