package graft.operators

import graft.Materialize.MaterializeOps

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Corpus-curation operators for training-data pipelines (builder-prompt
  * scale extension; the reference has no curation surface): deterministic
  * stratified sampling and temperature-based mixture weights.
  *
  * Sampling uses multiplicative integer hashing, not `rand()`: the keep
  * decision is a pure function of the row, so it is reproducible across
  * runs/engines (the DuckDB oracle computes the identical decision),
  * restartable mid-job, and stable under repartitioning — the properties a
  * 100 TB curation pass actually needs from "random".
  */
object Curation {

  /** Knuth's multiplicative constant; doc_id * K stays far inside a long
    * at any realistic corpus size (25M docs · 2.6e9 ≈ 6.7e16). */
  private[graft] val mixK = 2654435761L

  /** Per-language downsampling: the dominant language keeps 25 of every
    * 100 hash slots, the long tail keeps everything — the standard rebalance
    * before training. A narrow filter over the scan: no shuffle, pushdown
    * keeps untouched columns out of the read. */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Corpus.documents(s, dir)
      .select(col("doc_id"), col("lang"))
      .where(pmod(col("doc_id") * lit(mixK), lit(100L)) <
        when(col("lang") === "en", lit(25L)).otherwise(lit(100L)))

  val sampleStratifiedSql: String =
    s"""SELECT doc_id, lang
       |FROM documents
       |WHERE (doc_id * $mixK) % 100 <
       |  CASE WHEN lang = 'en' THEN 25 ELSE 100 END""".stripMargin

  /** The ONE per-language (n_docs, n_tokens) aggregate both mixture
    * queries start from — a change to the tokenizer filter reaches
    * weights and epochs together. */
  private def perLangTokens(s: SparkSession, dir: String): DataFrame =
    Corpus.documents(s, dir)
      .select(col("lang"),
        size(filter(TextAnalysis.tokensCol(col("text")),
          t => length(t) > 0)).cast("long").as("n"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))

  /** The α=0.3 temperature share over a `n_tokens` column, normalizer
    * as a window over the PER-LANGUAGE aggregate (a handful of rows —
    * the single partition is free), not a separate aggregate
    * crossJoined back, which would scan + tokenize the corpus twice.
    * ONE definition shared by [[mixWeights]] and [[mixEpochs]]. */
  private def tempWeight: Column = {
    val z = sum(pow(col("n_tokens").cast("double"), lit(0.3)))
      .over(org.apache.spark.sql.expressions.Window.partitionBy())
    pow(col("n_tokens").cast("double"), lit(0.3)) / z
  }

  /** Temperature-based mixture weights per language: weight ∝ tokens^0.3
    * (the standard multilingual rebalancing exponent), normalized to sum
    * to 1. One narrow token-count pass, one tiny per-language aggregate;
    * round(4) at the edge absorbs libm pow/division last-ulp differences
    * between engines (same policy as the tf-idf ln()). */
  def mixWeights(s: SparkSession, dir: String): DataFrame =
    perLangTokens(s, dir).select(col("lang"), col("n_docs"), col("n_tokens"),
      round(tempWeight, 4).as("weight"))

  /** End-to-end retention verdict — the query a curation pipeline actually
    * ships: per document, keep/drop plus the FIRST failing filter as the
    * reason (duplicate ≻ language ≻ quality, the conventional ordering: a
    * duplicate is dropped as a duplicate even if it is also low-quality).
    *
    * Single-pass shape: fingerprint, predicted language, and quality score
    * are all computed in ONE projection over the scan (they are pure
    * expressions of the text); the only exchanges are the keeper-group
    * aggregate on the fingerprint and the join back — at 100 TB that is
    * one shuffle of (fingerprint, doc_id) pairs, never a second scan. */
  def corpusRetention(s: SparkSession, dir: String): DataFrame = {
    val signals = Corpus.documents(s, dir).select(
      col("doc_id"),
      TextAnalysis.fingerprintCol(col("text")).as("fingerprint"),
      TextAnalysis.predictedLang(col("text")).as("predicted"),
      (TextAnalysis.qualityScore10(col("text")) >= TextAnalysis.qualityKeepCut)
        .as("q_keep"))
    // keeper as a window-min over the fingerprint — an aggregate + join
    // back would scan (and re-score) the documents twice; the window keeps
    // it at literally one scan and one exchange (plan-asserted)
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fingerprint"))
    val reason = when(col("doc_id") =!= col("keep_id"), "duplicate")
      .when(col("predicted") =!= "en", "language")
      .when(!col("q_keep"), "quality")
      .otherwise("retained")
    signals.withColumn("keep_id", min(col("doc_id")).over(wFp))
      .select(col("doc_id"), reason.as("reason"),
        (reason === "retained").as("retained"))
  }

  val corpusRetentionSql: String =
    s"""WITH sig AS (
       |  SELECT doc_id,
       |    ${TextAnalysis.fingerprintSql} AS fingerprint,
       |    (${TextAnalysis.langIdPredictedSql}) AS predicted,
       |    (${TextAnalysis.qualityScore10Sql}) >= 6 AS q_keep
       |  FROM documents),
       |keepers AS (SELECT fingerprint, MIN(doc_id) AS keep_id FROM sig GROUP BY 1),
       |r AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id <> keep_id THEN 'duplicate'
       |         WHEN predicted <> 'en' THEN 'language'
       |         WHEN NOT q_keep THEN 'quality'
       |         ELSE 'retained' END AS reason
       |  FROM sig JOIN keepers USING (fingerprint))
       |SELECT doc_id, reason, reason = 'retained' AS retained FROM r""".stripMargin

  /** [[perLangTokens]] / [[tempWeight]] in DuckDB SQL — the one copy
    * both mixture oracles reference. */
  private val perLangTokensSql: String =
    s"""t AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |    CAST(SUM(len(list_filter(${TextAnalysis.tokensSql}, t -> length(t) > 0)))
       |      AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY lang)""".stripMargin

  private val tempWeightSql: String =
    "power(n_tokens, 0.3) / SUM(power(n_tokens, 0.3)) OVER ()"

  val mixWeightsSql: String =
    s"""WITH $perLangTokensSql
       |SELECT lang, n_docs, n_tokens,
       |  round($tempWeightSql, 4) AS weight
       |FROM t""".stripMargin

  /** Per-source distribution-shift detector: KL(Pₛ ‖ P_corpus) over token
    * unigram distributions — the data-mixing QA check that flags a source
    * whose vocabulary drifted from the corpus (scraper broke, language
    * flipped, template flood) before it poisons a training mix.
    *
    * KL_s = (1/C_s) Σ_t c_st · ln((c_st·C)/(C_s·c_t)). The per-term
    * log-ratio is quantized to 10⁻⁴ (round(ln·10⁴) → BIGINT, same
    * technique as [[TextAnalysis.unigramLogprob]]) and the weighted sum
    * Σ c_st·q_st accumulates in BIGINTs — order-free, so the oracle
    * matches despite float-sum non-associativity. The ln argument is one
    * double division of exact integer products (c_st·C and C_s·c_t both
    * fit a long comfortably at any per-source token count this side of
    * 10¹⁸), identical in both engines.
    *
    * 100 TB shape: everything derives from ONE (source, token) count
    * aggregate (map-side partial) — per-source and per-token marginals
    * are second-level sums of it, vocabulary-bounded, broadcast back.
    * At web-scale vocab the broadcasts become top-K + OOV-bucket
    * semi-joins; nothing is ever quadratic. */
  def sourceKl(s: SparkSession, dir: String): DataFrame = {
    val toks = Corpus.documents(s, dir).select(col("source"),
        explode(TextAnalysis.tokensCol(col("text"))).as("token"))
      .where(length(col("token")) > 0)
    val cst = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("c_st"))
    val cs = cst.groupBy(col("source")).agg(sum(col("c_st")).as("c_s"))
    val ct = cst.groupBy(col("token")).agg(sum(col("c_st")).as("c_t"))
    val ctot = ct.agg(sum(col("c_t")).as("c"))
    val q = round(log((col("c_st") * col("c")).cast("double") /
        (col("c_s") * col("c_t")).cast("double")) * 10000.0, 0)
      .cast("long")
    cst.join(broadcast(ct), Seq("token"))
      .join(broadcast(cs), Seq("source"))
      .crossJoin(broadcast(ctot))
      .select(col("source"), col("c_s"), (col("c_st") * q).as("term"))
      .groupBy(col("source"), col("c_s"))
      .agg(sum(col("term")).as("st"))
      .select(col("source"), col("c_s").as("n_tokens"),
        (col("st").cast("double") / (col("c_s").cast("double") * 10000.0)).as("kl"))
  }

  // --- DSIR importance weights (dsir_logratio) --------------------------

  private val dsirBuckets = 256
  private val dsirTarget = "src1"

  /** DSIR-style importance weights (Xie et al. 2023, arXiv:2302.03169 —
    * Data Selection via Importance Resampling): score every document by
    * how much its hashed-feature profile resembles a TARGET corpus
    * relative to the RAW pool, the standard recipe for carving a
    * domain-matched training set out of a web crawl.
    *
    * Features are hashed token buckets — the first two hex chars of
    * md5(token), [[dsirBuckets]] buckets, engine-identical by the repo's
    * md5 convention — so the feature space is fixed-size no matter the
    * vocabulary (the paper's trick for web-scale). Bucket log-ratios use
    * add-one smoothing: λ(b) = ln[(ct_b+1)(R+B) / (cr_b+1)(T+B)]; a
    * document's log importance weight is Σ λ(bucket(tᵢ)) over token
    * positions. DSIR then resamples keeping docs ∝ exp(logw); the
    * deterministic score is what's emitted (the keep decision composes
    * with [[sampleStratified]]'s hash-slot sampling).
    *
    * Oracle exactness: the smoothed ratio's numerator/denominator are
    * formed as exact-integer-valued doubles (IEEE multiply is
    * exact-rounded, identical in both engines — BIGINT products would
    * overflow at web scale where R ~ 10¹²), one ln of one division is
    * quantized to 10⁻⁴ per BUCKET (256 values), and per-doc sums run
    * over those quantized longs — order-free, the [[sourceKl]] policy.
    *
    * 100 TB shape: one tokenize pass materialized via localCheckpoint
    * (three consumers — raw counts, target counts, per-doc rollup — would
    * otherwise re-tokenize the corpus three times); both bucket
    * aggregates are map-side combinable down to ≤ B rows; the λ table is
    * B rows broadcast; the per-doc rollup's exchange carries ~1 row per
    * doc thanks to partial aggregation over the doc-contiguous explode. */
  /** The PRE-CHECKPOINT (doc_id, source, b) token frame — split out so
    * PlanAuditSpec can pin the bucket projection (graft_md5_byte0, no
    * hex-rendering md5) that the checkpoint otherwise hides behind a
    * `Scan ExistingRDD` in every dumped plan (round-15 advice, low). */
  private[graft] def dsirTokenFrame(s: SparkSession, dir: String): DataFrame =
    Corpus.documents(s, dir)
      .select(col("doc_id"), col("source"),
        explode(TextAnalysis.tokensCol(col("text"))).as("token"))
      .where(length(col("token")) > 0)
      .select(col("doc_id"), col("source"),
        // first-digest-byte bucket — partitions tokens exactly like
        // substring(md5(token), 1, 2) (FunctionsSpec pins it), minus the
        // hex rendering per token occurrence; b is internal (the output
        // is per-doc logw), so the int spelling is free
        graft.functions.HashFunctions.md5Byte0Col(col("token")).as("b"))

  def dsirLogratio(s: SparkSession, dir: String): DataFrame = {
    val tok = dsirTokenFrame(s, dir).graftCheckpoint()
    val raw = tok.groupBy(col("b")).agg(count(lit(1)).as("cr"))
    val tgt = tok.where(col("source") === dsirTarget)
      .groupBy(col("b")).agg(count(lit(1)).as("ctg"))
    val buckets = raw.join(tgt, Seq("b"), "left")
      .select(col("b"), col("cr"), coalesce(col("ctg"), lit(0L)).as("ctg"))
    val totals = buckets.agg(sum(col("cr")).as("rtot"), sum(col("ctg")).as("ttot"))
    val lam = buckets.crossJoin(broadcast(totals))
      .select(col("b"),
        round(log(
          ((col("ctg") + 1).cast("double") * (col("rtot") + dsirBuckets).cast("double")) /
          ((col("cr") + 1).cast("double") * (col("ttot") + dsirBuckets).cast("double")))
          * 10000.0, 0).cast("long").as("qlam"))
    tok.join(broadcast(lam), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("qlam")).as("sq"))
      .select(col("doc_id"), col("n_tokens"),
        (col("sq").cast("double") / 10000.0).as("logw"))
  }

  val dsirLogratioSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, source, substring(md5(t), 1, 2) AS b FROM (
       |    SELECT doc_id, source, UNNEST(${TextAnalysis.tokensSql}) AS t FROM documents)
       |  WHERE length(t) > 0),
       |raw AS (SELECT b, COUNT(*) AS cr FROM tok GROUP BY 1),
       |tgt AS (SELECT b, COUNT(*) AS ctg FROM tok WHERE source = '$dsirTarget' GROUP BY 1),
       |bk AS (
       |  SELECT raw.b, cr, COALESCE(ctg, 0) AS ctg
       |  FROM raw LEFT JOIN tgt ON raw.b = tgt.b),
       |tot AS (SELECT SUM(cr) AS rtot, SUM(ctg) AS ttot FROM bk),
       |lam AS (
       |  SELECT b,
       |    CAST(round(ln((CAST(ctg + 1 AS DOUBLE) * CAST(rtot + $dsirBuckets AS DOUBLE))
       |      / (CAST(cr + 1 AS DOUBLE) * CAST(ttot + $dsirBuckets AS DOUBLE)))
       |      * 10000.0, 0) AS BIGINT) AS qlam
       |  FROM bk CROSS JOIN tot)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       |  CAST(SUM(qlam) AS DOUBLE) / 10000.0 AS logw
       |FROM tok JOIN lam USING (b)
       |GROUP BY doc_id""".stripMargin

  val sourceKlSql: String =
    s"""WITH tok AS (
       |  SELECT source, t AS token FROM (
       |    SELECT source, UNNEST(${TextAnalysis.tokensSql}) AS t FROM documents)
       |  WHERE length(t) > 0),
       |cst AS (SELECT source, token, COUNT(*) AS c_st FROM tok GROUP BY 1, 2),
       |cs AS (SELECT source, SUM(c_st) AS c_s FROM cst GROUP BY 1),
       |ct AS (SELECT token, SUM(c_st) AS c_t FROM cst GROUP BY 1),
       |ctot AS (SELECT SUM(c_t) AS c FROM ct),
       |terms AS (
       |  SELECT source, c_s,
       |    c_st * CAST(round(ln(CAST(c_st * c AS DOUBLE)
       |      / CAST(c_s * c_t AS DOUBLE)) * 10000.0, 0) AS BIGINT) AS term
       |  FROM cst JOIN ct USING (token) JOIN cs USING (source) CROSS JOIN ctot)
       |SELECT source, CAST(c_s AS BIGINT) AS n_tokens,
       |  CAST(SUM(term) AS DOUBLE) / (c_s * 10000.0) AS kl
       |FROM terms GROUP BY source, c_s""".stripMargin

  /** The composed end-to-end curation funnel — the report a pretraining
    * data pipeline actually publishes: per SOURCE, how many documents went
    * in and where they fell out, stage by stage (exact-duplicate →
    * language → quality → eval-set contamination), plus the retained
    * token budget. Drop attribution is first-failing-filter, the same
    * precedence [[corpusRetention]] pins per document; contamination uses
    * [[Dedup.contamination]]'s convention (doc_id < 10 is the held-out
    * benchmark, so the curated corpus is doc_id >= 10).
    *
    * 100 TB shape: TWO scans of the corpus — one projection computing
    * every per-doc signal (fingerprint, language, quality, token count)
    * with a single (fingerprint)-exchange window for the keeper id, and
    * one 13-gram explode for the contamination semi-join (gram
    * candidates can't come out of the first scan's projection without
    * exploding it too). The contaminated-id set joins back via broadcast
    * — eval-suite overlap is a tiny fraction of any real corpus; at a
    * scale where it isn't, drop the hint and this degrades to a shuffle
    * join on doc_id, nothing else changes. The final per-source rollup
    * is a map-side-combinable aggregate over single-digit groups. */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    val signals = Corpus.documents(s, dir).where(col("doc_id") >= 10)
      .select(
        col("doc_id"), col("source"),
        TextAnalysis.fingerprintCol(col("text")).as("fingerprint"),
        TextAnalysis.predictedLang(col("text")).as("predicted"),
        (TextAnalysis.qualityScore10(col("text")) >= TextAnalysis.qualityKeepCut)
          .as("q_keep"),
        size(filter(TextAnalysis.tokensCol(col("text")),
          t => length(t) > 0)).cast("long").as("n_tokens"))
    val wFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fingerprint"))
    val contaminated = Dedup.contamination(s, dir)
    val reason = when(col("doc_id") =!= col("keep_id"), "duplicate")
      .when(col("predicted") =!= "en", "language")
      .when(!col("q_keep"), "quality")
      .when(col("contaminated"), "contaminated")
      .otherwise("retained")
    signals
      .withColumn("keep_id", min(col("doc_id")).over(wFp))
      .join(broadcast(contaminated), Seq("doc_id"), "left")
      .withColumn("reason", reason)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs_in"),
        sum(when(col("reason") === "duplicate", 1L).otherwise(0L)).as("drop_duplicate"),
        sum(when(col("reason") === "language", 1L).otherwise(0L)).as("drop_language"),
        sum(when(col("reason") === "quality", 1L).otherwise(0L)).as("drop_quality"),
        sum(when(col("reason") === "contaminated", 1L).otherwise(0L)).as("drop_contaminated"),
        sum(when(col("reason") === "retained", 1L).otherwise(0L)).as("docs_kept"),
        sum(when(col("reason") === "retained", col("n_tokens")).otherwise(0L)).as("tokens_kept"))
  }

  val curationPipelineSql: String =
    s"""WITH sig AS (
       |  SELECT doc_id, source,
       |    ${TextAnalysis.fingerprintSql} AS fingerprint,
       |    (${TextAnalysis.langIdPredictedSql}) AS predicted,
       |    (${TextAnalysis.qualityScore10Sql}) >= 6 AS q_keep,
       |    CAST(len(list_filter(${TextAnalysis.tokensSql}, t -> length(t) > 0))
       |      AS BIGINT) AS n_tokens
       |  FROM documents WHERE doc_id >= 10),
       |keepers AS (SELECT fingerprint, MIN(doc_id) AS keep_id FROM sig GROUP BY 1),
       |contam AS (
       |  SELECT DISTINCT doc_id FROM (${Dedup.gramsSql("doc_id >= 10")})
       |  WHERE gram IN (SELECT DISTINCT gram FROM (${Dedup.gramsSql("doc_id < 10")}))),
       |r AS (
       |  SELECT source, n_tokens,
       |    CASE WHEN doc_id <> keep_id THEN 'duplicate'
       |         WHEN predicted <> 'en' THEN 'language'
       |         WHEN NOT q_keep THEN 'quality'
       |         WHEN doc_id IN (SELECT doc_id FROM contam) THEN 'contaminated'
       |         ELSE 'retained' END AS reason
       |  FROM sig JOIN keepers USING (fingerprint))
       |SELECT source,
       |  COUNT(*) AS docs_in,
       |  CAST(SUM(CASE WHEN reason = 'duplicate' THEN 1 ELSE 0 END) AS BIGINT) AS drop_duplicate,
       |  CAST(SUM(CASE WHEN reason = 'language' THEN 1 ELSE 0 END) AS BIGINT) AS drop_language,
       |  CAST(SUM(CASE WHEN reason = 'quality' THEN 1 ELSE 0 END) AS BIGINT) AS drop_quality,
       |  CAST(SUM(CASE WHEN reason = 'contaminated' THEN 1 ELSE 0 END) AS BIGINT) AS drop_contaminated,
       |  CAST(SUM(CASE WHEN reason = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
       |  CAST(SUM(CASE WHEN reason = 'retained' THEN n_tokens ELSE 0 END) AS BIGINT) AS tokens_kept
       |FROM r GROUP BY source""".stripMargin

  /** Per-source corpus report card — the one-row-per-source summary a
    * curation run publishes alongside its output (the "data card" every
    * released training corpus carries): document and token volume, mean
    * heuristic quality, exact-duplicate exposure, and the dominant
    * detected language.
    *
    * Single-pass shape: every per-doc feature (token count, quality,
    * predicted language, content fingerprint) is one projection over the
    * scan, localCheckpoint'ed for its three consumers — the fingerprint
    * count join (the dedup shuffle the retention verdict already pays),
    * the per-source rollup, and the per-(source, language) mode. At
    * 100 TB: one corpus scan, one fingerprint shuffle, two narrow
    * aggregates over the checkpointed per-doc frame; the language mode's
    * argmax is `max(struct(cnt, lang))` so its exchange carries one row
    * per (source, language). */
  def sourceReport(s: SparkSession, dir: String): DataFrame = {
    val perDoc = Corpus.documents(s, dir).select(col("source"),
        size(filter(TextAnalysis.tokensCol(col("text")),
          t => length(t) > 0)).cast("long").as("n_tok"),
        TextAnalysis.qualityScore10(col("text")).as("q"),
        TextAnalysis.predictedLang(col("text")).as("pred"),
        TextAnalysis.fingerprintCol(col("text")).as("fp"))
      .graftCheckpoint() // scan+featurize once for the three consumers
    val fpCnt = perDoc.groupBy(col("fp")).agg(count(lit(1)).as("c"))
    val main = perDoc.join(fpCnt, Seq("fp"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        round(sum(col("q")).cast("double") / count(lit(1)).cast("double"), 4)
          .as("mean_quality"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
    val mode = perDoc.groupBy(col("source"), col("pred"))
      .agg(count(lit(1)).as("pc"))
      .groupBy(col("source"))
      .agg(max(struct(col("pc"), col("pred"))).as("m"))
      .select(col("source"), col("m.pred").as("top_lang"))
    main.join(broadcast(mode), Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("mean_quality"), col("n_dup_docs"),
        round(col("n_dup_docs").cast("double") / col("n_docs").cast("double"), 6)
          .as("dup_rate"),
        col("top_lang"))
  }

  val sourceReportSql: String =
    s"""WITH per_doc AS (
       |  SELECT source,
       |    CAST(len(list_filter(${TextAnalysis.tokensSql}, t -> length(t) > 0)) AS BIGINT) AS n_tok,
       |    (${TextAnalysis.qualityScore10Sql}) AS q,
       |    (${TextAnalysis.langIdPredictedSql}) AS pred,
       |    ${TextAnalysis.fingerprintSql} AS fp
       |  FROM documents),
       |fp_cnt AS (SELECT fp, COUNT(*) AS c FROM per_doc GROUP BY 1),
       |main AS (
       |  SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       |    round(CAST(SUM(q) AS DOUBLE) / COUNT(*), 4) AS mean_quality,
       |    CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs
       |  FROM per_doc JOIN fp_cnt USING (fp) GROUP BY 1),
       |mode AS (
       |  SELECT source, pred AS top_lang FROM (
       |    SELECT source, pred,
       |      ROW_NUMBER() OVER (PARTITION BY source
       |        ORDER BY COUNT(*) DESC, pred DESC) AS rn
       |    FROM per_doc GROUP BY source, pred) WHERE rn = 1)
       |SELECT source, n_docs, n_tokens, mean_quality, n_dup_docs,
       |  round(CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS dup_rate,
       |  top_lang
       |FROM main JOIN mode USING (source)""".stripMargin

  // ------------------------------------------------------------------
  // Budget / epochs planner: [[mixWeights]] says WHAT share each
  // language should get; this says what that share MEANS against a
  // concrete training-token budget — allocated tokens, epochs over the
  // available data, and the repeat cap at ~4 epochs beyond which
  // repeated data stops helping (Muennighoff et al., arXiv:2305.16264).
  // An under-represented language that the temperature upsamples past
  // the cap shows up here as epochs_raw > epochs and an
  // effective-token shortfall — the planning signal to go collect more
  // of it rather than pretend the temperature weight is achievable.

  /** Training budget as a multiple of the corpus token count. */
  private[graft] val budgetMult = 4.0

  /** Epochs beyond which repeating data stops helping (arXiv:2305.16264). */
  private[graft] val epochCap = 4.0

  /** 100 TB shape: identical to [[mixWeights]] — one map-side-combinable
    * per-language aggregate; every derived column is a window over the
    * handful of language rows. All doubles derive from exact BIGINT
    * counts through the same IEEE expression tree as the oracle. */
  def mixEpochs(s: SparkSession, dir: String): DataFrame = {
    val w0 = org.apache.spark.sql.expressions.Window.partitionBy()
    val tot = sum(col("n_tokens")).over(w0)
    val weight = tempWeight
    val alloc = lit(budgetMult) * tot.cast("double") * weight
    val epochsRaw = alloc / col("n_tokens").cast("double")
    perLangTokens(s, dir).select(col("lang"), col("n_tokens"),
      round(weight, 4).as("weight"),
      round(epochsRaw, 4).as("epochs_raw"),
      round(least(epochsRaw, lit(epochCap)), 4).as("epochs"),
      round(least(alloc, lit(epochCap) * col("n_tokens").cast("double")), 0)
        .cast("long").as("effective_tokens"))
  }

  // ------------------------------------------------------------------
  // Deterministic train/validation/test split: assignment by hash of
  // the STABLE document id (never rand(), never row position), so the
  // split is replayable across runs, stable under corpus growth (a new
  // doc never flips an old doc's split), and requires zero coordination
  // — each of 10,000 executors computes the same verdict for the same
  // doc. Per-mille cut 980/10/10.

  private[graft] val valCutPermille = 980L
  private[graft] val testCutPermille = 990L

  /** One codegen'd projection over the scan — ZERO exchanges at any
    * corpus size. The hash int comes from the first 4 md5 hex chars
    * (`conv` here ≡ the oracle's nibble arithmetic). */
  def trainSplit(s: SparkSession, dir: String): DataFrame = {
    val h = md5(concat(col("doc_id").cast("string"), lit("|split")))
    val bucket = (conv(substring(h, 1, 4), 16, 10).cast("long") % 1000L)
      .as("bucket")
    Corpus.documents(s, dir).select(col("doc_id"), bucket)
      .select(col("doc_id"), col("bucket"),
        when(col("bucket") < valCutPermille, lit("train"))
          .when(col("bucket") < testCutPermille, lit("validation"))
          .otherwise(lit("test")).as("split"))
  }

  val trainSplitSql: String = {
    val h = "md5(CAST(doc_id AS VARCHAR) || '|split')"
    val nib = (i: Int) => s"(strpos('0123456789abcdef', substring($h, $i, 1)) - 1)"
    val b = s"((${nib(1)} * 4096 + ${nib(2)} * 256 + ${nib(3)} * 16 + ${nib(4)}) % 1000)"
    s"""SELECT doc_id, CAST($b AS BIGINT) AS bucket,
       |  CASE WHEN $b < $valCutPermille THEN 'train'
       |       WHEN $b < $testCutPermille THEN 'validation'
       |       ELSE 'test' END AS split
       |FROM documents""".stripMargin
  }

  val mixEpochsSql: String =
    s"""WITH $perLangTokensSql,
       |w AS (SELECT lang, n_tokens,
       |    $tempWeightSql AS wt,
       |    SUM(n_tokens) OVER () AS tot
       |  FROM t)
       |SELECT lang, n_tokens,
       |  round(wt, 4) AS weight,
       |  round($budgetMult * tot * wt / n_tokens, 4) AS epochs_raw,
       |  round(least($budgetMult * tot * wt / n_tokens, $epochCap), 4) AS epochs,
       |  CAST(round(least($budgetMult * tot * wt, $epochCap * n_tokens), 0)
       |    AS BIGINT) AS effective_tokens
       |FROM w""".stripMargin

  // ------------------------------------------------------------------
  // Vocabulary-overlap matrix: pairwise Jaccard of the distinct-token
  // SETS of each source — the third leg of the source-redundancy
  // toolkit next to `dup_source_matrix` (shared near-dup documents)
  // and `source_kl` (distribution divergence): two sources can share
  // zero documents and diverge in token frequencies yet still cover
  // the same vocabulary (or vice versa).
  //
  // 100 TB shape: one distinct (source, token) frame (vocab-bounded,
  // NOT corpus-bounded) self-joined on token — per-token fan-out is
  // at most sources², so the pair stream is Σ_token df² ≤ S² · |vocab|,
  // bounded by the source count, never by document volume. The df-cap
  // below (the `winnow_pairs` trick) bounds even that: tokens present
  // in more than [[vocabMaxSourceDf]] sources — at a 1,000-source mix
  // the universal tokens would each emit ~10⁶ pair rows — are dropped
  // from the WHOLE universe (sizes and intersection alike: the
  // self-consistent capped-universe Jaccard discipline minhash_recall
  // uses), which loses nothing discriminating: a token every source
  // has says nothing about which two sources overlap. The cap is far
  // above this corpus's S = 20, so here capped ≡ uncapped
  // (CurationOpsSpec pins it).

  private[graft] val vocabMaxSourceDf = 256

  def vocabOverlap(s: SparkSession, dir: String): DataFrame =
    vocabOverlapImpl(s, dir, vocabMaxSourceDf)

  private[graft] def vocabOverlapImpl(
      s: SparkSession, dir: String, maxDf: Int): DataFrame = {
    // the expensive pass (tokenize + explode + distinct) feeds BOTH the
    // df aggregate and the semi-join left side — materialize it once;
    // without this the corpus is tokenized twice (localCheckpoint, not
    // cache: the minhashLshPairs rule)
    val st0 = Corpus.documents(s, dir)
      .select(col("source"),
        explode(TextAnalysis.tokensCol(col("text"))).as("token"))
      .where(length(col("token")) > 0)
      .distinct()
      .graftCheckpoint()
    val sdf = st0.groupBy(col("token")).agg(count(lit(1)).as("sdf"))
    // capped universe, materialized once for its three consumers (sizes
    // + both self-join sides)
    val st = st0.join(sdf.where(col("sdf") <= maxDf).select(col("token")),
        Seq("token"), "left_semi")
      .graftCheckpoint()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val inter = st.as("a").join(st.as("b"),
        col("a.token") === col("b.token") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n").as("na"))),
        Seq("source_a"))
      .join(broadcast(sizes.select(col("source").as("source_b"), col("n").as("nb"))),
        Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("n_inter"),
        round(col("n_inter").cast("double") /
          (col("na") + col("nb") - col("n_inter")).cast("double"), 6)
          .as("jaccard"))
  }

  /** Weighted sampling grid: priorities derive from a 2^20-slot hash
    * uniform, the same multiplicative-hash determinism discipline as
    * [[sampleStratified]]. */
  private[graft] val sampleM = 1048576L
  /** Per-source sample size — small enough to be non-vacuous on the gate
    * corpus (25 docs/source at sf0.01), and the output stays at
    * k · |sources| rows at ANY corpus scale. */
  private[graft] val sampleK = 8

  /** Weight-proportional sampling without replacement, k docs per source
    * (Efraimidis–Spirakis: keep the k largest u^(1/w) — equivalently the
    * k largest ln(u)/w — with weight w = n_chars, so longer documents are
    * proportionally more likely to be picked). u is hash-derived, not
    * `rand()`: the pick is a pure function of the row ([[sampleStratified]]'s
    * reproducibility discipline), so the oracle recomputes it exactly.
    *
    * 100 TB shape: ONE narrow scan computes the priority in codegen; the
    * per-source top-k runs as a bounded-state Aggregator
    * ([[graft.functions.SampleFunctions.weightedTopK]]) with map-side
    * partials — the shuffle carries ≤ 2k entries per (partition, source),
    * never the corpus. A window row_number would shuffle and sort every
    * row for a k-row answer.
    *
    * Cross-engine float discipline: priorities go through ln(), which can
    * diverge from DuckDB's libm in the last ulp. The ordering (and hence
    * the picked SET and ranks) only flips if two priorities sit within
    * ulp of each other; `PipelineOpsSpec` gates the minimum adjacent gap
    * among each source's top k+1 at ≥ 1e-9 on the gate corpora (measured:
    * ≥ 2.6e-6 at sf0.01, ≥ 8.1e-8 at sf0.1) — the `unigram_logprob`
    * executable-boundary-check precedent. The float itself never reaches
    * the output (rank, not priority, is emitted). */
  def weightedSample(s: SparkSession, dir: String): DataFrame =
    weightedSampleFrom(Corpus.documents(s, dir))

  /** The Efraimidis–Spirakis priority as a column: ln(hash-uniform)/w. */
  private def weightedSamplePri: Column =
    log(((col("doc_id") * lit(mixK)) % lit(sampleM) + lit(1L))
        .cast("double") / lit((sampleM + 1).toDouble)) /
      col("n_chars").cast("double")

  /** Shared batch/stream pipeline over a (source, doc_id, n_chars) frame
    * — on a streaming frame the bounded aggregator buffer IS the
    * state-store value ([[graft.streaming.TopTermsStream]]'s discipline),
    * so one definition serves both and the equivalence spec cannot
    * drift. */
  private[graft] def weightedSampleFrom(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoders
    val topk = udaf(graft.functions.SampleFunctions.weightedTopK(sampleK),
      Encoders.product[graft.functions.SampleFunctions.WsEntry])
    docs
      .where(col("n_chars") > 0)
      .select(col("source"), weightedSamplePri.as("pri"), col("doc_id"))
      .groupBy(col("source"))
      .agg(topk(col("pri"), col("doc_id")).as("picks"))
      .select(col("source"), posexplode(col("picks")))
      .select(col("source"), col("col.id").as("doc_id"),
        (col("pos") + 1).cast("long").as("rk"))
  }

  val weightedSampleSql: String =
    s"""WITH k AS (
       |  SELECT source, doc_id,
       |    ln(((doc_id * $mixK) % $sampleM + 1) / ${sampleM + 1}.0) / n_chars AS pri
       |  FROM documents WHERE n_chars > 0)
       |SELECT source, doc_id, rk FROM (
       |  SELECT source, doc_id,
       |    row_number() OVER (PARTITION BY source ORDER BY pri DESC, doc_id) AS rk
       |  FROM k)
       |WHERE rk <= $sampleK""".stripMargin

  /** Synthetic "next snapshot" offset for added docs — far above any real
    * doc_id at every SF. */
  private[graft] val diffAddOffset = 1000000000L

  /** Corpus snapshot diff — the audit a versioned data pipeline publishes
    * between two corpus versions: per doc_id, `added` / `removed` /
    * `changed` / `unchanged`, by RAW content hash (raw, not
    * dedup-normalized: a formatting-only edit IS a change to the stored
    * corpus, even when dedup would treat the texts as equal).
    *
    * Gate derivation ([[Dedup.dedupIncremental]]'s replay convention):
    * the next snapshot drops id % 17 docs, whitespace-inflates id % 13
    * texts, and re-adds id % 19 docs under `id + diffAddOffset` — all
    * four verdicts non-vacuous on the gate corpus, removal winning over
    * change for ids divisible by both (the doc is simply absent). The
    * operator surface ([[corpusDiffFrom]]) takes both snapshot frames
    * as-is.
    *
    * 100 TB shape: each side reduces to (doc_id, 16-byte md5) in its own
    * scan projection; the only exchange is ONE co-partitioned full-outer
    * join on doc_id. Text never shuffles; with both snapshots bucketed by
    * doc_id (the layout a versioned corpus store would keep) even that
    * exchange disappears. */
  def corpusDiff(s: SparkSession, dir: String): DataFrame = {
    val base = Corpus.documents(s, dir).select(col("doc_id"), col("text"))
    val next = base.where(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, regexp_replace(col("text"), " ", "  "))
          .otherwise(col("text")).as("text"))
      .unionAll(base.where(col("doc_id") % 19 === 0)
        .select((col("doc_id") + diffAddOffset).as("doc_id"), col("text")))
    corpusDiffFrom(base, next)
  }

  /** The operator surface: verdict per doc_id across two snapshot frames
    * of (doc_id, text). */
  private[graft] def corpusDiffFrom(base: DataFrame, next: DataFrame): DataFrame = {
    val b = base.select(col("doc_id"),
      graft.functions.HashFunctions.md5BinCol(col("text")).as("b_fp"))
    val n = next.select(col("doc_id"),
      graft.functions.HashFunctions.md5BinCol(col("text")).as("n_fp"))
    b.join(n, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        when(col("n_fp").isNull, lit("removed"))
          .when(col("b_fp").isNull, lit("added"))
          .when(col("b_fp") =!= col("n_fp"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
  }

  val corpusDiffSql: String =
    s"""WITH base AS (SELECT doc_id, md5(text) AS fp FROM documents),
       |nxt AS (
       |  SELECT doc_id,
       |    md5(CASE WHEN doc_id % 13 = 0 THEN replace(text, ' ', '  ')
       |             ELSE text END) AS fp
       |  FROM documents WHERE doc_id % 17 <> 0
       |  UNION ALL
       |  SELECT doc_id + $diffAddOffset, md5(text)
       |  FROM documents WHERE doc_id % 19 = 0)
       |SELECT COALESCE(b.doc_id, n.doc_id) AS doc_id,
       |  CASE WHEN n.fp IS NULL THEN 'removed'
       |       WHEN b.fp IS NULL THEN 'added'
       |       WHEN b.fp <> n.fp THEN 'changed'
       |       ELSE 'unchanged' END AS status
       |FROM base b FULL OUTER JOIN nxt n ON b.doc_id = n.doc_id""".stripMargin

  val vocabOverlapSql: String =
    s"""WITH st0 AS (
       |  SELECT DISTINCT source, t AS token FROM (
       |    SELECT source, UNNEST(${TextAnalysis.tokensSql}) AS t FROM documents)
       |  WHERE length(t) > 0),
       |sdf AS (SELECT token, COUNT(*) AS sdf FROM st0 GROUP BY 1),
       |st AS (
       |  SELECT st0.source, st0.token FROM st0
       |  JOIN sdf ON st0.token = sdf.token
       |  WHERE sdf.sdf <= $vocabMaxSourceDf),
       |sizes AS (SELECT source, COUNT(*) AS n FROM st GROUP BY 1),
       |inter AS (
       |  SELECT a.source AS source_a, b.source AS source_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_inter
       |  FROM st a JOIN st b ON a.token = b.token AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT source_a, source_b, n_inter,
       |  round(CAST(n_inter AS DOUBLE) / (za.n + zb.n - n_inter), 6) AS jaccard
       |FROM inter
       |JOIN sizes za ON inter.source_a = za.source
       |JOIN sizes zb ON inter.source_b = zb.source""".stripMargin
}
