package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stats-driven index/path routing: ONE user-facing entry point per
  * scan/index twin family that picks the leg itself, from stored index
  * stats plus a static cost model — the [[RangeJoin.autoBandWidth]]
  * discipline (stats → decision → plan) applied to the four retrieval
  * families that, until now, documented their crossovers in prose and
  * made the caller choose:
  *
  *  - BM25: full corpus tokenize ([[Retrieval.bm25Topk]]) vs term-pruned
  *    postings scan ([[PostingsIndex.query]]) — same oracle.
  *  - Phrase: corpus tokenize + slot verify ([[Retrieval.phraseSearch]])
  *    vs index candidates + text verify
  *    ([[PostingsIndex.phraseSearchIndexed]]) vs positions-only
  *    ([[PostingsIndex.phraseSearchPositional]]) — same oracle.
  *  - ANN: inline IVF re-deriving cells per run ([[Similarity.annIvf]])
  *    vs the persisted cell-partitioned index ([[IvfIndex.query]]) —
  *    same oracle.
  *  - Hybrid RRF: the indexed fusion ([[Retrieval.hybridRrfIndexed]])
  *    vs its full-scan twin ([[Retrieval.hybridRrfScanned]]) — same
  *    oracle (the scanned twin exists exactly so this family has a
  *    semantics-identical pair to route between).
  *
  * COST MODEL (deliberately coarse — the router only has to get the
  * ORDER of two costs right, and the measured evidence in BASELINE.md
  * round 12 shows the sides differ by multiples away from the
  * crossovers):
  *
  *  - bm25/phrase decide in MILLISECONDS with three measured machine
  *    constants (fixed pass cost, per-token marginal, per-superblock
  *    file open) — the per-partition term is load-bearing: it is what
  *    correctly routes a FRAGMENTED index (superBits sized for a corpus
  *    that then grew 10×) back to the linear scan, the one measured
  *    point where the index loses (Bm25CrossoverProbe + SbSizeProbe);
  *  - ann/hybrid decide in token-units: a full text scan costs
  *    `total_len` (every token tokenized whether or not it matters), a
  *    term-pruned postings read costs Σ df, vector work converts at
  *    [[vecUnitCost]] units per (vector × centroid) dot — the inline
  *    leg pays `nVec · nCells` assignment dots every run, the indexed
  *    leg reads `nProbe/nCells` of the members table — and every EXTRA
  *    sequential bounded driver job an indexed path needs costs
  *    [[jobOverheadTokens]] units (conf-overridable,
  *    `spark.graft.router.jobOverheadTokens`: a machine property, not a
  *    data property). Calibrated against the round-12 crossover probes,
  *    the hybrid decision matches the measured winner at every point
  *    (indexed everywhere the indexes exist — the scanned twin re-pays
  *    tokenize + assignment per run), and the job term is what routes
  *    genuinely tiny vector corpora to the inline plan.
  *
  * The stats come from the indexes themselves (blockstats total_len,
  * termstats df, members/centroids row counts — the index IS the stats
  * store; all probes are driver-bounded metadata reads), so the choice
  * flips when the data flips: the gate corpora land on different legs
  * per family and per scale factor, and `RouterSpec` pins both
  * directions of every decision on synthetic stats AND end-to-end on
  * synthetic corpora with the plan shape asserted. */
object Router {

  /** Units per (vector × centroid) double-dot relative to one token of
    * text-scan work: a 64-dim dot is ~64 FMAs vs a token's split+hash. */
  private[graft] val vecUnitCost = 16L

  /** Extra sequential bounded driver jobs the indexed hybrid stack pays
    * per run (profile collect, df probe, probe-list builds — the
    * HybridProbe attribution, BASELINE.md). */
  private[graft] val hybridDriverJobs = 6L

  private val overheadKey = "spark.graft.router.jobOverheadTokens"

  /** Token-units charged per extra sequential driver job of an indexed
    * path (ann/hybrid deciders) — ~0.2 s of scheduler latency expressed
    * at the measured small-corpus scan rate (~60K token-units/s,
    * Bm25CrossoverProbe round 12). At production corpus sizes this term
    * is noise; at gate sizes it is the honest reason a scan can win. */
  private[graft] def jobOverheadTokens(s: SparkSession): Long =
    s.conf.getOption(overheadKey).map(_.toLong).getOrElse(12000L)

  /** A routing decision: the chosen leg plus both modeled costs (kept
    * for explainability — `reason` renders the comparison; the unit is
    * per-family: milliseconds for bm25/phrase, token-units for
    * ann/hybrid). */
  final case class Choice(leg: String, scanCost: Long, indexedCost: Long) {
    def reason: String = s"$leg: scan≈$scanCost vs indexed≈$indexedCost"
  }

  // ---- pure deciders (unit-testable on synthetic stats) ----

  // bm25/phrase model in MILLISECONDS, three machine constants measured
  // by Bm25CrossoverProbe + SbSizeProbe (BASELINE round 12) — this is
  // the one family where a single marginal rate cannot match the
  // measurements, because the indexed side's real cost has a
  // PARTITION-COUNT term: every superblock's file must be opened even
  // when the term prune discards its row groups, and at ~9 ms per
  // partition a fragmented index (superBits sized for a small corpus
  // that then grew 10×) loses to a linear scan of a still-small corpus
  // — exactly what the sf1 gate index measures (205 sbs: indexed 2.6 s
  // vs scan 1.7 s; rebuilt at superBits=8, 13 sbs: 0.5 s). The fix at
  // scale is layout (bigger superblocks / compaction), but the router
  // must be honest about the index that EXISTS.
  private val scanFixedMs = 800L   // corpus tokenize pass, fixed
  private val indexFixedMs = 450L  // index probe session, fixed
  private val tokenNanos = 300L    // per scanned+tokenized token
  private val sbOpenMs = 9L        // per superblock partition opened

  /** BM25: term-pruned postings read (Σ df rows + one file open per
    * superblock) vs the full corpus tokenize (total_len tokens). */
  private[graft] def decideBm25(
      totalLen: Long, sumDf: Long, nSb: Long): Choice = {
    val scan = scanFixedMs + totalLen * tokenNanos / 1000000L
    val idx = indexFixedMs + sumDf * tokenNanos / 1000000L + nSb * sbOpenMs
    Choice(if (idx < scan) "indexed" else "scan", scan, idx)
  }

  /** Phrase: positions-only wins whenever the positional payload exists
    * (its read is the same Σ df order as the candidate path MINUS any
    * corpus access — measured fastest at every SF, BASELINE.md); else
    * the candidate path vs the full scan is the BM25 comparison. */
  private[graft] def decidePhrase(
      hasPositions: Boolean, totalLen: Long, sumDf: Long,
      nSb: Long): Choice =
    if (hasPositions) Choice("positional", totalLen, sumDf)
    else decideBm25(totalLen, sumDf, nSb)

  /** ANN: the inline leg re-pays `nVec · nCells` assignment dots every
    * run; the index reads `nProbe/nCells` of the members. */
  private[graft] def decideAnn(
      nVec: Long, nCells: Long, nProbe: Long, ovh: Long): Choice = {
    val scan = nVec * nCells * vecUnitCost
    val idx = nVec * nProbe * vecUnitCost / math.max(nCells, 1L) + ovh
    Choice(if (idx < scan) "indexed" else "scan", scan, idx)
  }

  /** Hybrid: scan = corpus tokenize (lexical leg) + inline assignment
    * (vector leg); indexed = probed-cell read + [[hybridDriverJobs]]
    * job overheads (the lexical leg's Σ df is profile-bounded by
    * construction — 25 lowest-df terms × 10 queries — and charged as
    * negligible next to the job term). */
  private[graft] def decideHybrid(
      totalLen: Long, nVec: Long, nCells: Long, nProbe: Long,
      ovh: Long): Choice = {
    val scan = totalLen + nVec * nCells * vecUnitCost
    val idx = nVec * nProbe * vecUnitCost / math.max(nCells, 1L) +
      hybridDriverJobs * ovh
    Choice(if (idx < scan) "indexed" else "scan", scan, idx)
  }

  // ---- stored-stats probes (driver-bounded metadata reads) ----

  /** Corpus token count from the postings index's blockstats — the
    * index carries its own ANALYZE. */
  private[graft] def totalLenOf(s: SparkSession, pidx: String): Long =
    s.read.parquet(s"$pidx/blockstats")
      .agg(coalesce(sum(col("total_len")), lit(0L))).collect()(0).getLong(0)

  /** Σ df over the probe terms from the stored termstats — a
    * term-pruned, superblock-count-bounded read. */
  private[graft] def sumDfOf(
      s: SparkSession, pidx: String, terms: Seq[String]): Long =
    s.read.parquet(s"$pidx/termstats")
      .where(col("term").isin(terms: _*))
      .agg(coalesce(sum(col("df_sb")), lit(0L))).collect()(0).getLong(0)

  /** (total_len, superblock count) from blockstats in ONE bounded
    * aggregate — the two stats every postings-side decision needs,
    * probed together so the decision costs one job, not two. */
  private[graft] def postingsMetaOf(
      s: SparkSession, pidx: String): (Long, Long) = {
    val r = s.read.parquet(s"$pidx/blockstats")
      .agg(coalesce(sum(col("total_len")), lit(0L)), count(lit(1)))
      .collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** (nVec, nCells) from the IVF index — parquet footer row counts, no
    * data pages read. */
  private[graft] def ivfMetaOf(s: SparkSession, vidx: String): (Long, Long) =
    (s.read.parquet(s"$vidx/members").count(),
      s.read.parquet(s"$vidx/centroids").count())

  // ---- routed entry points (oracle-gated as *_auto) ----

  /** `bm25_auto`: shares `bm25_topk`'s oracle — identical rows either
    * leg (the twins' standing contract). */
  def bm25Auto(s: SparkSession, dir: String): DataFrame =
    bm25AutoOn(s, dir, PostingsIndex.ensureLifecycleIndex(s, dir))

  private[graft] def bm25AutoOn(
      s: SparkSession, dir: String, pidx: String): DataFrame =
    if (bm25ChoiceOf(s, pidx).leg == "indexed") PostingsIndex.query(s, pidx)
    else Retrieval.bm25Topk(s, dir)

  /** `phrase_auto`: shares `phrase_search`'s oracle (all three legs
    * do). */
  def phraseAuto(s: SparkSession, dir: String): DataFrame =
    phraseAutoOn(s, dir, PostingsIndex.ensureLifecycleIndex(s, dir))

  private[graft] def phraseAutoOn(
      s: SparkSession, dir: String, pidx: String): DataFrame =
    phraseChoiceOf(s, pidx).leg match {
      case "positional" => PostingsIndex.phrasePositionalOn(s, pidx)
      case "indexed"    => PostingsIndex.phraseIndexedOn(s, dir, pidx)
      case _            => Retrieval.phraseSearch(s, dir)
    }

  /** `ann_auto`: shares `ann_ivf`'s oracle. */
  def annAuto(s: SparkSession, dir: String): DataFrame =
    annAutoOn(s, dir, IvfIndex.ensureLifecycleIndex(s, dir))

  private[graft] def annAutoOn(
      s: SparkSession, dir: String, vidx: String): DataFrame =
    if (annChoiceOf(s, vidx).leg == "indexed")
      IvfIndex.query(s, vidx, IvfIndex.queryBatch(s, dir), nProbe = 2, k = 5)
    else Similarity.annIvf(s, dir)

  // ---- per-family decision builders: the ONE place each family's
  // stats are gathered and fed to its decider — shared by the `*_auto`
  // entries and [[explain]], so the operability surface can never
  // drift from what the autos actually run ----

  private def bm25ChoiceOf(s: SparkSession, pidx: String): Choice = {
    val (totalLen, nSb) = postingsMetaOf(s, pidx)
    decideBm25(totalLen, sumDfOf(s, pidx, Retrieval.queryTerms), nSb)
  }

  private def phraseChoiceOf(s: SparkSession, pidx: String): Choice = {
    val (totalLen, nSb) = postingsMetaOf(s, pidx)
    decidePhrase(new java.io.File(s"$pidx/positions").isDirectory, totalLen,
      sumDfOf(s, pidx, Retrieval.gatePhrases.flatten.distinct), nSb)
  }

  private def annChoiceOf(s: SparkSession, vidx: String): Choice = {
    val (nVec, nCells) = ivfMetaOf(s, vidx)
    decideAnn(nVec, nCells, nProbe = 2L, jobOverheadTokens(s))
  }

  private def hybridChoiceOf(
      s: SparkSession, pidx: String, vidx: String): Choice = {
    val (nVec, nCells) = ivfMetaOf(s, vidx)
    decideHybrid(postingsMetaOf(s, pidx)._1, nVec, nCells, nProbe = 2L,
      jobOverheadTokens(s))
  }

  /** The routing EXPLAIN: one (family, [[Choice]]) row per twin family
    * with the decision the CURRENT stats make and both modeled costs —
    * the operability surface (see why a leg gets picked without running
    * anything). The SAME choice builders the `*_auto` entries run. */
  def explain(s: SparkSession, dir: String): Seq[(String, Choice)] = {
    val pidx = PostingsIndex.ensureLifecycleIndex(s, dir)
    val vidx = IvfIndex.ensureLifecycleIndex(s, dir)
    Seq(
      "bm25" -> bm25ChoiceOf(s, pidx),
      "phrase" -> phraseChoiceOf(s, pidx),
      "ann" -> annChoiceOf(s, vidx),
      "hybrid" -> hybridChoiceOf(s, pidx, vidx))
  }

  /** `hybrid_auto`: shares `hybrid_rrf_indexed`'s oracle — the scanned
    * twin computes the identical semantics with zero index reads. */
  def hybridAuto(s: SparkSession, dir: String): DataFrame =
    hybridAutoOn(s, dir,
      PostingsIndex.ensureLifecycleIndex(s, dir),
      IvfIndex.ensureLifecycleIndex(s, dir))

  private[graft] def hybridAutoOn(
      s: SparkSession, dir: String, pidx: String, vidx: String): DataFrame =
    if (hybridChoiceOf(s, pidx, vidx).leg == "indexed")
      Retrieval.hybridRrfIndexed(s, dir)
    else Retrieval.hybridRrfScanned(s, dir)
}
