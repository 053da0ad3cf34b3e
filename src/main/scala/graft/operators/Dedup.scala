package graft.operators

import graft.Materialize.MaterializeOps

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Deduplication operators for training-data pipelines over `documents`
  * (builder-prompt scale extensions).
  *
  * Scale design (the point of each operator at 100 TB):
  * - exact: one hash-shuffle on a 32-char fingerprint — the minimum possible.
  * - MinHash+LSH: the classic shingle→minhash→band→bucket-join pipeline.
  *   Candidate generation is a self-join on band keys (tiny vs O(n²) all
  *   pairs); only candidates pay the exact-Jaccard verification join.
  * - SimHash: 64-bit signature via per-bit majority vote; near-dup pairs
  *   found by banding the signature (4 bands × 16 bits) so hamming≤3 pairs
  *   are guaranteed to collide in ≥1 band — again no O(n²), and sparse
  *   enough buckets that candidates stay near-linear in corpus size.
  *
  * Hashing uses md5 (identical in Spark and DuckDB) rather than
  * xxhash64/murmur (engine-specific), so every stage is oracle-checkable.
  * MinHash permutations are 32-bit hex slices of md5(salt || shingle) over
  * two salts — k uniform hashes from 2 digest computations per shingle;
  * minima compare as fixed-length hex strings.
  */
object Dedup {

  private[graft] val numMinhash = 8   // minhash functions
  private[graft] val bandSize = 2     // → 4 LSH bands

  // the ONE canonical scala-side tokenizer lives in TextAnalysis
  private def normTokens(text: String): Array[String] =
    TextAnalysis.normTokens(text)

  /** Distinct 3-token shingles of one normalized document. Compiled
    * rather than the column-DSL `transform(sequence(...))` form: Spark's
    * higher-order array functions are CodegenFallback — interpreted
    * row-at-a-time — which made this, the largest intermediate of the
    * dedup family, the hottest code in the whole bench. Grams come from
    * [[TextAnalysis.distinctGrams]] (token-aligned substrings of the
    * normalized text — one arraycopy per shingle, no per-window Seq or
    * mkString; set-equal to the old `sliding(3)` form by
    * `GramSubstringProps`). */
  private[graft] def shinglesOf(text: String): collection.Set[String] = {
    import scala.jdk.CollectionConverters._
    val fast = TextAnalysis.distinctGrams(text, 3)
    if (fast != null) fast.asScala
    else Set(normTokens(text).mkString(" ")) // <3 tokens: whole doc, one shingle
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  private def shingled(s: SparkSession, dir: String): DataFrame =
    shingledFrom(s, Corpus.documents(s, dir))

  /** Shingles of an arbitrary (possibly pre-filtered) documents frame —
    * filters applied to `docs` push into the parquet scan, unlike a filter
    * above the (opaque-to-Catalyst) flatMap. */
  private def shingledFrom(s: SparkSession, docs: DataFrame): DataFrame = {
    import s.implicits._
    docs
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        shinglesOf(text).iterator.map((sh: String) => (id, sh))
      }
      .toDF("doc_id", "shingle")
  }

  /** The k per-doc minhash minima in one shuffle-free pass (mapPartitions,
    * digest reused): minhashing is per-document state, so exploding the
    * shingle stream into a k-slot min aggregate — a full shuffle — is
    * wasted motion. Hex slices compare as strings exactly like the
    * oracle's `MIN(substring(md5(...)))`. The shingle-set size rides along
    * for free (the set is in hand), so Jaccard denominators never need a
    * second pass over the corpus. */
  private[graft] def minhashPerDoc(s: SparkSession, dir: String): Dataset[(Long, Seq[String], Long)] =
    minhashPerDocFrom(s, Corpus.documents(s, dir))

  /** [[minhashPerDoc]] over an arbitrary (doc_id, text) frame — shared
    * with the incremental-ingest probe so both sides of a snapshot/batch
    * comparison carry byte-identical signatures. */
  private[graft] def minhashPerDocFrom(
      s: SparkSession, docs: DataFrame): Dataset[(Long, Seq[String], Long)] = {
    import s.implicits._
    docs
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val (mins, nShingles) = signatureOf(md, text)
          (id, mins.toSeq, nShingles.toLong)
        }
      }
  }

  /** The k minhash minima + shingle-set size of ONE document — the per-doc
    * kernel of [[minhashPerDoc]], factored out so the streaming
    * at-ingestion near-dup detector ([[graft.streaming.StreamNearDup]])
    * computes byte-identical signatures to the batch sweep. `md` is the
    * caller's reused digest instance (one per partition/task). */
  private val saltA = "a|".getBytes("UTF-8")
  private val saltB = "b|".getBytes("UTF-8")

  private[graft] def signatureOf(
      md: java.security.MessageDigest, text: String): (Array[String], Int) = {
    // Numeric inner loop, hex only at the end: an 8-hex-char md5 slice is
    // the fixed-width base-16 rendering of its 32-bit value, so unsigned
    // comparison orders exactly like the old per-shingle substring
    // compareTo — same minima, same hex output — without 2 hex-string
    // renders + 8 substring allocations per shingle (the measured hot
    // kernel of the whole minhash family). Salt prefixes stream into the
    // digest so no "a|"+shingle concat string is built either.
    val minsV = Array.fill(numMinhash)(Long.MaxValue)
    val shingles = shinglesOf(text)
    shingles.foreach { sh =>
      val shb = sh.getBytes("UTF-8")
      md.update(saltA); md.update(shb)
      val da = md.digest()
      md.update(saltB); md.update(shb)
      val db = md.digest()
      var i = 0
      while (i < numMinhash) {
        val src = if (i < 4) da else db
        val o = (i % 4) * 4
        val v = ((src(o) & 0xffL) << 24) | ((src(o + 1) & 0xffL) << 16) |
          ((src(o + 2) & 0xffL) << 8) | (src(o + 3) & 0xffL)
        if (v < minsV(i)) minsV(i) = v
        i += 1
      }
    }
    val mins = Array.tabulate(numMinhash) { i =>
      if (minsV(i) == Long.MaxValue) null
      else {
        val out = new Array[Char](8)
        var j = 0
        while (j < 8) {
          out(j) = hexDigits(((minsV(i) >>> ((7 - j) * 4)) & 0xf).toInt)
          j += 1
        }
        new String(out)
      }
    }
    (mins, shingles.size)
  }

  /** LSH band keys of one signature — scala twin of the batch band-key
    * column expression (band index || minima slices, '|'-joined), shared
    * with the streaming detector so a stream-flagged band collision is
    * exactly a batch band collision. */
  private[graft] def bandKeysOf(mins: Array[String]): Array[String] = {
    val nBands = numMinhash / bandSize
    Array.tabulate(nBands) { b =>
      val sb = new StringBuilder
      sb.append(b)
      var j = 0
      while (j < bandSize) {
        sb.append('|').append(mins(b * bandSize + j))
        j += 1
      }
      sb.toString
    }
  }

  // --------------------------------------------------------------------
  // Fast 64-bit minhash family — the STREAMING detector's kernel.
  //
  // The batch surface keeps md5 because every batch stage is checked
  // against a DuckDB oracle and md5 is the one hash both engines compute
  // identically. The streaming at-ingestion detector has no DuckDB leg —
  // its contract is "stream collisions ≡ a batch sweep run with the SAME
  // family" (pinned by StreamNearDupSpec) — so it is free to use a cheap
  // family: FNV-1a-based 64-bit token hashes, order-sensitive polynomial
  // shingle combination (no shingle string is ever built), and
  // Kirsch–Mitzenmacher double hashing (g_i = h1 + i·h2) for the k minima.
  // Minima are numeric longs (no per-shingle hex-string allocation or
  // string compares) and band keys are single longs (smaller state rows,
  // cheaper shuffle + state-store keys than the md5 path's hex strings).
  // Duplicates cannot change a minimum, so the distinct-shingle Set the
  // md5 kernel materializes is skipped entirely.

  private val fastSeedA = 0x9E3779B97F4A7C15L
  private val fastSeedB = 0xC2B2AE3D27D4EB4FL

  /** splitmix64 finalizer: full-avalanche 64-bit mix (public-domain
    * constants from Steele et al., "Fast Splittable Pseudorandom Number
    * Generators", OOPSLA'14). */
  private[graft] def fmix64(x0: Long): Long = {
    var x = x0
    x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
    x ^= (x >>> 27); x *= 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }

  /** 64-bit string hash: FNV-1a over chars, splitmix-finalized. */
  private[graft] def hash64(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001B3L; i += 1 }
    fmix64(h)
  }

  /** Numeric minhash signature of one document under the fast family:
    * same tokenizer and 3-token-shingle structure as [[signatureOf]], but
    * tokens are hashed once each and shingles combined positionally — no
    * digest, no shingle strings, no distinct-Set (duplicate shingles
    * cannot change a minimum). ~10 multiply/xor ops per shingle vs two
    * MD5 digests + 8 hex-string compares. */
  private[graft] def fastSignatureOf(text: String): Array[Long] = {
    val toks = normTokens(text)
    val mins = Array.fill(numMinhash)(Long.MaxValue)
    def update(c: Long): Unit = {
      val h1 = fmix64(c ^ fastSeedA)
      val h2 = fmix64(c ^ fastSeedB) | 1L
      var g = h1
      var i = 0
      while (i < numMinhash) {
        if (g < mins(i)) mins(i) = g
        g += h2
        i += 1
      }
    }
    if (toks.length >= 3) {
      val th = new Array[Long](toks.length)
      var i = 0
      while (i < toks.length) { th(i) = hash64(toks(i)); i += 1 }
      i = 0
      while (i + 2 < toks.length) {
        // order-sensitive polynomial combination of the 3 token hashes
        update(th(i) + fastSeedA * (th(i + 1) + fastSeedA * th(i + 2)))
        i += 1
      }
    } else {
      // <3 tokens: the whole doc is one shingle (mirrors shinglesOf)
      var c = 0xCBF29CE484222325L
      var i = 0
      while (i < toks.length) { c = c * 0x100000001B3L + hash64(toks(i)); i += 1 }
      update(c)
    }
    mins
  }

  /** LSH band keys under the fast family: one long per band, the band
    * index mixed in FIRST (the convention ADVICE flagged for the md5 SQL
    * twin — a cross-band key coincidence here needs a full 64-bit
    * collision). */
  private[graft] def fastBandKeysOf(mins: Array[Long]): Array[Long] = {
    val nBands = numMinhash / bandSize
    Array.tabulate(nBands) { b =>
      var h = fmix64(b + 0x51_7C_C1_B7_27_22_0A_95L)
      var j = 0
      while (j < bandSize) { h = fmix64(h ^ mins(b * bandSize + j)); j += 1 }
      h
    }
  }

  /** [[shingledSql]] over an arbitrary named relation (the
    * `substringSpansSqlFor` convention). */
  private[graft] def shingledSqlFor(rel: String): String =
    s"""SELECT doc_id, UNNEST(list_distinct(
       |  CASE WHEN len(${TextAnalysis.tokensSql}) >= 3 THEN
       |    list_transform(range(0, len(${TextAnalysis.tokensSql}) - 2),
       |      i -> (${TextAnalysis.tokensSql})[i+1] || ' ' ||
       |           (${TextAnalysis.tokensSql})[i+2] || ' ' ||
       |           (${TextAnalysis.tokensSql})[i+3])
       |  ELSE [array_to_string(${TextAnalysis.tokensSql}, ' ')] END)) AS shingle
       |FROM $rel""".stripMargin

  private[graft] val shingledSql: String = shingledSqlFor("documents")

  /** Exact dedup: group identical normalized content, keep the lowest id
    * (hash-groupBy — a single shuffle on the fingerprint). */
  def dedupExact(s: SparkSession, dir: String): DataFrame = {
    Corpus.documents(s, dir)
      .select(col("doc_id"), TextAnalysis.fingerprintCol(col("text")).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  val dedupExactSql: String =
    s"""SELECT ${TextAnalysis.fingerprintSql} AS fingerprint,
       |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
       |FROM documents
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Quality-aware keep rule: production exact-dedup rarely keeps the
  // FIRST copy — it keeps the BEST one. Fingerprint identity goes
  // through normalized text while the quality heuristic scores the RAW
  // text, so two docs with identical content can differ in quality
  // (formatting damage: whitespace inflation, case mangling); the keep
  // is argmax (quality, then smallest id) per group — deterministic,
  // replay-stable, and the policy knob a curation pipeline actually
  // wants ("drop the scrape with the broken formatting, keep the clean
  // one").
  //
  // Gate non-vacuity (the dedupIncremental replay convention): the
  // synthetic corpus has no exact duplicates, so the QUERY ENTRY
  // replays id % 7 docs past snapshotCut as a WHITESPACE-INFLATED copy
  // of a snapshot doc (every space doubled: same normalized
  // fingerprint, different raw length/chars-per-token → a real quality
  // gap for the rule to resolve). LEFT join + null guard: the
  // sparse-corpus protection.

  def dedupExactBest(s: SparkSession, dir: String): DataFrame = {
    val docs = Corpus.documents(s, dir)
    val snapTexts = docs.where(col("doc_id") < snapshotCut)
      .select(col("doc_id").as("sid"), col("text").as("snap_text"))
    val aug = docs.select(col("doc_id"), col("text"))
      .join(broadcast(snapTexts),
        col("doc_id") >= snapshotCut && col("doc_id") % snapshotCut === col("sid"),
        "left")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0 && col("snap_text").isNotNull,
          regexp_replace(col("snap_text"), " ", "  "))
          .otherwise(col("text")).as("text"))
    dedupExactBestFrom(aug)
  }

  /** The operator surface: per-fingerprint keep = max quality, ties to
    * the smallest id (one struct-min aggregate — the same map-side-
    * combinable single exchange as [[dedupExact]], just a wider
    * combine value). */
  private[graft] def dedupExactBestFrom(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        TextAnalysis.fingerprintCol(col("text")).as("fingerprint"),
        TextAnalysis.qualityScore10(col("text")).as("q"))
      .groupBy(col("fingerprint"))
      .agg(
        min(struct((lit(10L) - col("q")).as("nq"), col("doc_id").as("id"))).as("b"),
        count(lit(1)).as("n_copies"))
      .select(col("fingerprint"), col("b.id").as("keep_id"),
        (lit(10L) - col("b.nq")).as("keep_quality"), col("n_copies"))

  // lazy: interpolates snapshotCut, defined later in this object — an
  // eager val would bake in 0 (the Scala-init-order gotcha this repo
  // has hit before)
  lazy val dedupExactBestSql: String =
    s"""WITH aug AS (
       |  SELECT i.doc_id,
       |    CASE WHEN i.doc_id % 7 = 0 AND s.text IS NOT NULL
       |         THEN replace(s.text, ' ', '  ') ELSE i.text END AS text
       |  FROM documents i
       |  LEFT JOIN documents s
       |    ON i.doc_id >= $snapshotCut AND s.doc_id = i.doc_id % $snapshotCut),
       |q AS (SELECT doc_id, ${TextAnalysis.fingerprintSql} AS fingerprint,
       |        (${TextAnalysis.qualityScore10Sql}) AS q
       |      FROM aug),
       |r AS (SELECT fingerprint, doc_id, q,
       |        ROW_NUMBER() OVER (PARTITION BY fingerprint
       |          ORDER BY q DESC, doc_id ASC) AS rn,
       |        COUNT(*) OVER (PARTITION BY fingerprint) AS n_copies
       |      FROM q)
       |SELECT fingerprint, doc_id AS keep_id,
       |  CAST(q AS BIGINT) AS keep_quality, CAST(n_copies AS BIGINT) AS n_copies
       |FROM r WHERE rn = 1""".stripMargin

  // The k permutation hashes are 8-hex-char (32-bit) slices of two salted
  // md5 digests — 2 digest computations per shingle instead of k. Spark
  // computes them in the shuffle-free minhashPerDoc pass; the oracle keeps
  // the per-shingle MIN form (identical values).
  private val mhMinsSql: String = (0 until numMinhash).map { i =>
    val src = if (i < 4) "a" else "b"
    s"MIN(substring(md5('$src|' || shingle), ${(i % 4) * 8 + 1}, 8)) AS mh$i"
  }.mkString(",\n  ")

  /** MinHash signatures: k md5-derived minima over the shingle set,
    * serialized as one comma-joined string (stable across engines). */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    minhashPerDoc(s, dir)
      .map { case (id, mh, _) => (id, mh.mkString(",")) }
      .toDF("doc_id", "signature")
  }

  val minhashSignaturesSql: String = {
    val cols = (0 until numMinhash).map(i => s"mh$i").mkString(" || ',' || ")
    s"""WITH sh AS MATERIALIZED ($shingledSql),
       |sig AS MATERIALIZED (SELECT doc_id, $mhMinsSql FROM sh GROUP BY doc_id)
       |SELECT doc_id, $cols AS signature FROM sig""".stripMargin
  }

  /** MinHash+LSH near-dup pairs: band the signature (4 bands × 2 hashes),
    * self-join on band keys for candidates, verify with exact shingle
    * Jaccard ≥ 0.5. Jaccard = |∩|/|∪| over exact bigint counts → the
    * double is bit-deterministic. */
  def minhashLshPairs(s: SparkSession, dir: String): DataFrame =
    minhashLshPairsImpl(s, dir)._1

  /** Returns the pairs frame plus its checkpointed intermediates, so a
    * caller that outlives the result (dedupClusters) can release their
    * storage blocks once it has materialized downstream — `Dataset
    * .unpersist` can't do it (checkpoint RDDs bypass the CacheManager;
    * see [[org.apache.spark.sql.graft.Bridge.releaseCheckpoint]]). For
    * the standalone query the blocks are bounded by construction
    * (per-doc signatures, candidates, candidate shingles) and reclaimed
    * by the ContextCleaner when the frames are GC'd. */
  private[graft] def minhashLshPairsImpl(
      s: SparkSession, dir: String): (DataFrame, Seq[DataFrame]) = {
    // Materialization discipline, which is also the 100 TB shape: the full
    // shingle set is NEVER stored or even shuffled (signatures, band keys,
    // and Jaccard denominators all come from the one shuffle-free per-doc
    // minhash pass); only that small per-doc frame is materialized, and
    // everything downstream streams off it. localCheckpoint, NOT cache():
    // a cache() registers the subtree with the CacheManager and silently
    // turns minhash_signatures' / dedup_clusters' identical subtrees into
    // cache reads — corrupting their bench timings; a checkpoint is
    // private to this plan (same rule as Similarity.annRecall).
    import s.implicits._
    val nBands = numMinhash / bandSize
    val sigs = minhashPerDoc(s, dir).toDF("doc_id", "mh", "n_shingles")
      .graftCheckpoint() // eager: the expensive md5 pass runs exactly once
    val sizes = sigs.select(col("doc_id"), col("n_shingles"))
    // Band keys are the raw concatenated minima (equality is what the join
    // needs — hashing the key first bought nothing); each row carries ALL
    // band keys so a multi-band collision is kept only in its FIRST
    // colliding band — exactly-once candidates without a distinct pass.
    val keyCols = (0 until nBands).map { b =>
      concat_ws("|", (0 until bandSize).map(j => col("mh")(b * bandSize + j)): _*)
    }
    val bands = sigs.select(col("doc_id"), array(keyCols: _*).as("keys"))
      .select(col("doc_id"), col("keys"),
        posexplode(col("keys")).as(Seq("band", "key")))
    val firstBand = coalesce(
      (0 until nBands).map(b =>
        when(col("l.keys")(b) === col("r.keys")(b), lit(b))): _*)
    val candidates = bands.as("l").join(bands.as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
        col("l.doc_id") < col("r.doc_id"))
      .where(col("l.band") === firstBand)
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
      .graftCheckpoint(false) // lazy: materialized by the first consumer's
    // job rather than a separate barrier; concurrent broadcast builds may
    // duplicate the (cheap, sigs-fed) band join but never the md5 pass
    // Verification semi-join reduction: re-shingle ONLY candidate docs.
    // Candidates are a vanishing fraction of the corpus, so recomputing
    // their shingles from the (pruned, pushed-down) scan is far cheaper
    // than materializing the full shingle set for reuse.
    val docsInPlay = candidates.select(col("doc_a").as("doc_id"))
      .union(candidates.select(col("doc_b").as("doc_id"))).distinct()
    // filter documents BEFORE shingling: the flatMap is opaque to Catalyst,
    // so a post-shingle filter would shingle the whole corpus anyway
    val candDocs = Corpus.documents(s, dir)
      .join(broadcast(docsInPlay), Seq("doc_id"), "left_semi")
    // lazily materialized: the intersection join reads it twice (sa/sb),
    // and block-level persistence makes the second read hit storage — a
    // separate materialization barrier would be pure latency
    val shc = shingledFrom(s, candDocs).graftCheckpoint(false)
    val inter = broadcast(candidates)
      .join(shc.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shc.as("sb"),
        col("doc_b") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_inter"))
    val pairs = inter
      .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_inter").cast("double") /
         (col("za.n_shingles") + col("zb.n_shingles") - col("n_inter")).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= 0.5)
    (pairs, Seq(sigs, candidates, shc))
  }

  val minhashLshPairsSql: String = {
    val mins = mhMinsSql
    val nBands = numMinhash / bandSize
    val bandExprs = (0 until nBands).map { b =>
      val parts = (0 until bandSize).map(j => s"mh${b * bandSize + j}").mkString(" || '|' || ")
      s"md5($parts)"
    }.mkString(", ")
    s"""WITH sh AS MATERIALIZED ($shingledSql),
       |sig AS MATERIALIZED (SELECT doc_id, $mins FROM sh GROUP BY doc_id),
       |bands AS MATERIALIZED (SELECT doc_id, UNNEST([$bandExprs]) AS band_key FROM sig),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b
       |  FROM bands l JOIN bands r
       |    ON l.band_key = r.band_key AND l.doc_id < r.doc_id),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT doc_a, doc_b, COUNT(*) AS n_inter
       |  FROM cand
       |  JOIN sh sa ON cand.doc_a = sa.doc_id
       |  JOIN sh sb ON cand.doc_b = sb.doc_id AND sa.shingle = sb.shingle
       |  GROUP BY doc_a, doc_b)
       |SELECT doc_a, doc_b,
       |  CAST(n_inter AS DOUBLE) / (za.n_shingles + zb.n_shingles - n_inter) AS jaccard
       |FROM inter
       |JOIN sizes za ON doc_a = za.doc_id
       |JOIN sizes zb ON doc_b = zb.doc_id
       |WHERE CAST(n_inter AS DOUBLE) / (za.n_shingles + zb.n_shingles - n_inter) >= 0.5""".stripMargin
  }

  /** SimHash signatures: 64-bit per-token-majority hash (the industry
    * width — a 16-bit hash makes LSH banding useless at scale because
    * 4-bit band buckets collide constantly). Bit j of a token's hash is
    * the LSB parity of hex digit j+1 of md5('a|'‖token) for j<32 and of
    * md5('b|'‖token) for j≥32; the document bit is the sign of the ±1
    * vote sum (frequency-weighted, non-distinct).
    *
    * Execution shape: one translate+conv per digest turns the 32 hex
    * parities into one integer, so the 64 per-bit votes are pure integer
    * shift/mask ops inside a single hash aggregate. Bit 63's weight is
    * Long.MinValue — addition of distinct powers of two sets the sign bit
    * without carries, identically in Spark and DuckDB. */
  def simhashSignatures(s: SparkSession, dir: String): DataFrame = {
    // Per-document compiled vote loop (mapPartitions, digest instance
    // reused per partition): the column-DSL form exploded ~280 tokens/doc
    // into a 64-slot hash aggregate — a full shuffle of the token stream.
    // The vote is per-document state, so it needs NO exchange at all: this
    // is a narrow map emitting one row per doc. Bit j of a token's hash is
    // the LSB parity of hex digit j+1 of md5('a|'‖token) (j<32) /
    // md5('b|'‖token) (j≥32), identical to the oracle's substring form.
    import s.implicits._
    Corpus.documents(s, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val votes = new Array[Int](64)
          val toks = normTokens(text)
          toks.foreach { tok =>
            // one UTF-8 encode per token, salts streamed into the digest
            // (the minhash signatureOf discipline): no "a|"+tok concat
            // string or second getBytes per token
            val tb = tok.getBytes("UTF-8")
            var half = 0
            while (half < 2) {
              md.update(if (half == 0) saltA else saltB)
              md.update(tb)
              val d = md.digest()
              var j = 0
              while (j < 32) {
                val b = d(j >> 1) & 0xff
                val nib = if ((j & 1) == 0) (b >> 4) & 0xf else b & 0xf
                votes(half * 32 + j) += (if ((nib & 1) == 1) 1 else -1)
                j += 1
              }
              half += 1
            }
          }
          var sig = 0L
          var j = 0
          while (j < 64) { if (votes(j) >= 0) sig |= (1L << j); j += 1 }
          (id, sig)
        }
      }
      .toDF("doc_id", "simhash")
  }

  val simhashSignaturesSql: String = {
    val bitSums = (0 until 64).map { j =>
      val (src, pos) = if (j < 32) ("ha", j + 1) else ("hb", j - 31)
      s"SUM(CASE WHEN substring($src, $pos, 1) IN ('1','3','5','7','9','b','d','f') THEN 1 ELSE -1 END) AS s$j"
    }.mkString(",\n  ")
    val sig = (0 until 64)
      .map(j => s"(CASE WHEN s$j >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH tok AS (
       |  SELECT doc_id, UNNEST(${TextAnalysis.tokensSql}) AS token
       |  FROM documents),
       |hashed AS (
       |  SELECT doc_id, md5('a|' || token) AS ha, md5('b|' || token) AS hb
       |  FROM tok),
       |voted AS (SELECT doc_id, $bitSums FROM hashed GROUP BY doc_id)
       |SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM voted""".stripMargin
  }

  /** SimHash near-dup pairs: band the 64-bit signature into 4×16-bit
    * blocks; any pair within hamming distance 3 shares ≥1 block
    * (pigeonhole), so the block-join finds all such candidates without an
    * all-pairs scan — and 16-bit blocks keep buckets sparse enough that
    * the candidate set stays near-linear at corpus scale. */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sigs = simhashSignatures(s, dir)
    // one small row per (doc, band); localCheckpoint (not cache — see
    // minhashLshPairs) so the self-join below doesn't run the 64-bit vote
    // aggregation twice and simhash_signatures' bench timing stays honest
    val bands = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * 16).bitwiseAND(lit(65535L)).as("nib"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.nib").as("nib"))
      .graftCheckpoint()
    val l = bands.as("l"); val r = bands.as("r")
    // a pair colliding in several bands is kept only in its FIRST
    // colliding band — exactly-once candidates with no distinct() pass
    // over the candidate set (the xor trick minhashLshPairs and
    // embeddingNearDups already use): band b collides iff bits [16b,
    // 16b+16) of sigA^sigB are all zero.
    val xorSig = expr("l.simhash ^ r.simhash")
    val firstBand = coalesce((0 until 4).map { b =>
      when(shiftright(xorSig, b * 16).bitwiseAND(lit(65535L)) === 0L, lit(b))
    }: _*)
    l.join(r,
        col("l.band") === col("r.band") && col("l.nib") === col("r.nib") &&
        col("l.doc_id") < col("r.doc_id"))
      .where(col("l.band") === firstBand)
      .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"),
        bit_count(xorSig.cast("long")).cast("long").as("hamming"))
      .where(col("hamming") <= 3L)
  }

  val simhashPairsSql: String =
    s"""WITH sig AS MATERIALIZED ($simhashSignaturesSql),
       |bands AS (
       |  SELECT doc_id, simhash, b.band AS band,
       |    (simhash >> (b.band * 16)) & 65535 AS nib
       |  FROM sig CROSS JOIN (SELECT UNNEST([0,1,2,3]) AS band) b),
       |pairs AS (
       |  SELECT DISTINCT l.doc_id AS doc_a, r.doc_id AS doc_b,
       |    CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
       |  FROM bands l JOIN bands r
       |    ON l.band = r.band AND l.nib = r.nib AND l.doc_id < r.doc_id)
       |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3""".stripMargin

  /** Benchmark decontamination: flag corpus documents sharing ANY exact
    * 13-token n-gram with a held-out "benchmark" set (docs 0-9 stand in) —
    * the standard contamination test run before training, distinct from
    * [[ngramJaccardTopk]] which ranks by similarity: here one collision is
    * enough, so the check is a LEFT SEMI join on the n-gram and the engine
    * stops probing a document at its first hit.
    *
    * 100 TB shape: the benchmark side is tiny (a few thousand eval docs),
    * so its n-gram set broadcasts and the corpus side is a narrow scan +
    * semi-join — no shuffle of corpus n-grams, no pair materialization. */
  private val contamN = 13
  private val contamBench = 10

  /** Distinct 13-token grams of a documents frame, one row per (doc, gram).
    * Substring-built like [[shinglesOf]] (one arraycopy per gram vs a
    * 13-token mkString chain; set-equal by `GramSubstringProps`). */
  private[graft] def grams13(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import scala.jdk.CollectionConverters._
    val n = contamN
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val set = TextAnalysis.distinctGrams(text, n)
        if (set == null) Iterator.empty
        else set.iterator.asScala.map((g: String) => (id, g))
      }
      .toDF("doc_id", "gram")
  }

  def contamination(s: SparkSession, dir: String): DataFrame = {
    val bench = grams13(Corpus.documents(s, dir).where(col("doc_id") < contamBench))
      .select(col("gram")).distinct()
    val corpus = Corpus.documents(s, dir).where(col("doc_id") >= contamBench)
    grams13(corpus)
      .join(broadcast(bench), Seq("gram"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
  }

  /** [[contamination]] with the broadcast carrying md5(gram) instead of
    * the gram text: a 13-token gram averages ~90 bytes, the hash 16 — so
    * a real eval suite's gram set (millions of grams, GBs raw) broadcasts
    * at ~1/6 the bytes, below the shuffle-join cliff. Same answer up to
    * md5 collisions inside the benchmark set's n-gram space: P ≈ n²/2¹²⁹
    * — at 10⁹ distinct grams about 4·10⁻²² — and a collision can only
    * ever ADD a flagged doc, never drop one. The spec asserts both the
    * answer equality and the measured payload shrink on this corpus. */
  def contaminationHashed(s: SparkSession, dir: String): DataFrame = {
    // unhex: the broadcast must carry the 16 RAW bytes, not md5's 32-char
    // hex rendering — hex would halve the claimed payload win
    val bench = grams13(Corpus.documents(s, dir).where(col("doc_id") < contamBench))
      .select(graft.functions.HashFunctions.md5BinCol(col("gram")).as("gh")).distinct()
    val corpus = Corpus.documents(s, dir).where(col("doc_id") >= contamBench)
    grams13(corpus)
      .select(col("doc_id"), graft.functions.HashFunctions.md5BinCol(col("gram")).as("gh"))
      .join(broadcast(bench), Seq("gh"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
  }

  private[operators] def gramsSql(filter: String): String = {
    val toks = TextAnalysis.tokensSql
    s"""SELECT doc_id, UNNEST(list_distinct(
       |    CASE WHEN len($toks) >= 13 THEN
       |      list_transform(range(0, len($toks) - 12), i ->
       |        array_to_string(($toks)[CAST(i + 1 AS INT):CAST(i + 13 AS INT)], ' '))
       |    ELSE [] END)) AS gram
       |FROM documents WHERE $filter""".stripMargin
  }

  val contaminationSql: String =
    s"""WITH bench AS (SELECT DISTINCT gram FROM (${gramsSql("doc_id < 10")})),
       |corpus AS (${gramsSql("doc_id >= 10")})
       |SELECT DISTINCT doc_id, TRUE AS contaminated
       |FROM corpus WHERE gram IN (SELECT gram FROM bench)""".stripMargin

  val contaminationHashedSql: String =
    s"""WITH bench AS (SELECT DISTINCT unhex(md5(gram)) AS gh FROM (${gramsSql("doc_id < 10")})),
       |corpus AS (${gramsSql("doc_id >= 10")})
       |SELECT DISTINCT doc_id, TRUE AS contaminated
       |FROM corpus WHERE unhex(md5(gram)) IN (SELECT gh FROM bench)""".stripMargin

  /** [[contamination]] with a Bloom-filter prefilter instead of a
    * broadcast of the benchmark gram set: the only thing broadcast is the
    * bloom (fixed bits/item at a chosen fpp — ~1.2 GB for 10⁹ grams at 1%,
    * vs 16 GB of raw md5s), the prefilter drops the overwhelmingly-clean
    * bulk of the corpus stream, and the few survivors are confirmed with
    * an exact SHUFFLE semi-join (the benchmark set is never broadcast at
    * all). False positives only ever ADD confirm-stage work, never answers
    * — the oracle is therefore [[contaminationSql]] verbatim.
    *
    * The prefilter is the codegen'd
    * [[graft.functions.BloomMightContain]] expression (r7; previously a
    * Scala UDF, which cost a UTF8String→String conversion per gram and
    * split the scan's whole-stage-codegen span — Spark exposes no public
    * might-contain expression; its internal one serves the runtime-filter
    * rewrite). The spec measures the bloom's serialized size against the
    * hashed-set payload on this corpus. */
  /** The ONE construction of [[contaminationBloom]]'s benchmark side:
    * (checkpointed md5'd gram frame, gram count, bloom) — shared with the
    * measured-size helper so the spec can never measure a different bloom
    * than the operator broadcasts. */
  private def benchBloom(s: SparkSession, dir: String)
      : (DataFrame, Long, org.apache.spark.util.sketch.BloomFilter) = {
    val bench = grams13(Corpus.documents(s, dir).where(col("doc_id") < contamBench))
      .select(md5(col("gram")).as("gh")).distinct()
      .graftCheckpoint() // read twice (count + confirm join); keep it private to this plan
    val n = bench.count()
    (bench, n, bench.stat.bloomFilter("gh", math.max(n, 1L), 0.01))
  }

  def contaminationBloom(s: SparkSession, dir: String): DataFrame = {
    val (bench, _, bf) = benchBloom(s, dir)
    val corpus = Corpus.documents(s, dir).where(col("doc_id") >= contamBench)
    grams13(corpus)
      .select(col("doc_id"), md5(col("gram")).as("gh"))
      .where(graft.functions.BloomFunctions.mightContain(bf, col("gh")))
      .join(bench, Seq("gh"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("contaminated", lit(true))
  }

  /** Serialized bloom payload vs raw-hash payload for [[contaminationBloom]]
    * on this corpus — exposed for the spec's measured-size assertion. */
  private[graft] def contaminationBloomSizes(s: SparkSession, dir: String): (Long, Long) = {
    val (_, n, bf) = benchBloom(s, dir)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    (bos.size().toLong, n * 16L)
  }

  /** Per-document duplicated-span fraction — the ExactSubstr-lite signal
    * from "Deduplicating Training Data Makes Language Models Better": for
    * each document, the fraction of its distinct 13-token grams that occur
    * in at least one OTHER document. Docs dominated by corpus-repeated
    * spans (boilerplate, templates, mirrored text) score near 1 and are
    * the ones a span-level dedup pass would rewrite.
    *
    * Scale shape: grams are md5-hashed before the exchange (16-byte keys,
    * not ~90-byte gram strings), document frequency is a window count over
    * the SAME exchange the per-doc rollup needs next (the tfidf
    * df-from-tf trick — 2 shuffles total, none carrying raw text), and
    * nothing is ever joined all-pairs. Collisions: P ≈ n²/2¹²⁹ across
    * corpus gram space — vanishing, and symmetric on both engines since
    * the oracle hashes identically. */
  def dupGramFraction(s: SparkSession, dir: String): DataFrame = {
    val g = grams13(Corpus.documents(s, dir))
      .select(col("doc_id"), graft.functions.HashFunctions.md5BinCol(col("gram")).as("gh"))
    val byGram = org.apache.spark.sql.expressions.Window.partitionBy(col("gh"))
    g.withColumn("df", count(lit(1)).over(byGram))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("df") >= 2, 1L).otherwise(0L)).as("n_dup_grams"))
      .select(col("doc_id"), col("n_grams"), col("n_dup_grams"),
        (col("n_dup_grams").cast("double") / col("n_grams").cast("double"))
          .as("dup_frac"))
  }

  val dupGramFractionSql: String =
    s"""WITH g AS (
       |  SELECT doc_id, unhex(md5(gram)) AS gh FROM (${gramsSql("TRUE")})),
       |d AS (SELECT doc_id, COUNT(*) OVER (PARTITION BY gh) AS df FROM g)
       |SELECT doc_id, COUNT(*) AS n_grams,
       |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_grams,
       |  CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_frac
       |FROM d GROUP BY doc_id""".stripMargin

  /** Connected components over the verified MinHash near-dup pairs — the
    * step a real dedup pipeline runs after pair generation: transitively
    * linked documents form one cluster, and every member reports the
    * cluster's minimum doc_id as its representative (the doc a keep-one
    * policy would retain).
    *
    * Execution is alternating large-star/small-star contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond"): each round,
    * every node points its larger neighbors (large-star) and then its
    * smaller neighbors and itself (small-star) at the minimum of its
    * closed neighborhood. Provably O(log² n) rounds — in practice 2-3 for
    * near-dup clusters — and each star op is ONE window-min over the edge
    * frame instead of the two joins per round of the pointer-jumping
    * propagation this replaced. The driver only ever sees scalar
    * convergence aggregates; every data step is distributed.
    *
    * The loop is VERIFICATION-DRIVEN: each iteration derives candidate
    * labels (min target per node) and checks them against the initial
    * edge set — equal endpoint labels on every input pair is the
    * termination condition AND the correctness proof, so the returned
    * labels are proven, not trusted. Labels constant across all edges ⇒
    * constant per component, and a component's minimum node can only
    * ever appear as an edge target (edges point larger→smaller,
    * intra-component), so it labels itself — together that forces every
    * label to be the exact component minimum. A graph whose 1-hop labels
    * already pass (pairs, triangles, min-rooted stars) exits with ZERO
    * contraction rounds; a cap without convergence throws rather than
    * returning partial labels.
    *
    * The loop's exchanges are sized to the CONTRACTED graph's cardinality,
    * not the corpus's: after LSH the near-dup pair graph is orders of
    * magnitude smaller than the corpus, and at 100 TB you size partitions
    * to the data each stage actually moves. */
  def dedupClusters(s: SparkSession, dir: String): DataFrame = {
    val (pairsAll, lshDeps) = minhashLshPairsImpl(s, dir)
    val pairs = pairsAll.select(col("doc_a"), col("doc_b"))
    // canonical direction (src > dst); the eager localCheckpoint cuts the
    // whole LSH pipeline out of the loop's lineage — without it the plan
    // grows a copy of the loop body per round and Catalyst re-analysis
    // dominates (the classic iterative-DataFrame trap)
    val edges0 = pairs.select(col("doc_b").as("src"), col("doc_a").as("dst"))
      .graftCheckpoint()
    // edges0 is materialized: the LSH pipeline's own checkpoints have no
    // further consumer — free their blocks now instead of waiting for GC
    lshDeps.foreach(org.apache.spark.sql.graft.Bridge.releaseCheckpoint)
    starContract(s, edges0).select(col("doc_id"), col("label").as("cluster_id"))
  }

  /** Min-label connected components of a materialized, canonical
    * (src > dst, no self-loops) edge frame via star contraction; returns
    * (doc_id, label). The input frame is caller-owned and left intact
    * (only loop-internal round checkpoints are released). Package-visible
    * so the contraction rounds — which a well-conditioned corpus may
    * never need (the 1-hop labels often pass the exactness proof
    * outright) — are force-tested on adversarial graphs in the spec
    * suite. */
  private[graft] def starContract(s: SparkSession, edges0: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var edges = edges0

    // large-star: for every node u, each neighbor v > u is re-pointed at
    // min(N(u) ∪ {u}). Output stays canonical: src > u ≥ dst.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      sym.select(col("dst"),
          least(min(col("dst")).over(Window.partitionBy(col("src"))), col("src")).as("m"),
          col("src"))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
    }
    // small-star: each node u re-points its smaller neighbors (≠ m) and
    // itself at m = min(N⁻(u) ∪ {u}); input is canonical so m is just the
    // window min of dst. The round's one distinct collapses the multi-
    // edges both stars may emit — not load-bearing for correctness (the
    // label-equality proof ignores dupes) but it bounds edge growth
    // across rounds and keeps the nEdges-based partition sizing honest.
    def smallStar(e: DataFrame): DataFrame = {
      val withM = e.select(col("src"), col("dst"),
        min(col("dst")).over(Window.partitionBy(col("src"))).as("m"))
      withM.where(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(withM.select(col("src"), col("m").as("dst")))
        .distinct()
    }
    // candidate labels of an edge set: every node gets the minimum target
    // it (or its root) points at; roots label themselves. The min-agg
    // keeps the label function well-defined even mid-contraction.
    def labelsOf(e: DataFrame): DataFrame = e
      .union(e.select(col("dst").as("src"), col("dst").as("dst")))
      .groupBy(col("src").as("doc_id")).agg(min(col("dst")).as("label"))
    // the correctness proof doubles as the loop driver: if every initial
    // pair has equal endpoint labels, the labels are constant per
    // component, and the component minimum — which edges (always
    // larger→smaller, always intra-component) can never point anywhere —
    // labels itself, forcing every label to the exact component minimum.
    // So a zero here IS the answer being right, star forest or not, and a
    // simple graph (all components already stars) exits with zero rounds.
    // left joins: a node missing from the label set is a failure, not a
    // silently-dropped row — the check proves coverage as well as equality
    def unmerged(labels: DataFrame): Long = edges0
      .join(labels.as("la"), col("src") === col("la.doc_id"), "left")
      .join(labels.as("lb"), col("dst") === col("lb.doc_id"), "left")
      .where(col("la.label").isNull || col("lb.label").isNull ||
        col("la.label") =!= col("lb.label"))
      .count()

    // MEASURED NON-WIN (r16): disabling AQE inside this loop + dropping
    // the entity family's single-consumer result checkpoints cut the
    // family's driver-job count in HALF (JobCount: entity_incremental
    // 56 → 30, entity_resolution 32 → 16 jobs) and did NOT move
    // wall-clock (warm 4.44 → 4.40 / 2.13 → 2.58 s; subset bench pairs
    // 11.87 vs 13.8–15.1 s, new tree worse) — the family's per-query
    // floor is Catalyst planning + codegen + the contraction compute,
    // not job scheduling, so job-count cuts here buy nothing locally
    // and AQE-off leans negative. Kept as-was; don't re-try.
    val conf = s.conf
    val prevParts = conf.get("spark.sql.shuffle.partitions")
    try {
      // ~125k edges (≈2 MB) per loop partition, never above the session
      // setting: the loop's exchanges move the contracted graph, not the
      // corpus, so partition count follows ITS cardinality — small enough
      // that a corpus-sized setting would schedule mostly-empty tasks,
      // large enough that a multi-million-edge graph still fans out
      val nEdges = edges0.count() // cheap: scan of the materialized RDD
      conf.set("spark.sql.shuffle.partitions",
        math.max(1L, math.min(prevParts.toLong, nEdges / 125000L + 1L)).toString)
      var rounds = 0
      var labels = labelsOf(edges)
      while (unmerged(labels) > 0) {
        if (rounds >= 16) throw new IllegalStateException(
          s"dedupClusters star contraction did not stabilize in $rounds rounds " +
            "— refusing to return partial labels")
        // checkpoint each round: both star ops self-union their input, so
        // an unmaterialized chain would grow the plan 4×/round, and the
        // label/verify jobs reread the round's result
        val next = smallStar(largeStar(edges)).graftCheckpoint()
        // the superseded round has no consumer left (edges0, which the
        // verification join rereads every iteration, is kept alive)
        if (edges ne edges0) org.apache.spark.sql.graft.Bridge.releaseCheckpoint(edges)
        edges = next
        labels = labelsOf(edges)
        rounds += 1
      }
      System.err.println(s"dedup_clusters: star contraction stabilized in $rounds rounds")
      // edges0 is CALLER-owned — it stays usable after this returns (its
      // blocks fall to the ContextCleaner with the caller's reference);
      // only the loop-owned round intermediates were released above
      labels
    } finally conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  val dedupClustersSql: String =
    s"""WITH RECURSIVE pairs AS ($minhashLshPairsSql),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM nodes
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
       |SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY 1""".stripMargin

  /** Exact n-gram Jaccard top-k via an inverted-index join: a small probe
    * set's shingles (filter pushed into the scan) are broadcast against
    * the corpus shingle stream; sharing ≥1 shingle is the candidate
    * condition, exact |∩|/|∪| ranks the survivors. The corpus side is
    * never shuffled by doc — only the per-(probe, candidate) partial
    * counts move. This is the exact-similarity complement of the
    * MinHash/SimHash sketches. */
  def ngramJaccardTopk(s: SparkSession, dir: String): DataFrame = {
    val topK = 3
    val scored = jaccardScored(s, dir, 20)
      .select(col("query_id").as("probe_id"), col("neighbor_id"), col("jaccard"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("jaccard").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("jaccard"))
  }

  /** The inverted-index scoring frame behind [[ngramJaccardTopk]],
    * parameterized on the probe-set size so [[Retrieval.hybridRrf]] can
    * reuse it as its lexical leg: exact shingle-Jaccard of every
    * (probe, candidate) pair sharing ≥1 shingle, probes broadcast. */
  private[graft] def jaccardScored(s: SparkSession, dir: String, nProbes: Int): DataFrame = {
    import s.implicits._
    val sh = shingled(s, dir)
    val probes = shingledFrom(s,
        Corpus.documents(s, dir).where(col("doc_id") < nProbes))
      .select(col("doc_id").as("probe_id"), col("shingle"))
    val inter = sh.join(broadcast(probes), Seq("shingle"))
      .where(col("doc_id") =!= col("probe_id"))
      .groupBy(col("probe_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_inter"))
    // set sizes from a narrow per-doc pass — not a second full pass over
    // the exploded shingle stream plus a shuffle to re-group it
    val sizes = Corpus.documents(s, dir)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) => (id, shinglesOf(text).size.toLong) }
      .toDF("doc_id", "n")
    inter
      .join(sizes.as("za"), col("probe_id") === col("za.doc_id"))
      .join(sizes.as("zb"), inter("doc_id") === col("zb.doc_id"))
      .select(col("probe_id").as("query_id"), inter("doc_id").as("neighbor_id"),
        (col("n_inter").cast("double") /
          (col("za.n") + col("zb.n") - col("n_inter")).cast("double")).as("jaccard"))
  }

  val ngramJaccardTopkSql: String =
    s"""WITH sh AS MATERIALIZED ($shingledSql),
       |probes AS (SELECT doc_id AS probe_id, shingle FROM sh WHERE doc_id < 20),
       |inter AS (
       |  SELECT p.probe_id, s.doc_id, COUNT(*) AS n_inter
       |  FROM sh s JOIN probes p USING (shingle)
       |  WHERE s.doc_id <> p.probe_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
       |scored AS (
       |  SELECT probe_id, inter.doc_id AS neighbor_id,
       |    CAST(n_inter AS DOUBLE) / (za.n + zb.n - n_inter) AS jaccard
       |  FROM inter
       |  JOIN sizes za ON probe_id = za.doc_id
       |  JOIN sizes zb ON inter.doc_id = zb.doc_id),
       |r AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
       |    ORDER BY jaccard DESC, neighbor_id ASC) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT probe_id, rank, neighbor_id, jaccard FROM r WHERE rank <= 3""".stripMargin

  // truth-side stop-shingle cap: a shingle present in more than this many
  // documents contributes df² candidate pairs to the exact-truth join but
  // only links documents that many OTHER (rarer) shingles already link —
  // on a boilerplate-heavy corpus the hot shingles alone are a quadratic
  // blow-up (round-7 verdict, What's wrong #1). Same STOP-FINGERPRINT
  // discipline as [[TextAnalysis.winnowPairs]]' wMaxDf.
  private[graft] val recallTruthMaxDf = 50L

  /** MinHash-LSH banding recall, measured — the dedup analog of
    * [[Similarity.annRecall]]: what fraction of the pairs that truly have
    * shingle-Jaccard ≥ 0.5 does the 4-band × 2-hash construction surface?
    * One verified-artifact row: (n_truth, n_pairs, n_hit, recall).
    *
    * The truth universe is DF-CAPPED: shingles with document frequency
    * above [[recallTruthMaxDf]] are dropped before the inverted-index
    * self-join, and Jaccard (intersection AND set sizes) is computed over
    * the capped shingle sets — a self-consistent "recall over the capped
    * universe", the standard trade for an exact-truth term whose raw
    * fan-out is Σ_shingle df² (one hot boilerplate shingle at 100 TB is
    * ~df² ≈ 10¹² candidate pairs; capped, per-shingle fan-out is bounded
    * by maxDf² and total candidates stay near-linear in corpus size).
    * Within the capped universe the truth set is still complete by
    * construction: J_capped(a,b) ≥ 0.5 > 0 implies a shared capped
    * shingle, so the equi-join generates every qualifying pair (same
    * family as [[ngramJaccardTopk]]'s candidates — no all-pairs pass).
    * Recall is a statistical estimate of banding quality; it does not
    * need the exhaustive (boilerplate-dominated) pair set to be useful.
    *
    * Three 1-row aggregates broadcast into the output row; recall is
    * NULL-guarded for a degenerate corpus with an empty truth set (Spark's
    * non-ANSI x/0 is NULL, DuckDB's is inf — the CASE makes both NULL). */
  /** The df-capped truth-side shingle stream, pre-checkpoint — split out
    * so PlanAuditSpec can assert the cap sits BELOW the self-join (the
    * checkpoint in [[minhashRecall]] truncates the audited plan). */
  private[graft] def recallCappedShingles(s: SparkSession, dir: String): DataFrame = {
    val dfW = org.apache.spark.sql.expressions.Window.partitionBy(col("shingle"))
    // df as a window count over the exploded shingle stream (the same
    // exchange the inverted-index join needs anyway)
    shingled(s, dir)
      .withColumn("df", count(lit(1)).over(dfW))
      .where(col("df") <= recallTruthMaxDf)
      .select(col("doc_id"), col("shingle"))
  }

  def minhashRecall(s: SparkSession, dir: String): DataFrame = {
    // The brute-force truth chain and the LSH pairs chain are independent
    // until the hit join: overlap their eager materializations from two
    // driver threads (guide §2.6) so one chain's straggler tail back-fills
    // with the other's tasks. Results unchanged — submission order only.
    // dedicated 2-thread pool + local-property propagation: graft.Overlap
    // (the global ForkJoinPool loses the caller's job group — r15 advice)
    val (truth, pairs) = graft.Overlap.both(s.sparkContext)({
      // checkpoint the capped stream: read 2× (inter + sizes), and private
      // to this plan — see winnowPairs for the cache()-vs-checkpoint
      // rationale
      val shc = recallCappedShingles(s, dir).graftCheckpoint()
      val inter = shc.as("a")
        .join(shc.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("n_inter"))
      val sizes = shc.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      inter
        .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
        .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
        .where(col("n_inter").cast("double") /
          (col("za.n") + col("zb.n") - col("n_inter")).cast("double") >= 0.5)
        .select(col("doc_a"), col("doc_b"))
        .graftCheckpoint() // read 2×: count + hit join
    }, {
      minhashLshPairs(s, dir).select(col("doc_a"), col("doc_b"))
        .graftCheckpoint() // read 2×: count + hit join
    })
    val nTruth = truth.agg(count(lit(1)).as("n_truth"))
    val nPairs = pairs.agg(count(lit(1)).as("n_pairs"))
    val nHit = pairs.join(truth, Seq("doc_a", "doc_b"))
      .agg(count(lit(1)).as("n_hit"))
    nTruth.crossJoin(broadcast(nPairs)).crossJoin(broadcast(nHit))
      .select(col("n_truth"), col("n_pairs"), col("n_hit"),
        when(col("n_truth") > 0,
          col("n_hit").cast("double") / col("n_truth").cast("double"))
          .as("recall"))
  }

  // the truth-side shingle CTE is named shT, NOT sh: the embedded
  // $minhashLshPairsSql defines its own MATERIALIZED sh, and DuckDB
  // hoists materialized CTEs to one namespace — same-name shadowing
  // that plain CTEs allowed is a binder error under MATERIALIZED
  val minhashRecallSql: String =
    s"""WITH shT AS MATERIALIZED ($shingledSql),
       |shc AS (
       |  SELECT doc_id, shingle FROM (
       |    SELECT doc_id, shingle, COUNT(*) OVER (PARTITION BY shingle) AS df
       |    FROM shT)
       |  WHERE df <= $recallTruthMaxDf),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
       |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
       |truth AS (
       |  SELECT doc_a, doc_b FROM inter
       |  JOIN sizes za ON doc_a = za.doc_id
       |  JOIN sizes zb ON doc_b = zb.doc_id
       |  WHERE CAST(n_inter AS DOUBLE) / (za.n + zb.n - n_inter) >= 0.5),
       |p AS (SELECT doc_a, doc_b FROM ($minhashLshPairsSql)),
       |hit AS (SELECT COUNT(*) AS c FROM p JOIN truth USING (doc_a, doc_b))
       |SELECT (SELECT COUNT(*) FROM truth) AS n_truth,
       |  (SELECT COUNT(*) FROM p) AS n_pairs,
       |  (SELECT c FROM hit) AS n_hit,
       |  CASE WHEN (SELECT COUNT(*) FROM truth) > 0 THEN
       |    CAST((SELECT c FROM hit) AS DOUBLE)
       |      / CAST((SELECT COUNT(*) FROM truth) AS DOUBLE)
       |  END AS recall""".stripMargin

  /** Cross-source duplication matrix: verified near-dup pairs rolled up by
    * unordered source pair — the report a curation run publishes to answer
    * "which corpora overlap, and how much?" (crawl-vs-crawl boilerplate,
    * wiki mirrors inside a crawl, benchmark bleed between sources) before
    * deciding which side of each overlap to keep. Composes the audited
    * [[minhashLshPairs]] pipeline with two pruned doc_id→source lookups;
    * the pairs frame (vanishing fraction of the corpus) broadcasts onto
    * both, so no new shuffle shape is introduced. */
  def dupSourceMatrix(s: SparkSession, dir: String): DataFrame = {
    val pairs = broadcast(minhashLshPairs(s, dir).select(col("doc_a"), col("doc_b")))
    val src = Corpus.documents(s, dir).select(col("doc_id"), col("source"))
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), Seq("doc_a"))
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), Seq("doc_b"))
      .groupBy(
        least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  val dupSourceMatrixSql: String =
    s"""WITH p AS (SELECT doc_a, doc_b FROM ($minhashLshPairsSql))
       |SELECT LEAST(da.source, db.source) AS source_a,
       |  GREATEST(da.source, db.source) AS source_b,
       |  COUNT(*) AS n_pairs
       |FROM p
       |JOIN documents da ON p.doc_a = da.doc_id
       |JOIN documents db ON p.doc_b = db.doc_id
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // Exact substring-span dedup (ExactSubstr, "Deduplicating Training
  // Data Makes Language Models Better", arXiv:2107.06499 §4.1): find
  // every maximal token span of length >= spanGram whose content occurs
  // more than once in the corpus, keep exactly ONE canonical copy, and
  // mark every other occurrence for removal. The reference paper builds
  // a corpus-wide suffix array; the Spark-first shape is the windowed
  // equivalent — any duplicated substring of >= L tokens contains a
  // duplicated L-token window at every offset, so the marked-window
  // islands per document ARE the maximal duplicated spans.

  /** Window length L: a duplicated substring shorter than this is noise
    * (common phrases), anything >= L is memorization-grade duplication.
    * 10 here (vs the paper's 50 BPE tokens) only because the synthetic
    * docs average ~54 tokens. */
  private[graft] val spanGram = 10

  /** Positioned L-token windows: one (doc_id, pos, gh) row per window
    * occurrence — NOT distinct-per-doc like [[grams13]]: within-doc
    * repeats are real duplication here (the paper dedups them too).
    * Hashes computed in the scan pass with a reused digest, 16-byte
    * binary keys so the exchange never carries window text. */
  /** UTF-8 bytes of the normalized text plus token-start byte offsets and
    * the token count — `split(' ')` boundary semantics over the byte
    * image (trailing empty tokens dropped; `starts(count)` is a sentinel
    * one past a virtual separator, so token j spans
    * `[starts(j), starts(j+1) - 1)`). Factored out of [[posGrams]] so the
    * window/hash-input equivalence is directly property-testable. */
  private[graft] def normByteBounds(text: String): (Array[Byte], Array[Int], Int) = {
    val bytes = TextAnalysis.normText(text)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val len = bytes.length
    var spaces = 0
    var i = 0
    while (i < len) { if (bytes(i) == ' '.toByte) spaces += 1; i += 1 }
    var count = spaces + 1
    val starts = new Array[Int](count + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(count) = len + 1
    // split(' ') drops trailing empty tokens (see TextAnalysis.distinctGrams)
    while (count > 0 && starts(count - 1) == starts(count) - 1) count -= 1
    (bytes, starts, count)
  }

  private[graft] def posGrams(docs: DataFrame, n: Int): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          // The window's md5 input is a byte RANGE of the UTF-8-encoded
          // normalized text: the gram "tok_p .. tok_{p+n-1}" joined by
          // single spaces IS that slice (whitespace already collapsed),
          // and 0x20 never occurs as a UTF-8 continuation byte, so token
          // boundaries are byte positions. No token array, no per-window
          // slice/mkString/getBytes — one encode per document, one digest
          // update per window (`GramSubstringProps` pins hash-input
          // equality against the slice/mkString reference).
          val (bytes, starts, count) = normByteBounds(text)
          if (count < n) Iterator.empty
          else (0 to count - n).iterator.map { p =>
            md.update(bytes, starts(p), starts(p + n) - 1 - starts(p))
            (id, p.toLong, md.digest())
          }
        }
      }
      .toDF("doc_id", "pos", "gh")
  }

  /** Maximal duplicated token spans per document, canonical copy
    * excluded. A window occurrence is REMOVABLE when its hash occurs >= 2
    * times corpus-wide and it is not the canonical (minimum (doc_id,
    * pos)) occurrence; overlapping/adjacent removable windows merge into
    * one span (gaps-and-islands: a new island starts when the next
    * marked pos is > L past the previous, i.e. the windows no longer
    * touch). Output token indices are 0-based inclusive.
    *
    * Scale shape: occurrence marking is groupBy(gh) + equi-join-back
    * rather than a window over gh — count and min(struct) both partial-
    * aggregate map-side, so a boilerplate window with millions of
    * occurrences (the expected hot case — this operator exists BECAUSE
    * of boilerplate) costs its df on the join, never a single-task
    * window partition; the join itself is AQE-skew-splittable. The
    * islands pass shuffles once on doc_id and its window frames are
    * per-document. Nothing carries text past the scan. */
  def substringSpans(s: SparkSession, dir: String): DataFrame =
    substringSpansFrom(posGrams(Corpus.documents(s, dir), spanGram))

  private[graft] def substringSpansFrom(g0: DataFrame): DataFrame = {
    // two consumers of the positioned-window stream (the df aggregate and
    // the join-back); an eager checkpoint of the stream was MEASURED
    // SLOWER (r15: 1.26 → 1.47 s — materializing one row per token
    // position outweighs the second tokenize+digest pass), so both
    // consumers recompute the narrow scan
    val g = g0
    val dup = g.groupBy(col("gh"))
      .agg(count(lit(1)).as("df"),
        min(struct(col("doc_id"), col("pos"))).as("canon"))
      .where(col("df") >= 2)
    val marked = g.join(dup, Seq("gh"))
      .where(!(col("doc_id") === col("canon.doc_id") &&
               col("pos") === col("canon.pos")))
      .select(col("doc_id"), col("pos"))
    islandSpans(marked, spanGram)
  }

  /** Merge marked window positions into maximal spans: consecutive marks
    * closer than the window length belong to one duplicated/contaminated
    * region. One doc_id shuffle; window frames are per-document. Shared
    * by [[substringSpansFrom]] and [[contaminationScrub]]. */
  private def islandSpans(marked: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(byDoc) <= n, 0L)
          .otherwise(1L))
      .withColumn("island", sum(col("brk")).over(byDoc))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n - 1).cast("long")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1L).as("span_len"))
  }

  private def toksSql = TextAnalysis.tokensSql

  /** [[posGrams]] in SQL over an arbitrary documents-shaped relation
    * (`rel` must expose doc_id + text) — parameterized so the composed
    * funnel can window the SURVIVOR set, not the raw corpus. */
  private[graft] def posGramsSqlFor(rel: String): String =
    posGramsSqlForN(rel, spanGram)

  /** [[posGramsSqlFor]] at an arbitrary window length — shared with the
    * 13-gram contamination scrub. */
  private[graft] def posGramsSqlForN(rel: String, n: Int): String =
    s"""SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |  md5(array_to_string(toks[pos+1:pos+$n], ' ')) AS gh
       |FROM (SELECT doc_id, $toksSql AS toks FROM $rel) t,
       |  UNNEST(range(0, len(toks) - ${n - 1})) AS u(pos)
       |WHERE len(toks) >= $n""".stripMargin

  private[graft] def substringSpansSqlFor(rel: String): String =
    s"""WITH g AS (${posGramsSqlFor(rel)}),
       |m AS (SELECT doc_id, pos,
       |        COUNT(*) OVER (PARTITION BY gh) AS df,
       |        ROW_NUMBER() OVER (PARTITION BY gh
       |          ORDER BY doc_id, pos) AS rn
       |      FROM g),
       |d AS (SELECT doc_id, pos FROM m WHERE df >= 2 AND rn > 1),
       |i AS (SELECT doc_id, pos,
       |        CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |               <= $spanGram THEN 0 ELSE 1 END AS brk
       |      FROM d),
       |s AS (SELECT doc_id, pos,
       |        SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |      FROM i)
       |SELECT doc_id, MIN(pos) AS span_start,
       |  MAX(pos) + ${spanGram - 1} AS span_end,
       |  MAX(pos) + ${spanGram - 1} - MIN(pos) + 1 AS span_len
       |FROM s GROUP BY doc_id, island""".stripMargin

  val substringSpansSql: String = substringSpansSqlFor("documents")

  /** The scrub: every document's normalized text with its duplicated
    * spans cut out (canonical copies stay — corpus-wide, exactly one
    * occurrence of every duplicated substring survives, the paper's
    * keep-one policy). Emits the kept-token text plus audit counts, so
    * the pass is reversible in review: n_removed summed over the corpus
    * is the dedup's token savings.
    *
    * Scale shape: spans (vanishing fraction of token positions) join the
    * positioned-token stream as an equi join on doc_id with a range
    * residual — co-partitioned with the rebuild groupBy that follows, so
    * the scrub adds ONE doc_id exchange over [[substringSpans]]. The
    * rebuild is sort-free at the exchange (array_sort of the collected
    * (pos, tok) structs is per-document, in-memory). */
  def substringScrub(s: SparkSession, dir: String): DataFrame =
    substringScrubFrom(Corpus.documents(s, dir))

  private[graft] def substringScrubFrom(docs: DataFrame): DataFrame =
    scrubSpans(docs, substringSpansFrom(posGrams(docs, spanGram)))

  /** Cut `spans`' token ranges out of `docs` and reassemble — the shared
    * scrub epilogue of [[substringScrubFrom]] and [[contaminationScrub]].
    * Spans (a vanishing fraction of token positions) join the positioned
    * token stream as a doc_id equi join with a range residual,
    * co-partitioned with the rebuild groupBy — ONE doc_id exchange. */
  private def scrubSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    // ONE tokenize pass serves the rebuild AND the token totals: spans
    // are disjoint per document (islands merged), so a LEFT join marks
    // each positioned token at most once — kept tokens rebuild the text,
    // the row count is n_tokens, and the marked count is n_removed. The
    // former shape paid a second full tokenize (the docs-side n_tokens
    // projection) for numbers this aggregate already has in hand; the
    // remaining docs join is an id-only scan (no text) that keeps
    // token-less documents in the output.
    val toks = docs
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokensCol(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))
    val rebuilt = toks.join(spans,
      toks("doc_id") === spans("doc_id") &&
        toks("pos").between(spans("span_start"), spans("span_end")),
      "left")
      .select(toks("doc_id").as("doc_id"), col("pos"), col("tok"),
        spans("span_start").isNotNull.as("in_span"))
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ",
          transform(array_sort(
            collect_list(when(!col("in_span"), struct(col("pos"), col("tok"))))),
            e => e.getField("tok"))).as("clean_text"),
        count(lit(1)).as("n_tokens"),
        count(when(!col("in_span"), 1)).as("n_kept"))
    docs
      .select(col("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        (coalesce(col("n_tokens"), lit(0L)) - coalesce(col("n_kept"), lit(0L)))
          .as("n_removed"))
  }

  val substringScrubSql: String =
    s"""WITH spans AS ($substringSpansSql),
       |tok AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, toks[pos+1] AS tok
       |        FROM (SELECT doc_id, $toksSql AS toks FROM documents) t,
       |          UNNEST(range(0, len(toks))) AS u(pos)),
       |kept AS (SELECT k.doc_id, k.pos, k.tok FROM tok k
       |         WHERE NOT EXISTS (SELECT 1 FROM spans s
       |           WHERE s.doc_id = k.doc_id
       |             AND k.pos BETWEEN s.span_start AND s.span_end)),
       |r AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
       |        COUNT(*) AS n_kept
       |      FROM kept GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(r.clean_text, '') AS clean_text,
       |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
       |  CAST(len($toksSql) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
       |FROM documents d LEFT JOIN r ON d.doc_id = r.doc_id""".stripMargin

  // ------------------------------------------------------------------
  // Contamination SCRUB: the surgical complement of the boolean
  // `contamination` family. Flag-and-drop loses a whole document because
  // one benchmark sentence leaked into it; the scrub cuts ONLY the
  // contaminated 13-token spans (the [[substringScrub]] island/cut/
  // rebuild machinery pointed at the eval set instead of at self-
  // duplication) and keeps the rest — the decontamination policy that
  // preserves data at 100 TB instead of bleeding it.
  //
  // Scale shape: the ONLY broadcast is the benchmark's hashed window
  // set (tiny); marked positions come from an equi semi-join on the
  // window hash inside the corpus scan's stream; islands/cut/rebuild
  // add one doc_id exchange (the audited [[scrubSpans]] shape). Within-
  // doc repeats of a benchmark gram are all marked — every leaked
  // occurrence is cut, unlike the keep-one policy of self-dedup.

  def contaminationScrub(s: SparkSession, dir: String): DataFrame = {
    val docs = Corpus.documents(s, dir)
    val bench = posGrams(docs.where(col("doc_id") < contamBench), contamN)
      .select(col("gh")).distinct()
    val corpus = docs.where(col("doc_id") >= contamBench)
    val marked = posGrams(corpus, contamN)
      .join(broadcast(bench), Seq("gh"), "left_semi")
      .select(col("doc_id"), col("pos"))
    scrubSpans(corpus, islandSpans(marked, contamN))
  }

  val contaminationScrubSql: String = {
    val n = contamN
    s"""WITH benchdocs AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id < $contamBench),
       |corpusdocs AS (
       |  SELECT doc_id, text FROM documents WHERE doc_id >= $contamBench),
       |bench AS (SELECT DISTINCT gh FROM (${posGramsSqlForN("benchdocs", n)})),
       |g AS (${posGramsSqlForN("corpusdocs", n)}),
       |d AS (SELECT g.doc_id, g.pos FROM g JOIN bench USING (gh)),
       |i AS (SELECT doc_id, pos,
       |        CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos)
       |               <= $n THEN 0 ELSE 1 END AS brk
       |      FROM d),
       |si AS (SELECT doc_id, pos,
       |        SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |      FROM i),
       |spans AS (SELECT doc_id, MIN(pos) AS span_start,
       |    MAX(pos) + ${n - 1} AS span_end
       |  FROM si GROUP BY doc_id, island),
       |tok AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, toks[pos+1] AS tok
       |        FROM (SELECT doc_id, $toksSql AS toks FROM corpusdocs) t,
       |          UNNEST(range(0, len(toks))) AS u(pos)),
       |kept AS (SELECT k.doc_id, k.pos, k.tok FROM tok k
       |         WHERE NOT EXISTS (SELECT 1 FROM spans sp
       |           WHERE sp.doc_id = k.doc_id
       |             AND k.pos BETWEEN sp.span_start AND sp.span_end)),
       |r AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS clean_text,
       |        COUNT(*) AS n_kept
       |      FROM kept GROUP BY doc_id)
       |SELECT d2.doc_id, COALESCE(r.clean_text, '') AS clean_text,
       |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
       |  CAST(len($toksSql) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
       |FROM corpusdocs d2 LEFT JOIN r ON d2.doc_id = r.doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Benchmark n-gram coverage per source: how much of the eval set's
  // 13-gram vocabulary each source can reproduce — the graded companion
  // to the boolean contamination verdict (a source at 30% coverage is an
  // eval-proximity problem even if no single doc trips the flag).
  //
  // Scale shape: per-(source, gram-hash) distinct rows come straight off
  // the scan (source rides the same row as text — NO doc_id join), the
  // benchmark set broadcasts hashed (16 bytes/gram, the
  // `contamination_hashed` trade), and the rollup is one small
  // per-source aggregate; sources with zero coverage surface via a left
  // join from the distinct source list.

  def ngramCoverage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Corpus.documents(s, dir)
    val bench = grams13(docs.where(col("doc_id") < contamBench))
      .select(graft.functions.HashFunctions.md5BinCol(col("gram")).as("gh")).distinct()
      .graftCheckpoint() // two consumers: the count and the semi-join
    val nBench = bench.agg(count(lit(1)).as("n_bench"))
    val corpus = docs.where(col("doc_id") >= contamBench)
    val srcGrams = corpus
      .select(col("source"), col("text")).as[(String, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (src, text) =>
          // substring-built distinct grams (the [[grams13]] kernel)
          val set = TextAnalysis.distinctGrams(text, contamN)
          if (set == null) Iterator.empty
          else {
            import scala.jdk.CollectionConverters._
            set.iterator.asScala.map(g => (src, md.digest(g.getBytes("UTF-8"))))
          }
        }
      }
      .toDF("source", "gh")
      .distinct()
    val covered = srcGrams
      .join(broadcast(bench), Seq("gh"), "left_semi")
      .groupBy(col("source")).agg(count(lit(1)).as("n_covered"))
    corpus.select(col("source")).distinct()
      .join(covered, Seq("source"), "left")
      .crossJoin(broadcast(nBench))
      .select(col("source"),
        coalesce(col("n_covered"), lit(0L)).as("n_covered"),
        col("n_bench"),
        round(coalesce(col("n_covered"), lit(0L)).cast("double")
          / col("n_bench").cast("double"), 6).as("coverage"))
  }

  val ngramCoverageSql: String =
    s"""WITH bench AS (
       |  SELECT DISTINCT unhex(md5(gram)) AS gh
       |  FROM (${gramsSql(s"doc_id < $contamBench")})),
       |nb AS (SELECT COUNT(*) AS n_bench FROM bench),
       |cg AS (SELECT DISTINCT d.source, unhex(md5(g.gram)) AS gh
       |       FROM (${gramsSql(s"doc_id >= $contamBench")}) g
       |       JOIN documents d USING (doc_id)),
       |cov AS (SELECT source, COUNT(*) AS n_covered FROM cg
       |        WHERE gh IN (SELECT gh FROM bench) GROUP BY 1),
       |srcs AS (SELECT DISTINCT source FROM documents
       |         WHERE doc_id >= $contamBench)
       |SELECT s.source,
       |  CAST(COALESCE(cov.n_covered, 0) AS BIGINT) AS n_covered,
       |  CAST(nb.n_bench AS BIGINT) AS n_bench,
       |  round(CAST(COALESCE(cov.n_covered, 0) AS DOUBLE) / nb.n_bench, 6)
       |    AS coverage
       |FROM srcs s LEFT JOIN cov ON s.source = cov.source CROSS JOIN nb""".stripMargin

  // ------------------------------------------------------------------
  // Incremental ingest dedup: the daily-batch production shape. An
  // accumulated snapshot already exists (and is already deduped); only
  // the incoming batch must be checked — against the snapshot AND
  // within itself. The snapshot side reduces to its fingerprint SET, so
  // at 100 TB the standing state is one 16-byte-hash column (or its
  // Bloom digest, [[contaminationBloom]]'s trade), never the corpus.

  /** Split point for the gate corpus: docs with id < snapshotCut play
    * the accumulated snapshot ([[contamBench]]'s convention, sized so
    * both sides are non-trivial). */
  private[graft] val snapshotCut = 250

  /** Verdict per INCOMING doc: 'snapshot_dup' (content already in the
    * accumulated corpus), 'batch_dup' (an earlier doc of the same batch
    * — smallest id wins, replay-stable), or 'new'. One fingerprint
    * projection per side; the snapshot set left-joins in as 16-byte md5
    * keys; within-batch keep-one is a window min on the SAME exchange.
    * Nothing re-reads or re-shuffles snapshot text.
    *
    * Gate non-vacuity (the `pii_scrub` convention): the synthetic corpus
    * has zero exact-duplicate content, so the QUERY ENTRY deterministically
    * replays some content into the incoming batch — id % 7 docs carry a
    * snapshot doc's text, id % 89 docs carry a batch-mate's — making all
    * three verdicts reachable at every SF. The operator surface
    * ([[dedupIncrementalFrom]]) takes snapshot/incoming frames as-is. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Corpus.documents(s, dir)
    val snapshot = docs.where(col("doc_id") < snapshotCut)
    val snapTexts = snapshot
      .select(col("doc_id").as("sid"), col("text").as("snap_text"))
    val pairTexts = docs
      .where(col("doc_id").isin(snapshotCut.toLong, snapshotCut + 1L))
      .select(col("doc_id").as("pid"), col("text").as("pair_text"))
    // LEFT joins + null-guarded replay: the augmentation assumes doc_ids
    // are contiguous from 0 with >= snapshotCut+2 docs; on a sparser
    // corpus an inner join would silently DROP incoming rows (and the
    // oracle, shaped the same way, would stay green while the probe went
    // partially vacuous) — missing replay sources now fall back to the
    // doc's own text instead
    val incoming = docs.where(col("doc_id") >= snapshotCut)
      .select(col("doc_id"), col("text"))
      .join(broadcast(snapTexts), col("doc_id") % snapshotCut === col("sid"), "left")
      .join(broadcast(pairTexts),
        col("doc_id") % 2 + snapshotCut === col("pid"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0 && col("snap_text").isNotNull, col("snap_text"))
          .when(col("doc_id") % 89 === 0 && col("pair_text").isNotNull, col("pair_text"))
          .otherwise(col("text")).as("text"))
    dedupIncrementalFrom(snapshot, incoming)
  }

  /** The operator surface: incoming-batch verdicts against an arbitrary
    * snapshot frame. */
  private[graft] def dedupIncrementalFrom(
      snapshot: DataFrame, incoming: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val snap = snapshot
      .select(graft.functions.HashFunctions
        .md5BinCol(TextAnalysis.normTextCol(col("text"))).as("fp"))
      .distinct()
    val inc = incoming.select(col("doc_id"),
      graft.functions.HashFunctions
        .md5BinCol(TextAnalysis.normTextCol(col("text"))).as("fp"))
    val byFp = Window.partitionBy(col("fp"))
    inc.join(snap.withColumn("in_snapshot", lit(true)), Seq("fp"), "left")
      .withColumn("first_id", min(col("doc_id")).over(byFp))
      .select(col("doc_id"),
        when(col("in_snapshot"), lit("snapshot_dup"))
          .when(col("doc_id") =!= col("first_id"), lit("batch_dup"))
          .otherwise(lit("new")).as("verdict"))
  }

  val dedupIncrementalSql: String =
    s"""WITH inc0 AS (
       |  SELECT i.doc_id,
       |    CASE WHEN i.doc_id % 7 = 0 AND s.text IS NOT NULL THEN s.text
       |         WHEN i.doc_id % 89 = 0 AND p.text IS NOT NULL THEN p.text
       |         ELSE i.text END AS text
       |  FROM documents i
       |  LEFT JOIN documents s ON s.doc_id = i.doc_id % $snapshotCut
       |  LEFT JOIN documents p ON p.doc_id = $snapshotCut + (i.doc_id % 2)
       |  WHERE i.doc_id >= $snapshotCut),
       |snap AS (
       |  SELECT DISTINCT ${TextAnalysis.fingerprintSql} AS fp
       |  FROM documents WHERE doc_id < $snapshotCut),
       |inc AS (
       |  SELECT doc_id, ${TextAnalysis.fingerprintSql} AS fp
       |  FROM inc0),
       |m AS (SELECT inc.doc_id, inc.fp,
       |        snap.fp IS NOT NULL AS in_snapshot,
       |        MIN(inc.doc_id) OVER (PARTITION BY inc.fp) AS first_id
       |      FROM inc LEFT JOIN snap ON inc.fp = snap.fp)
       |SELECT doc_id,
       |  CASE WHEN in_snapshot THEN 'snapshot_dup'
       |       WHEN doc_id <> first_id THEN 'batch_dup'
       |       ELSE 'new' END AS verdict
       |FROM m""".stripMargin

  /** The composed end-to-end dedup funnel — the one-row report a dedup
    * run publishes, mirroring [[Curation.curationPipeline]]'s role for
    * filtering: exact dedup (keep lowest id per fingerprint) ≻ near-dup
    * clustering (keep each MinHash-LSH cluster's representative) ≻
    * substring-span scrub OVER THE SURVIVORS (spans recomputed on the
    * post-drop corpus — a span whose only other copy lived in a dropped
    * doc is already gone, and must not be double-counted). Attribution
    * is first-failing-stage, `corpus_retention`'s precedence convention.
    *
    * Scale shape: pure composition of three audited pipelines (one
    * fingerprint exchange; banded LSH + star contraction; the
    * partial-agg span join) plus 1-row aggregates broadcast-crossed
    * into the report — no new join shapes, nothing quadratic. */
  def dedupFunnel(s: SparkSession, dir: String): DataFrame = {
    val docs = Corpus.documents(s, dir)
    val withFp = docs.select(col("doc_id"),
      TextAnalysis.fingerprintCol(col("text")).as("fingerprint"))
    // The dropped-id frames are consumed by several report aggregates AND
    // by the survivor set feeding the span scrub — unmaterialized, each
    // consumer re-ran the whole upstream subtree (the exact-dedup
    // fingerprint pass 4-6×, measured round 15). Checkpoint the tiny id
    // frames once: every pass over the corpus below now happens exactly
    // once (fingerprints ×2 — withFp + dedupExact's own —, the survivor
    // posGrams, and ONE shared tokenize for the in/kept token totals).
    // The exact-dedup and LSH-cluster pipelines are independent until
    // `dropped`, and each materializes eagerly (localCheckpoint): overlap
    // the two job chains (guide §2.6 — actions are only sequential
    // because the driver calls them sequentially) so the LSH pipeline's
    // straggler tails back-fill with fingerprint-pass tasks. Results are
    // unchanged — only the submission order is concurrent.
    // dedicated 2-thread pool + local-property propagation: graft.Overlap
    // (the global ForkJoinPool loses the caller's job group — r15 advice)
    val (exactDropped, nearDroppedAll) = graft.Overlap.both(s.sparkContext)(
      withFp.join(dedupExact(s, dir), Seq("fingerprint"))
        .where(col("doc_id") =!= col("keep_id"))
        .select(col("doc_id"))
        .graftCheckpoint(),
      dedupClusters(s, dir)
        .where(col("doc_id") =!= col("cluster_id"))
        .select(col("doc_id"))
        .graftCheckpoint())
    val nearDropped = nearDroppedAll.join(exactDropped, Seq("doc_id"), "left_anti")
    val dropped = exactDropped.union(nearDroppedAll).distinct().graftCheckpoint()
    val survivors = docs.join(dropped, Seq("doc_id"), "left_anti")
    val spans = substringSpansFrom(posGrams(survivors, spanGram))
    // one tokenize pass serves both the corpus-in and kept-docs totals:
    // the dropped flag rides a broadcast left join instead of a second
    // tokenize + semi-join pass
    val tok = docs.select(col("doc_id"),
        size(TextAnalysis.tokensCol(col("text"))).cast("long").as("nt"))
      .join(broadcast(dropped.withColumn("is_dropped", lit(true))),
        Seq("doc_id"), "left")
    val aDocs = tok.agg(count(lit(1)).as("n_docs"), sum(col("nt")).as("tokens_in"),
      count(when(col("is_dropped").isNull, 1)).as("n_docs_kept"),
      sum(when(col("is_dropped").isNull, col("nt"))).as("tokens_kept_docs"))
    val aEx = exactDropped.agg(count(lit(1)).as("n_exact_dropped"))
    val aNear = nearDropped.agg(count(lit(1)).as("n_near_dropped"))
    val aScrub = spans.agg(
      coalesce(sum(col("span_len")), lit(0L)).as("tokens_scrubbed"))
    aDocs.crossJoin(broadcast(aEx)).crossJoin(broadcast(aNear))
      .crossJoin(broadcast(aScrub))
      .select(col("n_docs"), col("n_exact_dropped"), col("n_near_dropped"),
        col("n_docs_kept"), col("tokens_in"), col("tokens_kept_docs"),
        col("tokens_scrubbed"),
        (col("tokens_kept_docs") - col("tokens_scrubbed")).as("tokens_out"))
  }

  val dedupFunnelSql: String =
    s"""WITH RECURSIVE pairs AS ($minhashLshPairsSql),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS doc_id FROM edges),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM nodes
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |cl AS (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY 1),
       |ex AS ($dedupExactSql),
       |fp AS (SELECT doc_id, ${TextAnalysis.fingerprintSql} AS fingerprint
       |       FROM documents),
       |exdrop AS (SELECT fp.doc_id FROM fp JOIN ex USING (fingerprint)
       |           WHERE fp.doc_id <> ex.keep_id),
       |neardropall AS (SELECT doc_id FROM cl WHERE doc_id <> cluster_id),
       |neardrop AS (SELECT doc_id FROM neardropall
       |             WHERE doc_id NOT IN (SELECT doc_id FROM exdrop)),
       |surv AS (SELECT d.doc_id, d.text FROM documents d
       |         WHERE d.doc_id NOT IN (SELECT doc_id FROM exdrop
       |                                UNION SELECT doc_id FROM neardropall)),
       |spans AS (SELECT * FROM (${substringSpansSqlFor("surv")})),
       |tok AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS nt
       |        FROM documents),
       |adocs AS (SELECT COUNT(*) AS n_docs, SUM(nt) AS tokens_in FROM tok),
       |aex AS (SELECT COUNT(*) AS n_exact_dropped FROM exdrop),
       |anear AS (SELECT COUNT(*) AS n_near_dropped FROM neardrop),
       |asurv AS (SELECT COUNT(*) AS n_docs_kept, SUM(nt) AS tokens_kept_docs
       |          FROM tok JOIN surv USING (doc_id)),
       |ascrub AS (SELECT COALESCE(SUM(span_len), 0) AS tokens_scrubbed
       |           FROM spans)
       |SELECT n_docs, n_exact_dropped, n_near_dropped, n_docs_kept,
       |  CAST(tokens_in AS BIGINT) AS tokens_in,
       |  CAST(tokens_kept_docs AS BIGINT) AS tokens_kept_docs,
       |  CAST(tokens_scrubbed AS BIGINT) AS tokens_scrubbed,
       |  CAST(tokens_kept_docs - tokens_scrubbed AS BIGINT) AS tokens_out
       |FROM adocs, aex, anear, asurv, ascrub""".stripMargin

  // ------------------------------------------------------------------
  // Line-level boilerplate dedup: a line that recurs across many
  // documents (nav bars, footers, cookie banners) is template
  // boilerplate, not content — count each normalized line's DOCUMENT
  // frequency and scrub lines whose df reaches the cut. This is the
  // line-wise dedup pass web-corpus pipelines run between exact and
  // near-dup document dedup (cf. RefinedWeb, arXiv:2306.01116 §3.3).
  //
  // Scale shape: one hash-partitioned groupBy on the normalized line
  // for the df count — partial aggregation does the heavy lifting
  // map-side, because hot boilerplate lines are exactly the ones that
  // pre-aggregate well — then one equi join of the (df-filtered, tiny)
  // boilerplate set back onto the exploded lines, broadcast when it
  // fits. Nothing quadratic: no line ever meets another line except
  // through the aggregate.
  //
  // Gate non-vacuity (the `pii_scrub` convention): the synthetic corpus
  // is single-line word soup, so the QUERY ENTRIES deterministically
  // wrap each doc in template lines (per-source header/footer, plus a
  // corpus-wide promo line on every third doc) before scrubbing — both
  // engines apply the identical wrap. The operator surface
  // ([[boilerplateLinesFrom]] / [[lineScrubFrom]]) takes any
  // (doc_id, text) frame with real newlines as-is.

  /** A line is boilerplate when it appears in at least this many docs. */
  private[graft] val lineDfCut = 5L

  /** How many boilerplate lines the report query returns. */
  private[graft] val boilerTopK = 50

  /** The deterministic multi-line wrap of the gate corpus (Spark side).
    * `concat_ws` skips the NULL the `when` yields on non-promo docs —
    * same skip-NULL semantics as the oracle's `concat_ws`. */
  private def augmentedDocs(s: SparkSession, dir: String): DataFrame =
    Corpus.documents(s, dir).select(col("doc_id"),
      concat_ws("\n",
        concat(lit("nav home about "), col("source")),
        col("text"),
        when(col("doc_id") % 3 === 0, lit("subscribe to our newsletter today")),
        concat(lit("copyright all rights reserved "), col("source")))
        .as("text"))

  /** [[augmentedDocs]] in DuckDB SQL (a per-doc scalar over `documents`). */
  private val augLinesSql: String =
    """concat_ws(chr(10), 'nav home about ' || source, text,
      |    CASE WHEN doc_id % 3 = 0 THEN 'subscribe to our newsletter today' END,
      |    'copyright all rights reserved ' || source)""".stripMargin

  /** Explode a (doc_id, text) frame into (doc_id, pos, line, norm_line)
    * — one row per physical line, normalized with the ONE canonical
    * [[TextAnalysis.normTextCol]] so line identity matches document
    * fingerprint identity rules. */
  private def linesOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
      .withColumn("norm_line", TextAnalysis.normTextCol(col("line")))

  /** Normalized lines with document frequency >= [[lineDfCut]] — the
    * boilerplate set. distinct() first so a line repeated WITHIN one doc
    * counts once toward df. */
  private def boilerSetOf(lines: DataFrame): DataFrame =
    lines.select(col("doc_id"), col("norm_line")).distinct()
      .groupBy(col("norm_line")).agg(count(lit(1)).as("df"))
      .where(col("df") >= lineDfCut)

  /** Report query: the top boilerplate lines by document frequency, with
    * the share of docs each line appears in. */
  def boilerplateLines(s: SparkSession, dir: String): DataFrame =
    boilerplateLinesFrom(augmentedDocs(s, dir))

  private[graft] def boilerplateLinesFrom(docs: DataFrame): DataFrame = {
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    boilerSetOf(linesOf(docs))
      .crossJoin(broadcast(nDocs))
      .select(col("norm_line").as("line"), col("df"),
        (col("df").cast("double") / col("n_docs").cast("double"))
          .as("doc_share"))
      .orderBy(col("df").desc, col("line"))
      .limit(boilerTopK)
  }

  /** The shared aug/sp/lines(+df-cut b) CTE block of both line-dedup
    * oracles — ONE copy of the line explosion and the df cut, with the
    * per-line identity going through the canonical
    * [[TextAnalysis.normTextSqlFor]]. */
  private def lineCtesSql: String =
    s"""aug AS (SELECT doc_id, $augLinesSql AS t FROM documents),
       |sp AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM aug),
       |lines AS (SELECT doc_id, CAST(pos AS BIGINT) AS pos, ls[pos+1] AS line,
       |    ${TextAnalysis.normTextSqlFor("ls[pos+1]")} AS norm_line
       |  FROM sp, UNNEST(range(0, len(ls))) AS u(pos)),
       |b AS (SELECT norm_line FROM (SELECT DISTINCT doc_id, norm_line FROM lines)
       |  GROUP BY 1 HAVING COUNT(*) >= $lineDfCut)""".stripMargin

  val boilerplateLinesSql: String =
    s"""WITH $lineCtesSql,
       |d AS (SELECT norm_line AS line, CAST(COUNT(*) AS BIGINT) AS df
       |  FROM (SELECT DISTINCT doc_id, norm_line FROM lines)
       |  GROUP BY 1 HAVING COUNT(*) >= $lineDfCut),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents)
       |SELECT line, df, CAST(df AS DOUBLE) / n_docs AS doc_share
       |FROM d, n ORDER BY df DESC, line LIMIT $boilerTopK""".stripMargin

  /** Scrub query: per-doc line counts and the document reassembled from
    * its non-boilerplate lines in original order. collect_list skips the
    * NULL the `when` yields on boilerplate rows; array_sort on the
    * (pos, line) struct restores physical order. */
  def lineScrub(s: SparkSession, dir: String): DataFrame =
    lineScrubFrom(augmentedDocs(s, dir))

  private[graft] def lineScrubFrom(docs: DataFrame): DataFrame = {
    val lines = linesOf(docs)
    val boiler = boilerSetOf(lines)
      .select(col("norm_line"), lit(true).as("is_boiler"))
    lines.join(broadcast(boiler), Seq("norm_line"), "left")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("is_boiler"), 1L).otherwise(0L)).as("n_dropped"),
        concat_ws("\n", transform(
          array_sort(collect_list(
            when(coalesce(col("is_boiler"), lit(false)) === false,
              struct(col("pos"), col("line"))))),
          x => x("line"))).as("clean_text"))
  }

  // ------------------------------------------------------------------
  // Incremental line-df snapshot: the daily-ingest shape for the
  // RefinedWeb boilerplate pass (the round-9 verdict's Missing #3 — the
  // exact and fuzzy dedup families had their incremental twins, the
  // line-df family didn't: a daily batch could not update per-line
  // document frequencies without rescanning the corpus).
  //
  // The standing state is (norm_line, df) — bounded by the number of
  // DISTINCT lines (template-bounded at web scale, Heaps-law-ish), never
  // by corpus volume; a production deployment stores the 16-byte line
  // hash instead of the text ([[dedupIncrementalFrom]]'s fingerprint
  // trade) and keeps the text only for report rows. Merging a daily
  // batch costs one scan of the BATCH plus a line-key union-aggregate
  // against the state; the accumulated corpus is never re-read. The
  // replay guard is an ingest watermark carried with the state (doc ids
  // are monotone in an append-only ingest): a replayed batch merges
  // zero docs, so the merge is idempotent — the snapshot-precedence
  // discipline in counter form.

  /** Per-line document-frequency state of a (doc_id, text) frame:
    * (norm_line, df), within-doc repeats counted once — the df aggregate
    * of [[boilerSetOf]] WITHOUT the cut, because the state must remember
    * sub-threshold lines (tomorrow's batch may push them over). */
  private[graft] def lineDfStateOf(docs: DataFrame): DataFrame =
    linesOf(docs).select(col("doc_id"), col("norm_line")).distinct()
      .groupBy(col("norm_line")).agg(count(lit(1)).as("df"))

  /** Merge an incoming batch into the standing state without touching
    * the accumulated corpus: count the batch's per-line distinct docs,
    * add onto the snapshot counts. Docs at or below the state's ingest
    * `watermark` are dropped first — replaying yesterday's batch (the
    * at-least-once ingest failure mode) merges nothing
    * (`LineDedupSpec` pins merge-twice == merge-once). */
  private[graft] def mergeLineDf(
      state: DataFrame, watermark: Long, incoming: DataFrame): DataFrame =
    state.unionByName(
        lineDfStateOf(incoming.where(col("doc_id") > watermark)))
      .groupBy(col("norm_line")).agg(sum(col("df")).as("df"))

  /** Gate entry (`boilerplate_incremental`): the snapshot half's line-df
    * state (computed inline here; standing storage in production) merged
    * with the incoming half, reporting the post-merge boilerplate set —
    * which must equal the FULL-corpus [[boilerplateLines]] recompute
    * exactly, so the entry shares its oracle (the strongest form of the
    * incremental ≡ recompute contract). Doc totals come from stored
    * counters (snapshot count + batch count), not a corpus rescan. */
  def boilerplateIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = augmentedDocs(s, dir)
    val snapDocs = docs.where(col("doc_id") < snapshotCut)
    val incoming = docs.where(col("doc_id") >= snapshotCut)
    val wm = snapshotCut - 1L
    val merged = mergeLineDf(lineDfStateOf(snapDocs), wm, incoming)
    // in production both counts are counters carried with the state —
    // neither touches accumulated text
    val nDocs = snapDocs.agg(count(lit(1)).as("n_snap"))
      .crossJoin(incoming.where(col("doc_id") > wm)
        .agg(count(lit(1)).as("n_inc")))
      .select((col("n_snap") + col("n_inc")).as("n_docs"))
    merged.where(col("df") >= lineDfCut)
      .crossJoin(broadcast(nDocs))
      .select(col("norm_line").as("line"), col("df"),
        (col("df").cast("double") / col("n_docs").cast("double"))
          .as("doc_share"))
      .orderBy(col("df").desc, col("line"))
      .limit(boilerTopK)
  }

  // ------------------------------------------------------------------
  // Near-dup incremental ingest: the LSH analog of [[dedupIncremental]].
  // The accumulated snapshot keeps only its per-doc minhash signatures
  // (k 8-hex minima + one count — a few dozen bytes/doc, the standing
  // state a 100 TB ingest pipeline can actually afford); each incoming
  // batch is signed with the identical kernel, candidates come from a
  // band-key equi join (snapshot side × batch side, never batch × batch
  // all-pairs), and only candidate docs pay the exact-Jaccard
  // verification. Verdict per incoming doc: 'near_dup' (≥0.5 Jaccard
  // with some snapshot doc; earliest such doc + strongest similarity
  // reported) or 'new'.
  //
  // Gate non-vacuity (the [[dedupIncremental]] convention): the corpus
  // has no natural cross-half near-dups, so the QUERY ENTRY replays
  // id % 7 snapshot texts into the batch with a short appended tail —
  // high-Jaccard-but-not-exact content only the near-dup path can
  // catch. The operator surface ([[neardupIncrementalFrom]]) takes
  // snapshot/incoming frames as-is.

  def neardupIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = Corpus.documents(s, dir)
    val snapshot = docs.where(col("doc_id") < snapshotCut)
      .select(col("doc_id"), col("text"))
    val snapTexts = snapshot
      .select(col("doc_id").as("sid"), col("text").as("snap_text"))
    // LEFT join + null guard: same sparse-corpus protection as
    // [[dedupIncremental]]'s replay augmentation
    val incoming = docs.where(col("doc_id") >= snapshotCut)
      .join(broadcast(snapTexts), col("doc_id") % snapshotCut === col("sid"), "left")
      .select(col("doc_id"),
        when(col("doc_id") % 7 === 0 && col("snap_text").isNotNull,
          concat(col("snap_text"), lit(" subscribe to the feed today")))
          .otherwise(col("text")).as("text"))
    neardupIncrementalFrom(s, snapshot, incoming)
  }

  /** The operator surface: near-dup verdicts for an incoming batch
    * against an arbitrary snapshot frame. Same materialization
    * discipline as [[minhashLshPairsImpl]]: the expensive md5 signature
    * pass runs once per side; shingles are recomputed for candidate
    * docs only. */
  private[graft] def neardupIncrementalFrom(
      s: SparkSession, snapshot: DataFrame, incoming: DataFrame): DataFrame = {
    val nBands = numMinhash / bandSize
    // NOT overlapped (guide §2.6 measured as a wash here, r15): unlike
    // dedupFunnel/minhashRecall's shuffle-heavy chains, the two signature
    // passes are CPU-bound codegen scans that each saturate the cores on
    // their own — concurrent submission measured +2.68/−0.42/+0.15/+0.02 s
    // across four same-window A/B pairs (median: a small loss from
    // contention), so they stay sequential.
    val sigS = minhashPerDocFrom(s, snapshot).toDF("doc_id", "mh", "n_shingles")
      .graftCheckpoint()
    val sigI = minhashPerDocFrom(s, incoming).toDF("doc_id", "mh", "n_shingles")
      .graftCheckpoint()
    def bandsOf(sig: DataFrame): DataFrame = {
      val keyCols = (0 until nBands).map { b =>
        concat_ws("|", (0 until bandSize).map(j => col("mh")(b * bandSize + j)): _*)
      }
      sig.select(col("doc_id"), array(keyCols: _*).as("keys"))
        .select(col("doc_id"), col("keys"),
          posexplode(col("keys")).as(Seq("band", "key")))
    }
    // cross-side first-band rule: a multi-band collision is kept only in
    // its first colliding band — exactly-once candidates, no distinct
    val firstBand = coalesce(
      (0 until nBands).map(b =>
        when(col("l.keys")(b) === col("r.keys")(b), lit(b))): _*)
    val candidates = bandsOf(sigS).as("l").join(bandsOf(sigI).as("r"),
        col("l.band") === col("r.band") && col("l.key") === col("r.key"))
      .where(col("l.band") === firstBand)
      .select(col("l.doc_id").as("sid"), col("r.doc_id").as("doc_id"))
      .graftCheckpoint(false)
    val candS = snapshot.join(
      broadcast(candidates.select(col("sid").as("doc_id")).distinct()),
      Seq("doc_id"), "left_semi")
    val candI = incoming.join(
      broadcast(candidates.select(col("doc_id")).distinct()),
      Seq("doc_id"), "left_semi")
    val shS = shingledFrom(s, candS).toDF("s_id", "s_shingle")
    val shI = shingledFrom(s, candI).toDF("i_id", "i_shingle")
    val inter = broadcast(candidates)
      .join(shS, col("sid") === col("s_id"))
      .join(shI, col("doc_id") === col("i_id")
        && col("s_shingle") === col("i_shingle"))
      .groupBy(col("sid"), col("doc_id"))
      .agg(count(lit(1)).as("n_inter"))
    val sizesS = sigS.select(col("doc_id").as("sid"), col("n_shingles").as("ns_s"))
    val sizesI = sigI.select(col("doc_id"), col("n_shingles").as("ns_i"))
    val best = inter
      .join(sizesS, Seq("sid")).join(sizesI, Seq("doc_id"))
      .select(col("sid"), col("doc_id"),
        (col("n_inter").cast("double") /
          (col("ns_s") + col("ns_i") - col("n_inter")).cast("double"))
          .as("jaccard"))
      .where(col("jaccard") >= 0.5)
      .groupBy(col("doc_id"))
      .agg(min(col("sid")).as("match_sid"), max(col("jaccard")).as("best_jaccard"))
      // eager, and small by construction (only flagged near-dups):
      // materializing it ends the last read of the signature/candidate
      // checkpoints, so their blocks can be freed NOW rather than
      // lingering until GC across the rest of a 117-query run
      .graftCheckpoint()
    Seq(sigS, sigI, candidates)
      .foreach(org.apache.spark.sql.graft.Bridge.releaseCheckpoint)
    incoming.select(col("doc_id"))
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("match_sid").isNotNull, lit("near_dup"))
          .otherwise(lit("new")).as("verdict"),
        col("match_sid"), col("best_jaccard"))
  }

  val neardupIncrementalSql: String = {
    // band index prefixed INSIDE the digest (the bandKeysOf convention:
    // 'band index || minima slices') so a cross-band slice coincidence
    // cannot admit an oracle-only candidate — the Scala side joins on an
    // explicit band column, and the oracle must partition the same way
    val bandExprs = (0 until numMinhash / bandSize).map { b =>
      val parts = (0 until bandSize).map(j => s"mh${b * bandSize + j}")
        .mkString(" || '|' || ")
      s"md5('$b|' || $parts)"
    }.mkString(", ")
    s"""WITH snap AS (SELECT doc_id, text FROM documents
       |  WHERE doc_id < $snapshotCut),
       |inc AS (
       |  SELECT i.doc_id,
       |    CASE WHEN i.doc_id % 7 = 0 AND s.text IS NOT NULL
       |      THEN s.text || ' subscribe to the feed today'
       |      ELSE i.text END AS text
       |  FROM documents i LEFT JOIN documents s ON s.doc_id = i.doc_id % $snapshotCut
       |  WHERE i.doc_id >= $snapshotCut),
       |sh_s AS (${shingledSqlFor("snap")}),
       |sh_i AS (${shingledSqlFor("inc")}),
       |sig_s AS (SELECT doc_id, $mhMinsSql FROM sh_s GROUP BY doc_id),
       |sig_i AS (SELECT doc_id, $mhMinsSql FROM sh_i GROUP BY doc_id),
       |b_s AS (SELECT doc_id, UNNEST([$bandExprs]) AS band_key FROM sig_s),
       |b_i AS (SELECT doc_id, UNNEST([$bandExprs]) AS band_key FROM sig_i),
       |cand AS (SELECT DISTINCT l.doc_id AS sid, r.doc_id AS doc_id
       |  FROM b_s l JOIN b_i r ON l.band_key = r.band_key),
       |sizes_s AS (SELECT doc_id, COUNT(*) AS n FROM sh_s GROUP BY 1),
       |sizes_i AS (SELECT doc_id, COUNT(*) AS n FROM sh_i GROUP BY 1),
       |inter AS (SELECT cand.sid, cand.doc_id, COUNT(*) AS n_inter
       |  FROM cand
       |  JOIN sh_s sa ON cand.sid = sa.doc_id
       |  JOIN sh_i sb ON cand.doc_id = sb.doc_id AND sa.shingle = sb.shingle
       |  GROUP BY 1, 2),
       |best AS (
       |  SELECT doc_id, MIN(sid) AS match_sid, MAX(j) AS best_jaccard
       |  FROM (SELECT inter.doc_id, inter.sid,
       |      CAST(n_inter AS DOUBLE) / (zs.n + zi.n - n_inter) AS j
       |    FROM inter
       |    JOIN sizes_s zs ON inter.sid = zs.doc_id
       |    JOIN sizes_i zi ON inter.doc_id = zi.doc_id
       |    WHERE CAST(n_inter AS DOUBLE) / (zs.n + zi.n - n_inter) >= 0.5)
       |  GROUP BY 1)
       |SELECT i.doc_id,
       |  CASE WHEN b.match_sid IS NOT NULL THEN 'near_dup' ELSE 'new' END AS verdict,
       |  b.match_sid, b.best_jaccard
       |FROM inc i LEFT JOIN best b ON i.doc_id = b.doc_id""".stripMargin
  }

  val lineScrubSql: String =
    s"""WITH $lineCtesSql,
       |m AS (SELECT l.doc_id, l.pos, l.line,
       |    b.norm_line IS NOT NULL AS is_b
       |  FROM lines l LEFT JOIN b ON l.norm_line = b.norm_line)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines,
       |  CAST(SUM(CASE WHEN is_b THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       |  COALESCE(string_agg(CASE WHEN NOT is_b THEN line END,
       |    chr(10) ORDER BY pos), '') AS clean_text
       |FROM m GROUP BY doc_id""".stripMargin
}
