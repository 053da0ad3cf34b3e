package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Curation, Dedup, Packing, TextAnalysis}

/** Invariants of the curation/packing operators that the row-level oracle
  * compare can't express: packing's prefix-sum recurrence, sampling's
  * determinism and stratum behavior, mixture-weight normalization.
  */
class PipelineOpsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  // shared, never-stopped session (suites in one JVM would otherwise
  // tear down each other's SparkContext)
  private lazy val spark: SparkSession = SparkTestSession.spark

  test("pack_chunks offsets are the exact running total in doc_id order") {
    val rows = Packing.packChunks(spark, sf)
      .select("doc_id", "n_tokens", "start_offset", "first_chunk", "last_chunk", "n_chunks")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.head._3 === 0L, "first doc must start at offset 0")
    rows.sliding(2).foreach {
      case Array((_, n, start, _, _, _), (id2, _, start2, _, _, _)) =>
        assert(start2 === start + n, s"offset recurrence broken at doc $id2")
      case _ => ()
    }
    rows.foreach { case (id, n, start, first, last, nc) =>
      val span = math.max(n, 1L)
      assert(first === start / 2048, s"first_chunk wrong for doc $id")
      assert(last === (start + span - 1) / 2048, s"last_chunk wrong for doc $id")
      assert(nc === last - first + 1, s"n_chunks wrong for doc $id")
    }
  }

  test("stratified sample is deterministic, a subset, and keeps the long tail whole") {
    import org.apache.spark.sql.functions._
    val once = Curation.sampleStratified(spark, sf).collect().map(_.getLong(0)).sorted
    val twice = Curation.sampleStratified(spark, sf).collect().map(_.getLong(0)).sorted
    assert(once.sameElements(twice), "hash sampling must be run-stable")
    val docs = graft.sources.Corpus.documents(spark, sf)
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once.forall(all.contains), "sample must be a subset of the corpus")
    val nonEn = docs.where(col("lang") =!= "en").count()
    val keptNonEn = Curation.sampleStratified(spark, sf)
      .where(col("lang") =!= "en").count()
    assert(keptNonEn === nonEn, "non-dominant languages are kept at 100%")
  }

  test("dedup clusters are consistent with their pair edges") {
    import org.apache.spark.sql.functions._
    val clusters = graft.operators.Dedup.dedupClusters(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pairs = graft.operators.Dedup.minhashLshPairs(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture should produce at least one near-dup pair")
    // paired docs always share a cluster, and the representative is the
    // cluster's minimum member
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
    }
    clusters.groupBy(_._2).foreach { case (rep, members) =>
      assert(rep === members.keys.min, s"cluster $rep is not its min member")
    }
  }

  test("star contraction collapses adversarial graphs to exact min labels") {
    import spark.implicits._
    // graphs where the 1-hop labels FAIL the exactness proof, so the
    // large-star/small-star rounds must actually run (the corpus fixtures
    // usually converge in 0 rounds and would leave them untested): a
    // 33-node path (worst-case diameter), a disjoint pair, and a
    // two-leaf star keyed by its max node
    val path = (0L until 32L).map(i => (i + 1, i))
    val pair = Seq((101L, 100L))
    val star = Seq((202L, 200L), (202L, 201L))
    val edges = (path ++ pair ++ star).toDF("src", "dst").localCheckpoint()
    val labels = graft.operators.Dedup.starContract(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 32L).foreach(n => assert(labels(n) === 0L, s"path node $n mislabeled"))
    assert(labels(100L) === 100L && labels(101L) === 100L, "pair component")
    Seq(200L, 201L, 202L).foreach(n =>
      assert(labels(n) === 200L, s"star node $n mislabeled"))
    assert(labels.size === 38, "every endpoint must receive exactly one label")
  }

  test("contamination flags only corpus docs, never the benchmark set") {
    val flagged = graft.operators.Dedup.contamination(spark, sf)
      .collect().map(_.getLong(0))
    assert(flagged.nonEmpty, "fixture contains planted 13-gram overlap; zero flags = broken join")
    assert(flagged.forall(_ >= 10), "benchmark docs (id < 10) must not self-flag")
  }

  test("repetition and unigram-LM scores obey their mathematical ranges") {
    val rep = graft.operators.TextAnalysis.repetitionStats(spark, sf)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rep.nonEmpty)
    rep.foreach { case (n, dr, dup, top) =>
      assert(n > 0)
      assert(dr > 0.0 && dr <= 1.0, s"distinct_ratio $dr out of range")
      assert(dup >= 0.0 && dup < 1.0, s"dup_bigram_frac $dup out of range")
      assert(top >= 1.0 / n && top <= 1.0, s"top_token_frac $top out of range")
      // uniform-over-distinct-tokens floor: max count ≥ n/distinct,
      // so top = max/n ≥ 1/distinct = 1/(dr·n)
      assert(top >= 1.0 / (dr * n) - 1e-12, "top share below uniform floor")
    }
    // the synthetic corpus's tiny vocabulary guarantees real repetition
    assert(rep.count(_._3 > 0.0) > rep.length / 2,
      "small-vocab corpus must show duplicate bigrams in most docs")
    val lm = graft.operators.TextAnalysis.unigramLogprob(spark, sf)
      .collect().map(r => r.getDouble(2))
    assert(lm.nonEmpty)
    // probabilities < 1 ⇒ strictly negative scores, bounded by the
    // rarest-possible token (p = 1/total_tokens)
    assert(lm.forall(s => s < 0.0), "unigram log-probs must be negative")
    // interpolated bigram scores: same sign bound, one row per doc with
    // ≥ 2 tokens (all of this corpus), and the 0.3-weighted unigram
    // backoff bounds each position below by ln(0.3) + min unigram lp
    val bi = graft.operators.TextAnalysis.bigramLogprob(spark, sf)
      .collect().map(r => r.getDouble(2))
    assert(bi.length === lm.length, "every multi-token doc gets a bigram score")
    assert(bi.forall(s => s < 0.0 && !s.isNaN && !s.isInfinite))
  }

  test("context windows tile each document with stride overlap and reach the tail") {
    val nTokens = graft.operators.Sketches.tokenCounts(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rows = graft.operators.TextAnalysis.contextWindows(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.values.exists(_.length > 1), "fixture must produce multi-window docs")
    rows.foreach { case (doc, ws) =>
      val sorted = ws.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, w, start, end, nt), i) =>
        assert(w == i, s"doc $doc: window ids must be consecutive")
        assert(start == w * 24, s"doc $doc: start must be win_id*stride")
        assert(end - start == nt && nt <= 32, s"doc $doc: bad window size")
      }
      // consecutive windows overlap by len - stride; the tail is covered
      sorted.sliding(2).foreach {
        case Array((_, _, _, e1, _), (_, _, s2, _, _)) =>
          assert(s2 < e1, s"doc $doc: windows must overlap")
        case _ => ()
      }
      // real tail coverage: the last window must end exactly at the
      // document's independently-computed token count
      assert(sorted.last._4 === nTokens(doc),
        s"doc $doc: last window ends at ${sorted.last._4}, not n=${nTokens(doc)}")
    }
  }

  test("hashed contamination matches raw and shrinks the broadcast payload") {
    import org.apache.spark.sql.functions._
    val raw = graft.operators.Dedup.contamination(spark, sf)
      .collect().map(_.getLong(0)).sorted
    val hashed = graft.operators.Dedup.contaminationHashed(spark, sf)
      .collect().map(_.getLong(0)).sorted
    assert(raw.sameElements(hashed), "hashing the gram must not change the verdict")
    // measured broadcast payload: raw gram text vs 16-byte md5 per gram
    val bench = graft.operators.Dedup.grams13(
        graft.sources.Corpus.documents(spark, sf).where(col("doc_id") < 10))
      .select(col("gram")).distinct()
    val r = bench.agg(
      sum(length(col("gram"))).as("raw_bytes"), count(lit(1)).as("n")).head()
    val rawBytes = r.getLong(0)
    val hashedBytes = r.getLong(1) * 16
    assert(hashedBytes * 3 < rawBytes,
      s"hashed payload $hashedBytes B should be well under a third of raw $rawBytes B")
  }

  test("bloom contamination matches the broadcast-join verdict and shrinks the broadcast") {
    val raw = graft.operators.Dedup.contamination(spark, sf)
      .collect().map(_.getLong(0)).sorted
    val bloom = graft.operators.Dedup.contaminationBloom(spark, sf)
      .collect().map(_.getLong(0)).sorted
    assert(raw.sameElements(bloom),
      "bloom prefilter + exact confirm must return exactly the broadcast-join verdict")
    val (bloomBytes, hashedBytes) = graft.operators.Dedup.contaminationBloomSizes(spark, sf)
    assert(bloomBytes < hashedBytes,
      s"bloom payload $bloomBytes B should undercut the md5-set payload $hashedBytes B")
  }

  test("dup-gram fraction is bounded, non-vacuous, and covers exactly the gram-bearing docs") {
    import org.apache.spark.sql.functions._
    val dgf = graft.operators.Dedup.dupGramFraction(spark, sf)
    val bad = dgf.where(col("dup_frac") < 0.0 || col("dup_frac") > 1.0 ||
      col("n_dup_grams") > col("n_grams") || col("n_grams") <= 0).count()
    assert(bad == 0, "dup_frac must be a valid fraction of the doc's grams")
    // rows exist exactly for documents with >= 13 tokens (gram-bearing)
    val eligible = graft.sources.Corpus.documents(spark, sf)
      .where(size(graft.operators.TextAnalysis.tokensCol(col("text"))) >= 13).count()
    assert(dgf.count() == eligible)
    // the synthetic corpus carries replicated spans: both partial and
    // fully-duplicated docs must surface (non-vacuous operator)
    assert(dgf.where(col("dup_frac") === 1.0).count() > 0, "expected fully-duplicated docs")
    assert(dgf.where(col("dup_frac") > 0.0 && col("dup_frac") < 1.0).count() > 0,
      "expected partially-duplicated docs")
  }

  test("space-saving heavy hitters are exact, partition-invariant, and SQL-exposed here") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val hh = graft.operators.Sketches.heavyHitters(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // exact counts by plain aggregation, same deterministic cutoff
    val toks = graft.sources.Corpus.documents(spark, sf)
      .select(col("source"),
        explode(graft.operators.TextAnalysis.tokensCol(col("text"))).as("token"))
      .where(length(col("token")) > 0)
    val w = Window.partitionBy(col("source")).orderBy(col("cnt").desc, col("token").asc)
    val exact = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", row_number().over(w).cast("long")).where(col("rnk") <= 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(hh === exact,
      "under-capacity Space-Saving must reproduce exact counts")
    // partition-invariance of the distributed merge in the exact regime
    val ss = udaf(graft.functions.SketchFunctions.spaceSaving,
      org.apache.spark.sql.Encoders.STRING)
    val once = toks.repartition(1).groupBy(col("source")).agg(ss(col("token")).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Any](1)).toMap
    val many = toks.repartition(13).groupBy(col("source")).agg(ss(col("token")).as("top"))
      .collect().map(r => r.getString(0) -> r.getSeq[Any](1)).toMap
    assert(once === many, "merge order must not change the under-capacity sketch")
    // SQL surface — the token stream comes from the ONE canonical
    // tokenizer (TextAnalysis.tokensCol) registered as a view, so this
    // test cannot silently validate a divergent tokenization if the
    // canonical definition ever changes (round-5 advice).
    GraftSession.registerSketches(spark)
    toks.createOrReplaceTempView("graft_doc_tokens")
    val viaSql = spark.sql(
      """SELECT source, e.token AS token, e.cnt AS cnt
        |FROM (
        |  SELECT source, explode(top) AS e FROM (
        |    SELECT source, graft_top_terms(token) AS top
        |    FROM graft_doc_tokens
        |    GROUP BY source))""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val fullExact = toks.groupBy(col("source"), col("token"))
      .agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(viaSql === fullExact, "graft_top_terms must expose the exact counts via SQL")
  }

  test("heavy_hitters oracle corpora stay under the Space-Saving capacity") {
    import org.apache.spark.sql.functions._
    // The heavy_hitters DuckDB oracle compares sketch output against EXACT
    // SQL counts, which is only sound while every source's distinct-token
    // count fits in the sketch's slots (over capacity the sketch answers
    // carry bounded error by design — SpaceSavingProps covers that regime).
    // Assert the precondition on every corpus the oracle harness points at,
    // so a richer corpus fails HERE with a clear message instead of as an
    // opaque hash mismatch in the correctness gate (round-5 advice).
    val capacity = graft.functions.SketchFunctions.ssCapacity
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { dir =>
        val maxVocab = graft.sources.Corpus.documents(spark, dir)
          .select(col("source"),
            explode(graft.operators.TextAnalysis.tokensCol(col("text"))).as("token"))
          .where(length(col("token")) > 0)
          .groupBy(col("source"))
          .agg(countDistinct(col("token")).as("v"))
          .agg(max(col("v"))).head().getLong(0)
        assert(maxVocab <= capacity,
          s"$dir: a source has $maxVocab distinct tokens > Space-Saving capacity " +
            s"$capacity — the heavy_hitters oracle is only exact under capacity; " +
            "either raise SketchFunctions.ssCapacity or drop the oracle row for " +
            "this corpus (estimates are bound-checked in SpaceSavingProps instead)")
      }
  }

  test("bpe merge candidates are well-ranked character pairs") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.TextAnalysis.bpeMerges(spark, sf)
      .orderBy(col("rnk")).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getString(0).length == 2), "pairs must be 2 chars")
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "counts must be non-increasing in rank")
    assert(rows.map(_.getLong(2)).toSeq == (1L to 20L), "ranks must be 1..20")
  }

  test("bm25 ranks query-term-bearing docs with positive descending scores") {
    import org.apache.spark.sql.functions._
    val rows = graft.operators.Retrieval.bm25Topk(spark, sf).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0.0), "top-10 scores must be positive")
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores must be non-increasing")
    // every returned doc must actually contain at least one query term
    val ids = rows.map(_.getLong(0)).toSet
    val bearing = graft.sources.Corpus.documents(spark, sf)
      .where(col("doc_id").isin(ids.toSeq: _*))
      .select(col("doc_id"), col("text")).collect()
      .filter(r => graft.operators.Retrieval.queryTerms
        .exists(t => r.getString(1).toLowerCase.split("\\s+").contains(t)))
      .map(_.getLong(0)).toSet
    assert(bearing == ids, "every ranked doc must contain a query term")
  }

  test("HLL registers merge: sketch of halves == sketch of the whole") {
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    val ev = graft.sources.Corpus.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("event_id"))
    val whole = Sketches.hllEstimate(
      Sketches.hllRegisters(ev.select("event_type", "user_id")))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // split arbitrarily, sketch each half, merge registers with max
    val a = Sketches.hllRegisters(
      ev.where(col("event_id") % 2 === 0).select("event_type", "user_id"))
    val b = Sketches.hllRegisters(
      ev.where(col("event_id") % 2 =!= 0).select("event_type", "user_id"))
    val merged = a.union(b).groupBy(col("event_type"), col("bucket"))
      .agg(max(col("max_rho")).as("max_rho"))
    val viaMerge = Sketches.hllEstimate(merged)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaMerge === whole,
      "merged half-sketches must reproduce the whole-corpus estimate exactly")
  }

  test("stats_incremental == full table_stats on the mergeable columns; cut non-vacuous") {
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    val mergeable = Seq("col_name", "n_rows", "n_nulls", "ndv_est",
      "min_num", "max_num", "min_str", "max_str")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(mergeable.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf)).map(_.mkString("|")).sorted.toSeq
    val full = rows(Sketches.tableStats(spark, sf))
    val inc = rows(Sketches.statsIncremental(spark, sf))
    assert(inc === full,
      "snapshot+batch register/count/bounds merge must equal the one-shot stats")
    val li = graft.sources.Corpus.lineitem(spark, sf)
    val below = li.where(col("l_orderkey") < Sketches.statsCut).count()
    val above = li.where(col("l_orderkey") >= Sketches.statsCut).count()
    assert(below > 0 && above > 0, "the ingest cut must split the table")
  }

  test("CountMin merges, never underestimates, and is SQL-exposed") {
    import org.apache.spark.sql.functions._
    import graft.functions.SketchFunctions
    import spark.implicits._
    val ev = graft.sources.Corpus.events(spark, sf)
      .select(col("event_type"), col("event_id"))
    val whole = ev.select(col("event_type")).as[String]
      .select(SketchFunctions.countMin.toColumn).head()
    // split arbitrarily, sketch each half, merge = elementwise add
    val a = ev.where(col("event_id") % 2 === 0).select(col("event_type"))
      .as[String].select(SketchFunctions.countMin.toColumn).head()
    val b = ev.where(col("event_id") % 2 =!= 0).select(col("event_type"))
      .as[String].select(SketchFunctions.countMin.toColumn).head()
    val merged = a.zip(b).map { case (x, y) => x + y }
    assert(merged === whole,
      "merged half-sketches must equal the whole-corpus sketch exactly")
    // one-sided error: estimate >= exact for every key
    val exact = ev.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(SketchFunctions.cmsEstimate(whole, k) >= c,
        s"CMS underestimated '$k'")
    }
    // the registered SQL aggregate produces the same sketch
    GraftSession.registerSketches(spark)
    graft.sources.Corpus.registerViews(spark, sf)
    val viaSql = spark.sql("SELECT graft_cms(event_type) FROM events")
      .head().getSeq[Long](0)
    assert(viaSql === whole, "graft_cms SQL surface diverged from the Aggregator")
  }

  test("log2 histogram merges: sketch of halves == sketch of the whole") {
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    val counts = Sketches.tokenCounts(spark, sf)
    val whole = Sketches.logHistogram(counts)
    val wholeRows = whole.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // split arbitrarily, sketch each half, merge histograms with sum
    val a = Sketches.logHistogram(counts.where(col("doc_id") % 2 === 0))
    val b = Sketches.logHistogram(counts.where(col("doc_id") % 2 =!= 0))
    val merged = a.union(b).groupBy(col("lang"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val mergedRows = merged.collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(mergedRows === wholeRows,
      "merged half-histograms must reproduce the whole-corpus histogram exactly")
    // and therefore identical quantile estimates
    val viaMerge = Sketches.histQuantiles(merged, Seq(0.5, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val direct = Sketches.tokenQuantilesSketch(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(viaMerge === direct)
  }

  test("registered sketch SQL functions reproduce the operator results") {
    import org.apache.spark.sql.functions._
    import graft.operators.Sketches
    GraftSession.registerSketches(spark)
    graft.sources.Corpus.registerViews(spark, sf)
    // HLL as a SQL aggregate == the relational register pipeline
    val viaSql = spark.sql(
      """SELECT event_type, graft_hll_users(CAST(user_id AS STRING)) AS approx_users
        |FROM events GROUP BY event_type""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaOp = Sketches.hllDistinctUsers(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSql === viaOp, "SQL HLL must match the operator estimate bitwise")
    // log2 histogram + quantile as SQL == the relational sketch
    Sketches.tokenCounts(spark, sf).createOrReplaceTempView("graft_tok_counts")
    val qSql = spark.sql(
      """SELECT lang,
        |  graft_log2_quantile(graft_log2_hist(n_tokens), 0.5D) AS p50,
        |  graft_log2_quantile(graft_log2_hist(n_tokens), 0.9D) AS p90
        |FROM graft_tok_counts GROUP BY lang""".stripMargin)
      .collect().flatMap(r =>
        Seq((r.getString(0), 0.5) -> r.getDouble(1), (r.getString(0), 0.9) -> r.getDouble(2)))
      .toMap
    val qOp = Sketches.tokenQuantilesSketch(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(qSql === qOp, "SQL log2 quantiles must match the operator bitwise")
  }

  test("quality classifier margins are bounded and partition-invariant") {
    import graft.operators.TextAnalysis
    val rows = TextAnalysis.qualityClassifier(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(rows.nonEmpty)
    val wmax = TextAnalysis.trainedWeights(spark, sf).map(math.abs).max
    rows.foreach { case (id, n, raw, margin, keep) =>
      assert(n > 0, s"doc $id scored no tokens")
      // every trained weight is bounded by the table's max |log-odds|,
      // so |raw| <= n*wmax and the mean-per-token margin is bounded too
      assert(math.abs(raw) <= n * wmax, s"raw score out of range for doc $id")
      assert(math.abs(margin) <= wmax / 10000.0, s"margin out of range for doc $id")
      assert(keep === (raw > 0), s"keep flag inconsistent for doc $id")
    }
    // integer accumulation is order-independent: a different partitioning
    // must produce bit-identical scores
    val repart = TextAnalysis.qualityClassifier(spark, sf)
    val again = repart.sparkSession.createDataFrame(
      repart.rdd.repartition(7), repart.schema)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .sortBy(_._1)
    assert(again === rows, "classifier scores changed under repartitioning")
  }

  test("trained quality weights sit clear of cross-engine ln() rounding boundaries") {
    import graft.operators.TextAnalysis
    // The weight table is round(x * 1e4) of a difference of ln() terms
    // computed independently by Spark (libm via java.lang.Math) and the
    // DuckDB oracle: a last-ulp divergence only flips a weight if the
    // exact value lands within ~1 ulp of a .5 boundary. Assert every
    // bucket's pre-rounding value is at least 1e-6 away from a boundary
    // (six orders of magnitude beyond ulp at these magnitudes) — the
    // corpus-passes-the-boundary-check discipline unigramLogprob
    // documents, made executable for the trained model.
    val t = TextAnalysis.qualityTrain(spark, sf)
      .select("bucket", "n_pos", "n_neg").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    val tp = t.map(_._1).sum.toDouble + 256.0
    val tn = t.map(_._2).sum.toDouble + 256.0
    t.foreach { case (np, nn) =>
      val x = (math.log((np + 1.0) / tp) - math.log((nn + 1.0) / tn)) * 10000.0
      val frac = x - math.floor(x)
      val distToHalf = math.abs(frac - 0.5)
      assert(distToHalf > 1e-6,
        s"weight value $x is within 1e-6 of a .5 rounding boundary — " +
          "cross-engine ln() ulp divergence could flip this weight")
    }
  }

  test("source KL divergences are non-negative and finite") {
    val kl = Curation.sourceKl(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(kl.length > 1)
    kl.foreach { case (src, n, d) =>
      assert(n > 0, s"source $src has no tokens")
      // Gibbs' inequality up to the 1e-4 per-term quantization
      assert(d >= -0.001, s"source $src KL $d below the quantization floor")
      assert(!d.isNaN && !d.isInfinite, s"source $src KL not finite")
    }
    // same-generator sources must all sit close to the corpus distribution
    assert(kl.map(_._3).max < 1.0,
      "homogeneous synthetic sources should not show large divergence")
  }

  test("mixture weights are normalized and monotone in token count") {
    val w = Curation.mixWeights(spark, sf)
      .select("lang", "n_tokens", "weight").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(w.length > 1)
    val total = w.map(_._3).sum
    assert(math.abs(total - 1.0) < 0.001, s"weights must sum to ~1, got $total")
    val byTokens = w.sortBy(_._2).map(_._3)
    assert(byTokens.sameElements(byTokens.sorted),
      "more tokens must never get a smaller weight")
  }

  test("bpe_encode runs the merge chain per DISTINCT word, broadcast back") {
    val enc = graft.operators.TextAnalysis.bpeEncode(spark, sf)
    // r15 shape: the regexp-encode + k-replace merge chain is a pure
    // function of the word, so it runs over the vocabulary frame and
    // rides a BroadcastExchange back onto the token stream; the only
    // shuffle is the doc_id rollup, which moves partial-aggregated
    // (doc_id, 3 longs) rows — never a second corpus tokenize, never the
    // chain per token occurrence (the pre-r15 plan evaluated it inside
    // per-row array lambdas: shuffle-free but rows × mean-tokens chain
    // evaluations, the measured hot spot)
    val plan = enc.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      "per-word symbol counts must broadcast back onto the token stream")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"exactly one exchange (the doc_id rollup), got $shuffles:\n$plan")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      "the doc_id rollup must partial-aggregate before the exchange")
    val rows = enc.collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    // merging only ever reduces symbols: chars >= bpe symbols >= words
    assert(rows.forall { case (w, c, b, _) => b <= c && (w == 0 || b >= w) })
    assert(rows.forall { case (w, c, b, ratio) =>
      if (b == 0) ratio == 0.0 else ratio == c.toDouble / b.toDouble })
    // the induced merges must actually fire somewhere in the corpus
    assert(rows.exists { case (_, c, b, _) => b < c },
      "at least one document must compress below its character count")
  }

  test("vocab_overlap's source-df cap: inert at this corpus's source count, live when forced") {
    def rows(maxDf: Int) =
      Curation.vocabOverlapImpl(spark, sf, maxDf)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
    // the default cap (256) sits far above the corpus's handful of
    // sources, so capped must equal uncapped bit-for-bit
    val capped = rows(Curation.vocabMaxSourceDf)
    val uncapped = rows(Int.MaxValue)
    assert(capped === uncapped,
      "default cap must be inert at this corpus's source count")
    // a forced cap of 1 drops every shared token from the universe —
    // the intersection term empties, proving the cap is wired below the
    // self-join, not cosmetically
    assert(Curation.vocabOverlapImpl(spark, sf, 1).count() === 0L,
      "a df<=1 cap must leave no intersecting tokens")
  }

  test("pack_interleave: weighted fair queueing invariants over the corpus") {
    import org.apache.spark.sql.functions.col
    val rows = Packing.packInterleave(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = graft.sources.Corpus.documents(spark, sf).count()
    assert(rows.length === n.toInt, "every doc gets an interleave slot")
    assert(rows.map(_._1).distinct.length === n.toInt)
    rows.foreach { case (id, src, rank, stride, vtime) =>
      assert(rank >= 1 && stride >= 1 && stride <= 1000000L, s"doc $id")
      assert(vtime === rank * stride, s"vtime must be rank*stride for doc $id")
    }
    // per source, vtime strictly increases with rank (a total order
    // within the source) and ranks are 1..n_s without gaps
    rows.groupBy(_._2).foreach { case (src, docs) =>
      val ranks = docs.map(_._3).sorted
      assert(ranks === (1L to docs.length.toLong).toArray.toSeq, s"source $src ranks")
    }
    // the point of the operator: reading in (vtime, source, doc_id) order
    // interleaves sources rather than concatenating them — the first 30
    // slots must already mix several sources
    val order = rows.sortBy(t => (t._5, t._2, t._1)).take(30).map(_._2).distinct
    assert(order.length >= 3, s"interleave must mix sources early: $order")
  }

  test("tokenizer_fertility: per-language rollup is consistent and bounded") {
    val rows = TextAnalysis.tokenizerFertility(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, nWords, nChars, nSyms, fert, comp) =>
      assert(nDocs > 0 && nWords > 0 && nChars > 0 && nSyms > 0, lang)
      // merges only ever shrink the symbol stream: chars >= symbols,
      // so compression >= 1; and a word is at least one symbol
      assert(nSyms <= nChars, s"$lang: symbols cannot exceed chars")
      assert(nSyms >= nWords, s"$lang: a word is at least one symbol")
      assert(comp >= 1.0 && fert >= 1.0, s"$lang: $comp / $fert")
    }
  }

  test("contamination_scrub cuts exactly the leaked spans, nothing else") {
    import org.apache.spark.sql.functions.col
    val flagged = Dedup.contamination(spark, sf).collect().map(_.getLong(0)).toSet
    val scrub = Dedup.contaminationScrub(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    // every boolean-flagged doc loses tokens; every clean doc is untouched
    flagged.foreach { id =>
      assert(scrub(id)._3 > 0, s"flagged doc $id must lose its leaked span") }
    scrub.foreach { case (id, (_, _, removed)) =>
      if (!flagged.contains(id))
        assert(removed === 0L, s"unflagged doc $id must be untouched") }
    // and the scrubbed text contains NO benchmark 13-gram any more
    val docs = graft.sources.Corpus.documents(spark, sf)
    val bench = docs.where(col("doc_id") < 10)
      .select("text").collect().flatMap { r =>
        val toks = r.getString(0).trim.toLowerCase.replaceAll("\\s+", " ").split(' ')
        if (toks.length >= 13) toks.sliding(13).map(_.mkString(" ")).toSeq else Seq.empty
      }.toSet
    flagged.foreach { id =>
      val clean = scrub(id)._1.split(' ')
      val grams = if (clean.length >= 13)
        clean.sliding(13).map(_.mkString(" ")).toSet else Set.empty[String]
      assert(grams.intersect(bench).isEmpty, s"doc $id still leaks after scrub")
    }
  }

  test("ngram_coverage: bounded shares, and the contaminated source registers coverage") {
    import org.apache.spark.sql.functions.col
    val rows = Dedup.ngramCoverage(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    val nBench = rows.head._3
    assert(nBench > 0)
    rows.foreach { case (src, covered, total, share) =>
      assert(total === nBench)
      assert(covered >= 0 && covered <= total, src)
      assert(share >= 0.0 && share <= 1.0, src)
    }
    // the source of a contamination-flagged doc must show nonzero coverage
    val flagged = Dedup.contamination(spark, sf).collect().map(_.getLong(0)).toSet
    if (flagged.nonEmpty) {
      val srcOf = graft.sources.Corpus.documents(spark, sf)
        .select(col("doc_id"), col("source")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val hot = flagged.map(srcOf)
      val bySrc = rows.map(r => r._1 -> r._2).toMap
      hot.foreach(sc => assert(bySrc(sc) > 0, s"source $sc of a flagged doc shows 0 coverage"))
    }
  }

  test("weighted_sample: udaf top-k equals the window ranking, bounded output") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // the bounded-state aggregator must pick exactly what a full
    // rank-everything window would — merge order cannot matter
    val sf01 = "/root/testdata/sf0.01"
    val got = Curation.weightedSample(spark, sf01).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val pri = log(((col("doc_id") * lit(Curation.mixK)) % lit(Curation.sampleM) + lit(1L))
        .cast("double") / lit((Curation.sampleM + 1).toDouble)) /
      col("n_chars").cast("double")
    val w = Window.partitionBy(col("source")).orderBy(col("pri").desc, col("doc_id"))
    val exp = graft.sources.Corpus.documents(spark, sf01)
      .where(col("n_chars") > 0)
      .select(col("source"), col("doc_id"), pri.as("pri"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .where(col("rk") <= Curation.sampleK)
      .select("source", "doc_id", "rk").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(got.sameElements(exp), "aggregator must equal the window ranking")
    val nSources = graft.sources.Corpus.documents(spark, sf01)
      .select("source").distinct().count()
    assert(got.length <= Curation.sampleK * nSources, "output must stay k-bounded")
  }

  test("weighted_sample: cross-engine ln() boundary gap is executable-gated") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // the oracle recomputes ln() in libm; ordering only flips if two
    // priorities sit within ulp. Gate the min adjacent gap among each
    // source's top k+1 well above that, on BOTH gate corpora.
    for (d <- Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val pri = log(((col("doc_id") * lit(Curation.mixK)) % lit(Curation.sampleM) + lit(1L))
          .cast("double") / lit((Curation.sampleM + 1).toDouble)) /
        col("n_chars").cast("double")
      val w = Window.partitionBy(col("source")).orderBy(col("pri").desc, col("doc_id"))
      val gap = graft.sources.Corpus.documents(spark, d)
        .where(col("n_chars") > 0)
        .select(col("source"), col("doc_id"), pri.as("pri"))
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= Curation.sampleK + 1)
        .withColumn("gap", lag(col("pri"), 1).over(w) - col("pri"))
        .agg(min(col("gap"))).collect()(0).getDouble(0)
      assert(gap > 1e-9, s"$d: adjacent priority gap $gap too tight for cross-engine ln()")
    }
  }

  test("corpus_diff: verdict partition is exact and non-vacuous") {
    import org.apache.spark.sql.functions.col
    val sf01 = "/root/testdata/sf0.01"
    val rows = Curation.corpusDiff(spark, sf01).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val byStatus = rows.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // all four verdicts occur on the gate corpus
    Seq("added", "removed", "changed", "unchanged").foreach(st =>
      assert(byStatus.getOrElse(st, Set.empty).nonEmpty, s"$st is vacuous"))
    val ids = graft.sources.Corpus.documents(spark, sf01)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byStatus("removed") === ids.filter(_ % 17 == 0), "removed = the dropped ids")
    assert(byStatus("added") ===
      ids.filter(_ % 19 == 0).map(_ + Curation.diffAddOffset), "added = offset re-adds")
    // changed ⊆ inflated ids (an inflated doc with no space would be unchanged)
    assert(byStatus("changed").forall(id => id % 13 == 0 && id % 17 != 0))
    assert(rows.length === rows.map(_._1).distinct.length, "one verdict per doc_id")
  }

  test("corpus_diff: identical snapshots diff to all-unchanged") {
    val docs = graft.sources.Corpus.documents(spark, sf)
      .select("doc_id", "text")
    val d = Curation.corpusDiffFrom(docs, docs).collect()
    assert(d.nonEmpty)
    assert(d.forall(_.getString(1) == "unchanged"))
  }
}
