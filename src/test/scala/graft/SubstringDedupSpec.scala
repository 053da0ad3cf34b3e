package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Exact substring-span dedup (ExactSubstr, arXiv:2107.06499): invariants
  * the row-level oracle can't express — exact span extents on a corpus
  * with KNOWN duplication, the canonical-copy keep rule, island merging
  * of overlapping windows, and scrub/span bookkeeping consistency on the
  * real corpus.
  */
class SubstringDedupSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  private val L = 10 // Dedup.spanGram

  /** Known-duplication corpus:
    * doc 0 — 20 unique tokens a0..a19 (all canonical occurrences live here)
    * doc 1 — copies doc 0's tokens 0..14, then 5 unique tokens
    * doc 2 — a 10-token block repeated back-to-back, then 5 unique tokens
    */
  private def syntheticDocs = {
    import spark.implicits._
    val d0 = (0 until 20).map(i => s"a$i").mkString(" ")
    val d1 = ((0 until 15).map(i => s"a$i") ++ (0 until 5).map(i => s"b$i")).mkString(" ")
    val d2 = ((0 until 10).map(i => s"r$i") ++ (0 until 10).map(i => s"r$i")
      ++ (0 until 5).map(i => s"z$i")).mkString(" ")
    Seq((0L, d0), (1L, d1), (2L, d2)).toDF("doc_id", "text")
  }

  test("spans are exact on a corpus with known duplication") {
    val docs = syntheticDocs
    val spans = Dedup.substringSpansFrom(Dedup.posGrams(docs, L))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(r => (r._1, r._2))
    // doc 0 holds every canonical copy -> no spans; doc 1's shared prefix
    // is windows 0..5 merged into one island covering tokens 0..14; doc
    // 2's self-repeat marks only window 10 (window 0 is canonical).
    assert(spans === Seq(
      (1L, 0L, 14L, 15L),
      (2L, 10L, 19L, 10L)))
  }

  test("scrub removes exactly the spans and keeps canonical copies") {
    val docs = syntheticDocs
    val out = Dedup.substringScrubFrom(docs)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val a20 = (0 until 20).map(i => s"a$i").mkString(" ")
    val d1Clean = (0 until 5).map(i => s"b$i").mkString(" ")
    val d2Clean = ((0 until 10).map(i => s"r$i") ++ (0 until 5).map(i => s"z$i")).mkString(" ")
    assert(out === Seq(
      (0L, a20, 20L, 0L),       // untouched: every copy here is canonical
      (1L, d1Clean, 20L, 15L),  // shared prefix cut, unique tail kept
      (2L, d2Clean, 25L, 10L))) // second block of the self-repeat cut
  }

  /** Brute-force reference: mark every non-canonical occurrence of a
    * duplicated window, merge islands. O(corpus²) memory-local — the
    * semantics, free of the distributed formulation. */
  private def refSpans(docs: Seq[(Long, String)]): Seq[(Long, Long, Long, Long)] = {
    val toksBy = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.replaceAll("\\s+", " ").split(' ')
    }
    val occ = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[(Long, Int)]]
    for ((id, toks) <- toksBy; p <- 0 to toks.length - L if toks.length >= L) {
      val g = toks.slice(p, p + L).mkString(" ")
      occ.getOrElseUpdate(g, scala.collection.mutable.ArrayBuffer.empty) += ((id, p))
    }
    val marked = occ.values.filter(_.size >= 2)
      .flatMap(os => os.sortBy(identity).drop(1)) // canonical = min (doc, pos)
      .toSeq
    marked.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
      val sorted = ps.map(_._2).sorted
      val islands = sorted.foldLeft(List.empty[List[Int]]) {
        case (Nil, p) => List(List(p))
        case (cur :: done, p) =>
          if (p - cur.head <= L) (p :: cur) :: done else List(p) :: cur :: done
      }
      islands.map { isl =>
        val start = isl.last.toLong
        val end = isl.head.toLong + L - 1
        (id, start, end, end - start + 1)
      }
    }
  }

  test("spans match the brute-force reference on randomized corpora (planted dups, small vocab)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val vocab = (0 until 12).map(i => s"w$i")
    for (trial <- 1 to 6) {
      val base = (0 until 10).map { id =>
        val len = 5 + rnd.nextInt(35)
        (id.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      }
      // plant structured duplication: copies, shared prefixes, self-repeats
      val planted = base ++ Seq(
        (100L, base(0)._2),                                   // exact copy
        (101L, base(1)._2.split(' ').take(15).mkString(" ")   // shared prefix
          + " zz1 zz2 zz3"),
        (102L, { val b = base(2)._2.split(' ').take(12)       // self-repeat
          (b ++ b ++ Seq("tail1", "tail2")).mkString(" ") })
      )
      val df = planted.toDF("doc_id", "text")
      val got = Dedup.substringSpansFrom(Dedup.posGrams(df, L))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(r => (r._1, r._2))
      val want = refSpans(planted).sortBy(r => (r._1, r._2))
      assert(got === want, s"trial $trial: spans diverge from reference")
    }
  }

  test("spans on the real corpus: in-bounds, >= L long, disjoint, non-adjacent") {
    val spans = Dedup.substringSpans(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty, "no duplicated spans found — spec is vacuous")
    spans.foreach { case (id, a, b, len) =>
      assert(a >= 0 && b >= a && len === b - a + 1 && len >= L,
        s"malformed span ($id, $a, $b, $len)")
    }
    spans.groupBy(_._1).values.foreach { ss =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array((id, _, e1, _), (_, s2, _, _)) =>
          // merged islands: the next span starts at least 2 past the
          // previous end, else they'd have been one island
          assert(s2 > e1 + 1, s"adjacent/overlapping spans in doc $id")
        case _ => ()
      }
    }
  }

  test("incremental ingest dedup: snapshot precedence, first-arrival keep, exact verdicts") {
    import spark.implicits._
    val snapshot = Seq(
      (0L, "alpha beta gamma"),
      (1L, "delta epsilon zeta")).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "Alpha  beta GAMMA"),   // normalizes to snapshot content
      (11L, "eta theta iota"),      // new
      (12L, "eta theta iota"),      // batch dup of 11
      (13L, "alpha beta gamma"),    // snapshot dup (beats batch-dup label)
      (14L, "kappa lambda mu")      // new
    ).toDF("doc_id", "text")
    val got = Dedup.dedupIncrementalFrom(snapshot, incoming)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      10L -> "snapshot_dup", 11L -> "new", 12L -> "batch_dup",
      13L -> "snapshot_dup", 14L -> "new"))
    // the gate entry's deterministic augmentation keeps all three
    // verdicts reachable on the dup-free corpus
    val verdicts = Dedup.dedupIncremental(spark, sf)
      .groupBy("verdict").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(verdicts.keySet === Set("new", "snapshot_dup", "batch_dup"),
      s"augmented gate entry left a verdict unreachable: $verdicts")
  }

  test("incremental near-dup ingest: LSH probe against the snapshot signature set") {
    import spark.implicits._
    val a = (0 until 30).map(i => s"w$i").mkString(" ")
    val b = (0 until 30).map(i => s"v$i").mkString(" ")
    val snapshot = Seq((0L, a), (1L, b)).toDF("doc_id", "text")
    val incoming = Seq(
      (10L, a + " tail tokens appended here"),            // near-dup of 0
      (11L, (0 until 30).map(i => s"u$i").mkString(" ")), // new
      (12L, b)                                            // exact copy of 1
    ).toDF("doc_id", "text")
    val got = Dedup.neardupIncrementalFrom(spark, snapshot, incoming)
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).sortBy(_._1)
    assert(got.map(g => (g._1, g._2, g._3)).toSeq ===
      Seq((10L, "near_dup", 0L), (11L, "new", -1L), (12L, "near_dup", 1L)))
    assert(got(0)._4 > 0.5 && got(0)._4 < 1.0,
      s"mutated copy must verify strictly between the cut and exact: ${got(0)._4}")
    assert(got(2)._4 === 1.0, s"verbatim copy must verify at 1.0: ${got(2)._4}")
    // the gate entry's replayed near-dups keep both verdicts reachable
    val verdicts = Dedup.neardupIncremental(spark, sf)
      .groupBy("verdict").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(verdicts.keySet === Set("near_dup", "new"),
      s"augmented gate entry left a verdict unreachable: $verdicts")
  }

  test("dedup funnel accounting balances and each stage is non-vacuous") {
    val r = Dedup.dedupFunnel(spark, sf).collect()
    assert(r.length === 1)
    val row = r.head
    val (nDocs, nEx, nNear, nKept) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    val (tokIn, tokKeptDocs, tokScrub, tokOut) =
      (row.getLong(4), row.getLong(5), row.getLong(6), row.getLong(7))
    assert(nDocs === nEx + nNear + nKept,
      "every document must be attributed to exactly one funnel outcome")
    assert(tokOut === tokKeptDocs - tokScrub, "token arithmetic broken")
    assert(tokKeptDocs <= tokIn && tokScrub >= 0 && tokOut <= tokKeptDocs)
    // the synthetic corpus has near-dups, so a vacuous drop stage means
    // a wiring bug (the SCRUB stage legitimately goes to zero here:
    // every duplicated span lives in a doc the near-dup stage already
    // dropped — exactly why the funnel recomputes spans on survivors
    // instead of reusing the raw-corpus span set)
    assert(nEx + nNear > 0, "dedup stages dropped nothing — wiring bug?")
    // cross-check the scrub stage against independently recomputed
    // survivor spans
    val docs = graft.sources.Corpus.documents(spark, sf)
    val clusters = Dedup.dedupClusters(spark, sf)
      .where(org.apache.spark.sql.functions.col("doc_id") =!=
        org.apache.spark.sql.functions.col("cluster_id"))
      .select("doc_id")
    val survivors = docs.join(clusters, Seq("doc_id"), "left_anti")
    val survSpanTokens = Dedup.substringSpansFrom(Dedup.posGrams(survivors, 10))
      .agg(org.apache.spark.sql.functions.coalesce(
        org.apache.spark.sql.functions.sum("span_len"),
        org.apache.spark.sql.functions.lit(0L)))
      .head().getLong(0)
    // (no exact dups at this SF, so survivors == the funnel's survivor set)
    assert(nEx === 0L, "corpus gained exact dups — update this cross-check")
    assert(tokScrub === survSpanTokens,
      "funnel scrub count diverges from recomputed survivor spans")
  }

  test("scrub bookkeeping matches the spans on the real corpus") {
    val spans = Dedup.substringSpans(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    val docs = graft.sources.Corpus.documents(spark, sf)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val out = Dedup.substringScrub(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.length === docs.size, "scrub must emit every document")
    out.foreach { case (id, clean, nTokens, nRemoved) =>
      val toks = docs(id).trim.toLowerCase.replaceAll("\\s+", " ").split(' ')
      assert(nTokens === toks.length.toLong, s"token count wrong for doc $id")
      val covered = spans.getOrElse(id, Array.empty)
        .flatMap { case (_, a, b) => a to b }.toSet
      assert(nRemoved === covered.size.toLong, s"n_removed wrong for doc $id")
      val expected = toks.zipWithIndex
        .collect { case (t, i) if !covered.contains(i.toLong) => t }
        .mkString(" ")
      assert(clean === expected, s"clean text wrong for doc $id")
    }
  }
}
