package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Retrieval}

/** Invariants of the inverted-index build and the integer PageRank that
  * the row-level oracle compare can't express: gap-decoding round-trips,
  * block bounds, node-set closure, and rank-mass accounting.
  */
class GraphIndexSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  test("build_postings: gaps prefix-sum back to the sorted postings, inside the block") {
    val rows = Retrieval.buildPostings(spark, sf)
      .select("term", "block", "df_block", "postings", "gaps", "tfs").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val block = r.getLong(1)
      val postings = r.getString(3).split(",").map(_.toLong)
      val gaps = r.getString(4).split(",").map(_.toLong)
      val tfs = r.getString(5).split(",").map(_.toLong)
      assert(tfs.length === postings.length, "tf list must align with postings")
      assert(tfs.forall(_ >= 1L), "an indexed incidence has tf >= 1")
      assert(postings.length === r.getLong(2), s"df_block != |postings| for ${r.getString(0)}")
      assert(postings.sorted.sameElements(postings), "postings must be sorted")
      assert(postings.distinct.length === postings.length, "postings must be distinct")
      // delta decode: running sum of gaps reproduces the absolute ids
      val decoded = gaps.scanLeft(0L)(_ + _).tail
      assert(decoded.sameElements(postings), "gap decode must round-trip")
      postings.foreach { id =>
        assert(id >> Retrieval.postingsBlockBits === block,
          s"doc $id leaked out of block $block")
      }
    }
  }

  test("build_postings: every (term, doc) incidence is indexed exactly once") {
    import graft.operators.TextAnalysis
    val incidences = graft.sources.Corpus.documents(spark, sf)
      .select(col("doc_id"), explode(TextAnalysis.tokensCol(col("text"))).as("term"))
      .where(length(col("term")) > 0)
      .distinct().count()
    val indexed = Retrieval.buildPostings(spark, sf)
      .agg(sum(col("df_block"))).collect()(0).getLong(0)
    assert(indexed === incidences)
  }

  test("postings_incremental: merge == full rebuild, replay-idempotent, boundary block exercised") {
    import graft.operators.Dedup
    import org.apache.spark.sql.Row
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getString(5)))
    val full = rows(Retrieval.buildPostings(spark, sf))
    val inc = rows(Retrieval.postingsIncremental(spark, sf))
    assert(inc.sorted.sameElements(full.sorted), "incremental must equal the full rebuild")
    // the gate cut lands inside a block: at least one (term, block) row
    // must mix snapshot and batch docs, or the merge path is vacuous
    val cutBlock = Dedup.snapshotCut >> Retrieval.postingsBlockBits
    val mixed = inc.filter { case (_, block, _, postings, _, _) =>
      val ids = postings.split(",").map(_.toLong)
      block == cutBlock && ids.exists(_ < Dedup.snapshotCut) &&
        ids.exists(_ >= Dedup.snapshotCut)
    }
    assert(mixed.nonEmpty, "no boundary-block row mixes snapshot and batch docs")
    // replaying the batch against the merged state merges nothing
    val docs = graft.sources.Corpus.documents(spark, sf).select(col("doc_id"), col("text"))
    val snap = docs.where(col("doc_id") < Dedup.snapshotCut)
    val batch = docs.where(col("doc_id") >= Dedup.snapshotCut)
    val wmAll = docs.agg(max(col("doc_id"))).collect()(0).getLong(0)
    def plists(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[Row](2).map(e => (e.getLong(0), e.getLong(1), e.getLong(2))).mkString(";")))
    val once = Retrieval.mergePostings(
      Retrieval.postingsStateOf(snap), Dedup.snapshotCut - 1L, batch)
    val twice = plists(Retrieval.mergePostings(once, wmAll, batch))
    val onceRows = plists(once)
    assert(twice.sorted.sameElements(onceRows.sorted), "replayed batch must merge nothing")
  }

  test("link_pagerank: node set is closed and scores respect the teleport floor") {
    val pr = Graph.linkPagerank(spark, sf).collect()
    val o = graft.sources.Corpus.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = graft.sources.Corpus.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val e0 = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s")).distinct()
    val nNodes = e0.select("c").distinct().count() + e0.select("s").distinct().count()
    assert(pr.length === nNodes, "one score per graph node, every round")
    assert(pr.map(r => (r.getString(0), r.getLong(1))).distinct.length === pr.length)
    val floor = 15L * Graph.prScale / 100
    pr.foreach(r => assert(r.getLong(2) >= floor,
      s"node ${r.getLong(1)} below the teleport floor"))
    // mass accounting: each round redistributes ~all mass; integer
    // truncation only LOSES mass, bounded by (one unit per edge + one per
    // node) per round — far under 1% here
    val total = pr.map(_.getLong(2)).sum
    val full = nNodes * Graph.prScale
    assert(total <= full, "integer truncation cannot create rank mass")
    assert(total >= (full * 99) / 100, s"lost too much mass: $total of $full")
  }

  test("link_pagerank: higher-degree suppliers outrank lower-degree ones at the extremes") {
    // monotonicity smoke on the aggregate shape (not per-node: PageRank is
    // not a pure degree ranking): the max-degree supplier must outscore
    // the min-degree one after 3 rounds on this bipartite graph
    val o = graft.sources.Corpus.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = graft.sources.Corpus.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val degs = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("s")).distinct()
      .groupBy("s").agg(count(lit(1)).as("deg")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val hi = degs.maxBy(_._2)
    val lo = degs.minBy(_._2)
    assume(hi._2 > lo._2, "degenerate: all suppliers have equal degree")
    val scores = Graph.linkPagerank(spark, sf)
      .where(col("node_type") === "supplier").collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(scores(hi._1) > scores(lo._1),
      s"supplier deg=${hi._2} must outrank deg=${lo._2}")
  }
}
