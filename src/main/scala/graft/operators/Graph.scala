package graft.operators

import graft.Materialize.MaterializeOps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Iterative graph propagation — the family [[Dedup.dedupClusters]]'
  * connected components opened (star contraction), extended with the other
  * canonical iterated-join workload: PageRank (Page, Brin, Motwani,
  * Winograd, "The PageRank citation ranking", Stanford InfoLab 1999) over
  * the customer↔supplier transaction graph. A data-curation pipeline uses
  * exactly this shape for influence/centrality weighting of interlinked
  * corpora (web graphs, citation graphs) before sampling.
  */
object Graph {

  /** Fixed-point scale: scores are BIGINTs in units of 1e-6 rank mass. */
  private[graft] val prScale = 1000000L

  /** Damping factor 0.85 as an exact rational (85/100) — see below. */
  private val prDampNum = 85L

  private[graft] val prRounds = 3

  /** PageRank, [[prRounds]] synchronous rounds, over the undirected
    * bipartite graph customer—supplier (an edge per distinct
    * (o_custkey, l_suppkey) transaction pair). Node encoding packs both
    * key spaces into one join column: customer k → 2k, supplier k → 2k+1.
    *
    * EXACT-INTEGER iteration: scores live as BIGINT fixed-point
    * ([[prScale]]); each round is
    *   pr'(v) = (15·scale) div 100  +  (85 · Σ_{u→v} (pr(u) div deg(u))) div 100
    * — integer division only, no float ever enters the plan, so the
    * result is bit-identical across engines and partition orders (the
    * [[TextAnalysis.unigramLogprob]] determinism discipline, taken all
    * the way: not even a quantized transcendental). Headroom: the total
    * rank mass is n·scale, so the pre-division product is bounded by
    * 85·n·scale ≈ 8.5e16 at n = 10^9 — inside a BIGINT with two decades
    * to spare, and ANSI mode would fail loudly rather than wrap.
    *
    * 100 TB shape: the adjacency (src, dst, deg) is built once — degrees
    * are a map-side-combinable count, attached to edges in one join —
    * and localCheckpoint'd so no round rescans the base tables or
    * re-grows lineage. Each round is the canonical edge-partitioned
    * join→aggregate: the score frame (one row per NODE, tiny next to the
    * edge set) joins in on src, contributions aggregate on dst with
    * map-side partials. Both sides hash-partition on their join/group
    * keys, so the adjacency's shuffle files are reused across rounds —
    * the steady state is one exchange of (dst, contrib) longs per round.
    * With every node reachable in one hop of the undirected edge set,
    * there are no dangling nodes and the node set is closed under the
    * iteration (spec-pinned). */
  def linkPagerank(s: SparkSession, dir: String): DataFrame = {
    // checkpoint the distinct pair set so the base-table join runs ONCE
    // (the undirected doubling and the degree aggregate would otherwise
    // each re-evaluate it)
    val e0 = Corpus.table(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(Corpus.table(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
      .graftCheckpoint()
    // both directions from one subtree — an explode, not a self-union
    // (a union's branches are separate subtrees and would scan e0 twice)
    val edges = e0
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // checkpoint the degree-attached adjacency: no round rescans the
    // base tables or re-grows lineage. Per-round join physics under
    // AQE: the score frame is node-sized (tiny next to the edge set),
    // so the runtime re-plan broadcasts it and the adjacency never
    // re-exchanges (audited on the FINAL adaptive plan). Past the
    // broadcast threshold — 10⁹+ nodes — the rounds become the
    // textbook Pregel shape instead: edge set and scores co-shuffle on
    // src, the same per-round exchange GraphX accepts; either way the
    // steady state is bounded by one pass of (dst, contrib) longs per
    // round
    val adj = edges.join(deg, Seq("src")).graftCheckpoint()
    // e0's blocks exist only to build adj: free them now instead of
    // holding edge-pair storage until the ContextCleaner notices — the
    // lingering blocks measurably tax the queries that run next
    org.apache.spark.sql.graft.Bridge.releaseCheckpoint(e0)
    // Round 1 is an IDENTITY join and is folded away (r16): the initial
    // score table is exactly distinct(src of adj) at the constant
    // prScale, so joining adj to it matches every adjacency row exactly
    // once with score = prScale — round 1 therefore reduces to the
    // projection contrib = prScale div deg over adj alone, removing the
    // pr0 distinct subtree (an exchange + two aggregates over the edge
    // set) AND the first of the three per-round joins, bit-identically
    // (same rows, same integer arithmetic; oracle keeps its explicit pr0
    // CTE and stays hash-exact). Rounds 2+ join the previous round's
    // node-sized score frame as before.
    var pr: DataFrame = null
    for (round <- 1 to prRounds) {
      val contribs =
        if (round == 1) adj.select(col("dst"), expr(s"$prScale div deg").as("contrib"))
        else adj.join(pr, col("src") === col("node"))
          .select(col("dst"), expr("score div deg").as("contrib"))
      pr = contribs
        .groupBy(col("dst"))
        .agg(expr(s"${15L * prScale / 100} + ($prDampNum * sum(contrib)) div 100")
          .as("score"))
        .select(col("dst").as("node"), col("score"))
    }
    pr.select(
      when(pmod(col("node"), lit(2)) === 0, lit("customer"))
        .otherwise(lit("supplier")).as("node_type"),
      expr("node div 2").as("node_id"),
      col("score"))
  }

  val linkPagerankSql: String = {
    // DuckDB SUM(BIGINT) widens to HUGEINT — cast back so score stays a
    // BIGINT column (the Spark side's type) end to end
    val base = s"CAST(${15L * prScale / 100} + " +
      s"($prDampNum * CAST(SUM(p.score // d.deg) AS BIGINT)) // 100 AS BIGINT)"
    def round(prev: String, out: String): String =
      s"""$out AS (
         |  SELECT e.dst AS node, $base AS score
         |  FROM edges e JOIN deg d ON e.src = d.src JOIN $prev p ON e.src = p.node
         |  GROUP BY 1)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
       |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1),
       |pr0 AS (SELECT src AS node, CAST($prScale AS BIGINT) AS score FROM deg),
       |${round("pr0", "pr1")},
       |${round("pr1", "pr2")},
       |${round("pr2", "pr3")}
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
       |  node // 2 AS node_id, score
       |FROM pr3""".stripMargin
  }
}
