package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EntityResolution

/** Contracts of the record-linkage operator: the match graph's transitive
  * closure (not pairwise thresholding) defines entities, singletons label
  * themselves, blocking bounds the candidate set, and corpus support
  * aggregates per entity without a corpus join-back.
  */
class EntityResolutionSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  test("transitive chains resolve to ONE entity even where pair distance exceeds the threshold") {
    val res = EntityResolution.entityResolution(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // cold↔old (d=1), old↔red / new↔red (d=2) chain per noun: all four
    // names must share a label although levenshtein(cold X, new X) > 2
    val nouns = res.keySet.map(_.split(" ")(1))
    assert(nouns.nonEmpty)
    nouns.foreach { noun =>
      val chain = Seq("cold", "old", "red", "new").map(adj => s"$adj $noun")
        .filter(res.contains)
      if (chain.length == 4) {
        assert(chain.map(res).distinct.size === 1,
          s"chain $chain must resolve to one entity, got ${chain.map(res)}")
        // and the label is the component minimum nid — which belongs to
        // one of the chain's own members (labels never leave a component)
        val others = res.view.filterKeys(k => !chain.contains(k)).values.toSet
        assert(!others.contains(res(chain.head)),
          "chain label leaked into a different component")
      }
    }
    // blue/small/hot/large are ≥3 edits from everything in their block:
    // they stay singleton entities with distinct labels
    val singles = res.view.filterKeys(_.startsWith("blue ")).values.toSeq
    assert(singles.distinct.size === singles.size,
      "distinct singleton names must keep distinct entity labels")
  }

  test("matches are blocked (same noun), canonical (one direction), verified (dist <= 2)") {
    val m = EntityResolution.entityMatches(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(m.nonEmpty)
    m.foreach { case (a, b, d) =>
      assert(a.split(" ")(1) === b.split(" ")(1), s"cross-block pair ($a, $b)")
      assert(d >= 1 && d <= 2, s"unverified distance $d for ($a, $b)")
      assert(a !== b)
    }
    // canonical: no pair appears in both directions
    val keys = m.map { case (a, b, _) => Set(a, b) }
    assert(keys.distinct.length === keys.length, "pair emitted twice")
  }

  test("incremental merge == full recompute on the gate corpus, with a non-vacuous cut") {
    import org.apache.spark.sql.functions.col
    val full = EntityResolution.entityResolution(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val inc = EntityResolution.entityIncremental(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(inc === full)
    // the cut must actually split the corpus: standing names AND new
    // names both exist, or the scenario degenerates
    val parts = graft.sources.Corpus.part(spark, sf)
      .select(col("p_partkey"), col("p_name"))
    val snapNames = parts.where(col("p_partkey") < EntityResolution.entityCut)
      .select("p_name").distinct().collect().map(_.getString(0)).toSet
    val allNames = parts.select("p_name").distinct().collect()
      .map(_.getString(0)).toSet
    assert(snapNames.nonEmpty && (allNames -- snapNames).nonEmpty,
      s"cut ${EntityResolution.entityCut} does not split the universe")
  }

  test("a new name bridging two standing entities merges them through label edges") {
    import spark.implicits._
    // standing: two singleton entities 3+ edits apart (no old-old match)
    val snapParts = Seq((1L, "aaaaaa k"), (2L, "bbbaaa k"))
      .toDF("p_partkey", "p_name")
    val snap = EntityResolution.resolveLabels(
      spark, EntityResolution.universeOf(snapParts))
    assert(snap.collect().map(r => r.getAs[Long]("entity_id")).distinct.length === 2,
      "precondition: the standing names must be separate entities")
    // batch: one bridge within distance 2 of BOTH (d=2 to aaaaaa, d=1
    // to bbbaaa) — label-preserving merges get this wrong
    val merged = EntityResolution.entityMerge(spark, snap,
      Seq((101L, "bbaaaa k")).toDF("p_partkey", "p_name")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(merged.keySet === Set("aaaaaa k", "bbbaaa k", "bbaaaa k"))
    assert(merged.values.map(_._1).toSet === Set(1L),
      s"bridge must merge everything into entity 1, got $merged")
  }

  test("re-ingesting rows of a standing name keeps its nid and adds support") {
    import spark.implicits._
    val snap = EntityResolution.resolveLabels(spark,
      EntityResolution.universeOf(Seq((5L, "zzzz q")).toDF("p_partkey", "p_name")))
    val merged = EntityResolution.entityMerge(spark, snap,
      Seq((200L, "zzzz q"), (201L, "zzzz q")).toDF("p_partkey", "p_name"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(merged.toSeq === Seq(("zzzz q", 5L, 3L)),
      "snapshot precedence: nid stays the standing min, n_rows accumulates")
  }

  test("incremental plan: blocked equi-joins only, no cartesian, no nested loop") {
    val plan = EntityResolution.entityIncremental(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"incremental entity plan went all-pairs:\n$plan")
  }

  test("n_rows sums to the corpus row count — support rides the universe aggregate") {
    val res = EntityResolution.entityResolution(spark, sf)
    val total = res.agg(org.apache.spark.sql.functions.sum("n_rows"))
      .collect()(0).getLong(0)
    assert(total === graft.sources.Corpus.part(spark, sf).count())
  }
}
