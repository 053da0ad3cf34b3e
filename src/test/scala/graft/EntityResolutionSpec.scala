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

  test("n_rows sums to the corpus row count — support rides the universe aggregate") {
    val res = EntityResolution.entityResolution(spark, sf)
    val total = res.agg(org.apache.spark.sql.functions.sum("n_rows"))
      .collect()(0).getLong(0)
    assert(total === graft.sources.Corpus.part(spark, sf).count())
  }
}
