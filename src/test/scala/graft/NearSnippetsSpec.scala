package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Retrieval

/** Edge contracts of the proximity KWIC snippet (`near_snippets`):
  * the window clamps exactly at position 0 and at end-of-doc, and the
  * display anchor is the CLOSEST pair with a deterministic tie-break —
  * the parts of the operator its oracle exercises only if the corpus
  * happens to contain edge hits.
  */
class NearSnippetsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Long, String)] = {
    import spark.implicits._
    Retrieval.nearSnippetsOf(spark, docs.toDF("doc_id", "text"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
  }

  test("snippet clamps at both document edges; anchor is the closest pair, ties to the left") {
    // nearTerms = (table, part), nearWindow = 3, snippetContext = 3
    val out = run(Seq(
      // pair at the very start: lo=0 — left context clamps to 0
      1L -> "table part alpha beta gamma delta",
      // pair at the very end: hi=len-1 — right context clamps to len
      2L -> "alpha beta gamma delta table part",
      // two pairs: (table@1, part@3) dist 2 and (table@5, part@6) dist 1
      // → the anchor is the CLOSEST pair, not the first one
      3L -> "alpha table beta part gamma table part omega end tail",
      // terms beyond the window: no hit row at all
      4L -> "table a b c d part"))

    // doc 1: pair (0,1); snippet = tokens max(0-3,0)..1+3 = 0..4
    assert(out(1L) === ((1L, 1L, 0L, "table part alpha beta gamma")))
    // doc 2: pair (4,5); snippet = tokens 1..5 (right edge clamped)
    assert(out(2L) === ((1L, 1L, 4L, "beta gamma delta table part")))
    // doc 3: pairs (1,3) d2, (5,3) d2, (5,6) d1, (1,... ) — closest is
    // (5,6) d1 → window 2..9 → clamped at len 10 → tokens 2..9
    assert(out(3L)._2 === 1L, "min_dist must be the closest pair's")
    assert(out(3L)._3 === 5L, "anchor must be the closest pair's left pos")
    assert(out(3L)._4 === "beta part gamma table part omega end tail")
    assert(!out.contains(4L), "a beyond-window doc must not produce a hit")

    // n_pairs counts ALL qualifying pairs, not just the anchor
    assert(out(3L)._1 === 3L,
      s"doc 3 has pairs (1,3), (5,3), (5,6): got ${out(3L)._1}")
  }

  test("tie on distance resolves to the smaller left position") {
    val out = run(Seq(
      // pairs (table@0, part@2) and (table@4, part@6): both dist 2 —
      // anchor must be the leftmost
      5L -> "table x part y table z part"))
    assert(out(5L)._2 === 2L)
    assert(out(5L)._3 === 0L, "dist tie must resolve to the leftmost pair")
    // anchor (0,2): window max(0-3,0)..2+3 → tokens 0..5
    assert(out(5L)._4 === "table x part y table z",
      "left-edge clamp + right context of the leftmost anchor")
  }
}
