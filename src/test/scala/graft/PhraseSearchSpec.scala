package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PostingsIndex, Retrieval}

/** Positional contracts of exact phrase search: overlapping matches of a
  * repeated-term phrase all count, bag-of-words co-occurrence without
  * adjacency does NOT match, and the index-pruned path is row-for-row the
  * full-scan operator (the shared-oracle precondition).
  */
class PhraseSearchSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  private def hits(docs: DataFrame, phrases: Seq[Seq[String]]): Map[(String, Long), (Long, Long)] = {
    val toks = docs
      .select(col("doc_id"), lit(null).cast("int").as("pid"),
        posexplode(graft.operators.TextAnalysis.tokensCol(col("text"))))
      .toDF("doc_id", "pid", "pos", "token")
      .where(col("token").isin(phrases.flatten.distinct: _*))
    Retrieval.phraseHitsOf(toks, phrases).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
  }

  private def docsOf(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("repeated-term phrase counts overlapping occurrences") {
    // "a a a a" holds THREE starts of "a a" (0, 1, 2) — the slot-distinct
    // aggregate must not collapse a token serving two slots at different
    // starts, and must not double-count one slot at the same start
    val m = hits(docsOf((1L, "a a a a"), (2L, "a b a")), Seq(Seq("a", "a")))
    assert(m === Map(("a a", 1L) -> (3L, 0L)))
  }

  test("co-occurrence without adjacency does not match") {
    // both terms present, never adjacent in order
    val m = hits(
      docsOf((1L, "table x part y table"), (2L, "part table"),
        (3L, "x table part y")),
      Seq(Seq("table", "part")))
    assert(m === Map(("table part", 3L) -> (1L, 1L)))
  }

  test("multi-phrase scan attributes hits to the right phrase") {
    val m = hits(
      docsOf((7L, "table table key table part")),
      Seq(Seq("table", "table", "key"), Seq("table", "part")))
    assert(m === Map(
      ("table table key", 7L) -> (1L, 0L),
      ("table part", 7L) -> (1L, 3L)))
  }

  test("phrase at the exact end of the token stream matches") {
    val m = hits(docsOf((4L, "x y table part")), Seq(Seq("table", "part")))
    assert(m === Map(("table part", 4L) -> (1L, 2L)))
  }

  test("indexed path == full scan on the gate corpus") {
    val full = Retrieval.phraseSearch(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val idx = PostingsIndex.phraseSearchIndexed(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(full.nonEmpty, "gate corpus must exercise the phrase set")
    assert(idx === full)
  }

  test("tf >= multiplicity candidate cut is non-vacuous for the repeated-term phrase") {
    // docs holding 'table' ONCE can never match "table table key" — the
    // indexed path's tf>=2 cut must exclude them while the 2-gram's tf>=1
    // cut keeps them; pin via a doc matching the 2-gram whose 'table'
    // tf is 1 (exists at sf0.001: any "... table part ..." with a single
    // 'table'), asserting the indexed result still found it (no over-prune)
    val one = Retrieval.phraseSearch(spark, sf)
      .where(col("phrase") === "table part").count()
    val oneIdx = PostingsIndex.phraseSearchIndexed(spark, sf)
      .where(col("phrase") === "table part").count()
    assert(one === oneIdx && one > 0)
  }
}
