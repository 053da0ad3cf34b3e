package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin
import graft.sources.Corpus

/** Banded keyless range join: result equivalence vs the naive inequality
  * join (the semantics) and plan shape (the 100 TB contract — routing via
  * a band equi-join, never a nested-loop over all pairs).
  */
class RangeJoinSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  test("banded point-in-range join matches the naive inequality join") {
    val ev = Corpus.events(spark, sf)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
    val views = ev.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"))
    // naive: exactly the oracle's LEFT JOIN on the bare inequality
    // (Catalyst plans a BroadcastNestedLoopJoin — fine at sf0.001)
    val naive = clicks.join(views,
        col("view_ts") <= col("click_ts") &&
        col("click_ts") < col("view_ts") + expr("INTERVAL 10 MINUTE"),
        "left_outer")
      .groupBy("click_id").agg(
        count(col("view_id")).as("n"), max(col("view_ts")).as("latest"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.toString)))
      .toSet
    val banded = RangeJoin.concurrentViews(spark, sf)
      .select(col("click_id"), col("n_concurrent"), col("latest_view_ts"))
      .collect().map(r => (r.getLong(0), r.getLong(1), Option(r.get(2)).map(_.toString)))
      .toSet
    assert(banded === naive)
    assert(banded.nonEmpty)
    // at least one click must actually have concurrent views, or the
    // equivalence above is vacuous
    assert(banded.exists(_._2 > 0))
  }

  test("unmatched points survive left_outer with NULL range columns") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 50L)).toDF("id", "v")
    val ranges = Seq((10L, 0L, 10L)).toDF("rid", "s", "e")
    val out = RangeJoin.pointInRange(points, ranges,
        point = col("v"), start = col("s"), end = col("e"),
        bandWidth = 4L, joinType = "left_outer")
      .select("id", "rid").collect().map(r => (r.getLong(0), Option(r.get(1))))
    assert(out.toSet === Set((1L, Some(10L)), (2L, None)))
  }

  test("a qualifying pair is emitted exactly once even when the range spans many bands") {
    import spark.implicits._
    val points = Seq((1L, 7L)).toDF("id", "v")
    val ranges = Seq((10L, 0L, 100L)).toDF("rid", "s", "e") // spans 26 bands at w=4
    val out = RangeJoin.pointInRange(points, ranges,
        point = col("v"), start = col("s"), end = col("e"), bandWidth = 4L)
    assert(out.count() === 1L)
  }

  test("range ending exactly on a band boundary does not admit the boundary point") {
    import spark.implicits._
    val points = Seq((1L, 8L)).toDF("id", "v")
    val ranges = Seq((10L, 0L, 8L)).toDF("rid", "s", "e") // [0, 8): 8 excluded
    val out = RangeJoin.pointInRange(points, ranges,
        point = col("v"), start = col("s"), end = col("e"), bandWidth = 4L)
    assert(out.count() === 0L)
  }
}
