package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAllNoShrink

import org.apache.spark.sql.functions.col

import graft.operators.RangeJoin

/** Property check of the banded range join against an in-memory reference:
  * for ANY points, ranges, and band width, the banded equi-join must emit
  * exactly the pairs the bare predicate admits — once each. This is the
  * guarantee the plan-shape audit can't give: the band rewrite is a pure
  * optimization, invisible in the result for every input, not just the
  * corpus the oracle happens to check.
  */
object RangeJoinProps extends Properties("rangeJoin") {

  // each case runs a real Spark job on a tiny frame; cap the case count
  // so the suite stays fast while still sweeping widths/overlaps
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkTestSession.spark

  private val pointsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(0, 12)
    vs <- Gen.listOfN(n, Gen.chooseNum(-50L, 150L))
  } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }

  private val rangesGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.chooseNum(0, 12)
    rs <- Gen.listOfN(n, for {
      s <- Gen.chooseNum(-50L, 150L)
      // negative lengths: INVERTED ranges must behave as no-match, not
      // crash the band explode (sequence would throw on them unguarded)
      len <- Gen.chooseNum(-40L, 80L)
    } yield (s, s + len))
  } yield rs.zipWithIndex.map { case ((s, e), i) => (1000L + i, s, e) }

  property("banded inner join == bare predicate, exactly once, any band width") =
    forAllNoShrink(pointsGen, rangesGen, Gen.chooseNum(1L, 40L)) { (ps, rs, w) =>
      import spark.implicits._
      val points = ps.toDF("pid", "v")
      val ranges = rs.toDF("rid", "s", "e")
      val got = RangeJoin.pointInRange(points, ranges,
          point = col("v"), start = col("s"), end = col("e"), bandWidth = w)
        .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val want = for {
        (pid, v) <- ps
        (rid, s, e) <- rs
        if s <= v && v < e
      } yield (pid, rid)
      got.sorted == want.sorted
    }

  property("left_outer keeps every point exactly max(1, matches) times") =
    forAllNoShrink(pointsGen, rangesGen, Gen.chooseNum(1L, 40L)) { (ps, rs, w) =>
      import spark.implicits._
      val points = ps.toDF("pid", "v")
      val ranges = rs.toDF("rid", "s", "e")
      val got = RangeJoin.pointInRange(points, ranges,
          point = col("v"), start = col("s"), end = col("e"), bandWidth = w,
          joinType = "left_outer")
        .select("pid", "rid").collect()
        .map(r => (r.getLong(0), Option(r.get(1)))).toSeq
      val matches = ps.map { case (pid, v) =>
        pid -> rs.collect { case (rid, s, e) if s <= v && v < e => rid }
      }.toMap
      val want = ps.flatMap { case (pid, _) =>
        val m = matches(pid)
        if (m.isEmpty) Seq((pid, None: Option[Any]))
        else m.map(rid => (pid, Some(rid): Option[Any]))
      }
      got.sorted(Ordering.by((t: (Long, Option[Any])) => (t._1, t._2.map(_.toString)))) ==
        want.sorted(Ordering.by((t: (Long, Option[Any])) => (t._1, t._2.map(_.toString))))
    }
}
