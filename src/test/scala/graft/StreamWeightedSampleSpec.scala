package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

/** Batch/stream unification of the weighted reservoir: the streaming
  * aggregation's per-source buffer must evolve EXACTLY like the batch
  * top-k over the prefix of data seen so far — under any micro-batch
  * split, including one that delivers a source's eventual winners in a
  * LATER batch than its early picks (the reservoir must displace, not
  * just append).
  */
class StreamWeightedSampleSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  // (source, doc_id, n_chars): n_chars spans two orders of magnitude so
  // weights genuinely reorder picks vs doc_id order; srcA gets > k docs
  // across the two batches so displacement is exercised (k = 8)
  private val batch1: Seq[(String, Long, Long)] =
    (1L to 10L).map(i => ("srcA", i, i * 37 % 900 + 10)) ++
      (11L to 14L).map(i => ("srcB", i, i * 53 % 400 + 5))
  private val batch2: Seq[(String, Long, Long)] =
    (15L to 24L).map(i => ("srcA", i, i * 71 % 1200 + 20)) ++
      Seq(("srcC", 25L, 640L), ("srcB", 26L, 7L))

  private def batchPicks(data: Seq[(String, Long, Long)]): Set[(String, Long, Long)] = {
    import spark.implicits._
    graft.operators.Curation
      .weightedSampleFrom(data.toDF("source", "doc_id", "n_chars"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def asPicks(rows: Array[Row]): Set[(String, Long, Long)] =
    rows.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("stream reservoir equals the batch sample over the data seen so far") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[(String, Long, Long)]
    val out = graft.streaming.StreamWeightedSample.picks(
      in.toDF().toDF("source", "doc_id", "n_chars"))
    val q = out.writeStream.format("memory").queryName("graft_wsample_stream")
      .outputMode("complete").start()
    try {
      def latest(): Set[(String, Long, Long)] =
        asPicks(spark.table("graft_wsample_stream").collect())
      in.addData(batch1)
      q.processAllAvailable()
      assert(latest() === batchPicks(batch1),
        "after batch 1 the stream picks must equal the batch sample of batch 1")
      in.addData(batch2)
      q.processAllAvailable()
      assert(latest() === batchPicks(batch1 ++ batch2),
        "after batch 2 the stream picks must equal the batch sample of ALL data")
      // displacement is non-vacuous: batch 2 must have evicted at least
      // one of srcA's batch-1 picks (10 docs then 10 more for k = 8)
      val a1 = batchPicks(batch1).filter(_._1 == "srcA").map(_._2)
      val aAll = batchPicks(batch1 ++ batch2).filter(_._1 == "srcA").map(_._2)
      assert((a1 -- aAll).nonEmpty, "degenerate data: batch 2 displaced nothing")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_wsample_stream")
    }
  }

  test("update mode emits the touched sources' current k picks per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[(String, Long, Long)]
    val out = graft.streaming.StreamWeightedSample.picks(
      in.toDF().toDF("source", "doc_id", "n_chars"))
    val q = out.writeStream.format("memory").queryName("graft_wsample_upd")
      .outputMode("update").start()
    try {
      in.addData(batch1)
      q.processAllAvailable()
      val after1 = spark.table("graft_wsample_upd").collect()
      assert(asPicks(after1) === batchPicks(batch1))
      in.addData(batch2)
      q.processAllAvailable()
      val all = spark.table("graft_wsample_upd").collect()
      // the memory sink appends each batch's emissions: multiset
      // difference isolates exactly what batch 2 emitted
      val emitted2 = all.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq.diff(after1.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
      // batch 2 touched every source: its emissions must be precisely
      // each source's post-merge current picks — the final batch answer
      assert(emitted2.toSet === batchPicks(batch1 ++ batch2),
        "batch 2 must emit the touched sources' updated k picks, nothing else")
      assert(emitted2.length === emitted2.distinct.length,
        "one row per (source, pick) per update")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_wsample_upd")
    }
  }
}
