package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamPack

/** Batch/stream unification of per-writer sequence packing: the
  * streaming packer's per-source running offset must assign every
  * document EXACTLY the (start_offset, chunk span) the batch operator
  * derives — under arbitrary micro-batch splits, including a split that
  * lands mid-source, and with within-batch arrival order scrambled (the
  * per-batch doc_id sort restores it).
  */
class StreamPackSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  private def corpusEvents(): Seq[StreamPack.DocEvent] = {
    import graft.operators.TextAnalysis
    graft.sources.Corpus.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        size(filter(TextAnalysis.tokensCol(col("text")),
          t => length(t) > 0)).cast("long").as("n_tokens"))
      .collect()
      .map(r => StreamPack.DocEvent(r.getString(0), r.getLong(1), r.getLong(2),
        new Timestamp(r.getLong(1))))
      .sortBy(_.docId)
  }

  private def batchRows(): Set[(String, Long, Long, Long, Long, Long, Long)] =
    graft.operators.Packing.packByWriter(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet

  test("stream offsets equal the batch packing under mid-source micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val evs = corpusEvents()
    assert(evs.nonEmpty)
    // three uneven splits; the cut points land mid-source (doc ids
    // interleave sources), so per-source state must carry offsets across
    // batch boundaries for every writer
    val cuts = Seq(evs.length / 3, evs.length / 2 + 1)
    val batches = Seq(
      evs.take(cuts(0)),
      // scramble within-batch arrival order: the packer's per-batch
      // doc_id sort must restore it
      evs.slice(cuts(0), cuts(1)).reverse,
      evs.drop(cuts(1)))
    val in = MemoryStream[StreamPack.DocEvent]
    val q = StreamPack.offsets(in.toDS()).writeStream.format("memory")
      .queryName("graft_pack_stream").outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val got = spark.table("graft_pack_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      assert(got === batchRows(),
        "streamed packing must equal the batch per-writer packing")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_pack_stream")
    }
  }

  test("a later batch continues each writer's token stream without gaps or overlap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[StreamPack.DocEvent]
    val q = StreamPack.offsets(in.toDS()).writeStream.format("memory")
      .queryName("graft_pack_cont").outputMode("append").start()
    try {
      in.addData(Seq(
        StreamPack.DocEvent("a", 1L, 100L, new Timestamp(1)),
        StreamPack.DocEvent("b", 2L, 5L, new Timestamp(2))))
      q.processAllAvailable()
      in.addData(Seq(
        StreamPack.DocEvent("a", 3L, 2048L, new Timestamp(3)),
        StreamPack.DocEvent("a", 4L, 0L, new Timestamp(4))))
      q.processAllAvailable()
      val rows = spark.table("graft_pack_cont").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).sortBy(t => (t._1, t._2))
      assert(rows === Array(
        ("a", 1L, 0L, 0L, 0L, 1L),       // 100 tokens, chunk 0
        ("a", 3L, 100L, 0L, 1L, 2L),     // 2048 from offset 100 spans chunks 0-1
        ("a", 4L, 2148L, 1L, 1L, 1L),    // empty doc: one virtual token in chunk 1
        ("b", 2L, 0L, 0L, 0L, 1L)),      // writer b owns its own sequence space
        "cross-batch offsets must continue per writer exactly")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_pack_cont")
    }
  }
}
