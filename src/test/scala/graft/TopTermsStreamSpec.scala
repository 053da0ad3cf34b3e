package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TopTermsStream

/** Batch/stream unification of the Space-Saving sketch: the streaming
  * aggregation's state-store buffer must evolve EXACTLY like the batch
  * sketch over the prefix of data seen so far — the incremental-merge
  * correctness that lets the same `graft_top_terms` answer be maintained
  * continuously instead of recomputed — in BOTH output modes: complete
  * (the sink holds the whole state each batch) and update (the intended
  * deployment shape: one updated row per changed source per micro-batch).
  */
class TopTermsStreamSpec extends AnyFunSuite {

  // shared, never-stopped session (suites in one JVM would otherwise
  // tear down each other's SparkContext)
  private lazy val spark: SparkSession = SparkTestSession.spark

  private val batch1 = Seq(
    ("srcA", "spark spark table scan scan scan"),
    ("srcB", "join join join filter"))
  private val batch2 = Seq(
    ("srcA", "scan scan table window"),
    ("srcB", "filter filter join"))

  private def topOf(rows: Array[Row]): Map[String, Seq[(String, Long)]] =
    rows.map { r =>
      r.getString(0) -> r.getSeq[Row](1).map(e => (e.getString(0), e.getLong(1)))
    }.toMap

  private def batchSketch(data: Seq[(String, String)]): Map[String, Seq[(String, Long)]] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val ss = udaf(graft.functions.SketchFunctions.spaceSaving,
      org.apache.spark.sql.Encoders.STRING)
    topOf(data.toDF("source", "text")
      .select(col("source"),
        explode(graft.operators.TextAnalysis.tokensCol(col("text"))).as("token"))
      .where(length(col("token")) > 0)
      .groupBy(col("source")).agg(ss(col("token")).as("top"))
      .collect())
  }

  test("streaming sketch state equals the batch sketch over the data seen so far") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[(String, String)]
    val out = TopTermsStream.topTerms(in.toDF().toDF("source", "text"))
    // complete mode: the memory sink holds exactly the current per-source
    // state each batch, so the comparison needs no row-order assumptions
    val q = out.writeStream.format("memory").queryName("graft_top_terms_stream")
      .outputMode("complete").start()
    try {
      def latest(): Map[String, Seq[(String, Long)]] =
        topOf(spark.table("graft_top_terms_stream").collect())
      in.addData(batch1)
      q.processAllAvailable()
      assert(latest() === batchSketch(batch1),
        "after batch 1 the stream state must equal the batch sketch of batch 1")
      in.addData(batch2)
      q.processAllAvailable()
      assert(latest() === batchSketch(batch1 ++ batch2),
        "after batch 2 the stream state must equal the batch sketch of all data")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_top_terms_stream")
    }
  }

  test("update mode emits one updated row per changed source per micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[(String, String)]
    val out = TopTermsStream.topTerms(in.toDF().toDF("source", "text"))
    val q = out.writeStream.format("memory").queryName("graft_top_terms_upd")
      .outputMode("update").start()
    try {
      in.addData(batch1)
      q.processAllAvailable()
      val afterB1 = spark.table("graft_top_terms_upd").collect()
      assert(afterB1.map(_.getString(0)).sorted === Array("srcA", "srcB"),
        "batch 1 must emit exactly one updated row per source")
      assert(topOf(afterB1) === batchSketch(batch1))
      in.addData(batch2)
      q.processAllAvailable()
      val all = spark.table("graft_top_terms_upd").collect()
      assert(all.length === 4,
        "each micro-batch that changes a source must append exactly its updated row")
      // the update stream's LATEST row per source is the one with the
      // larger token total (counts only grow); it must equal the batch
      // sketch over everything seen
      val latest = all.groupBy(_.getString(0)).map { case (src, rows) =>
        val newest = rows.maxBy(_.getSeq[Row](1).map(_.getLong(1)).sum)
        src -> newest.getSeq[Row](1).map(e => (e.getString(0), e.getLong(1)))
      }
      assert(latest === batchSketch(batch1 ++ batch2),
        "the latest update per source must equal the batch sketch of all data")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_top_terms_upd")
    }
  }
}
