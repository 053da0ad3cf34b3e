package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.TopTermsStream

/** Batch/stream unification of the Space-Saving sketch: the streaming
  * aggregation's state-store buffer must evolve EXACTLY like the batch
  * sketch over the prefix of data seen so far — the incremental-merge
  * correctness that lets the same `graft_top_terms` answer be maintained
  * continuously instead of recomputed.
  */
class TopTermsStreamSpec extends AnyFunSuite {

  // shared, never-stopped session (suites in one JVM would otherwise
  // tear down each other's SparkContext)
  private lazy val spark: SparkSession = SparkTestSession.spark

  private def topOf(rows: Array[Row]): Map[String, Seq[(String, Long)]] =
    rows.map { r =>
      r.getString(0) -> r.getSeq[Row](1).map(e => (e.getString(0), e.getLong(1)))
    }.toMap

  test("streaming sketch state equals the batch sketch over the data seen so far") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val batch1 = Seq(
      ("srcA", "spark spark table scan scan scan"),
      ("srcB", "join join join filter"))
    val batch2 = Seq(
      ("srcA", "scan scan table window"),
      ("srcB", "filter filter join"))

    def batchSketch(data: Seq[(String, String)]): Map[String, Seq[(String, Long)]] = {
      val ss = udaf(graft.functions.SketchFunctions.spaceSaving,
        org.apache.spark.sql.Encoders.STRING)
      topOf(data.toDF("source", "text")
        .select(col("source"),
          explode(graft.operators.TextAnalysis.tokensCol(col("text"))).as("token"))
        .where(length(col("token")) > 0)
        .groupBy(col("source")).agg(ss(col("token")).as("top"))
        .collect())
    }

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
}
