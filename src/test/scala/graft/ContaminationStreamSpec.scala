package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.ContaminationStream

/** Batch/stream unification of benchmark decontamination: streaming the
  * corpus through the at-ingestion filter must flag exactly the documents
  * the batch sweep flags, regardless of how the stream is micro-batched.
  */
class ContaminationStreamSpec extends AnyFunSuite {

  // shared, never-stopped session (suites in one JVM would otherwise
  // tear down each other's SparkContext)
  private lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("streamed at-ingestion flags == batch contamination verdicts") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val batchFlagged = graft.operators.Dedup.contamination(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(batchFlagged.nonEmpty, "corpus must contain contaminated docs")

    val bench = graft.sources.Corpus.documents(spark, sf)
      .where(col("doc_id") < 10)
    val corpus = graft.sources.Corpus.documents(spark, sf)
      .where(col("doc_id") >= 10)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

    val in = MemoryStream[(Long, String)]
    val out = ContaminationStream.contaminated(in.toDF().toDF("doc_id", "text"), bench)
    val q = out.writeStream.format("memory").queryName("graft_contam_stream")
      .outputMode("append").start()
    try {
      // arbitrary micro-batching must not change any verdict
      val (b1, b2) = corpus.splitAt(corpus.size / 3)
      in.addData(b1)
      q.processAllAvailable()
      in.addData(b2)
      q.processAllAvailable()
      val streamed = spark.table("graft_contam_stream")
        .collect().map(_.getLong(0)).toSet
      assert(streamed === batchFlagged,
        "at-ingestion flags must equal the batch sweep's verdicts")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_contam_stream")
    }
  }

  test("streamed at-ingestion span-scrub == batch contamination_scrub, any micro-batching") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val want = graft.operators.Dedup.contaminationScrub(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(want.exists(_._4 > 0), "corpus must contain spans to scrub")
    assert(want.exists(_._4 == 0), "corpus must contain clean docs too")

    val bench = graft.sources.Corpus.documents(spark, sf)
      .where(col("doc_id") < 10)
    val corpus = graft.sources.Corpus.documents(spark, sf)
      .where(col("doc_id") >= 10)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq

    val in = MemoryStream[(Long, String)]
    val out = ContaminationStream.scrubbed(in.toDF().toDF("doc_id", "text"), bench)
    val q = out.writeStream.format("memory").queryName("graft_cscrub_stream")
      .outputMode("append").start()
    try {
      // three uneven micro-batches — the scrub is stateless, so the
      // batching must be invisible in the output
      val (b1, rest) = corpus.splitAt(corpus.size / 4)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.table("graft_cscrub_stream")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      assert(streamed === want,
        "at-ingestion scrub must equal the batch scrub row for row")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_cscrub_stream")
    }
  }
}
