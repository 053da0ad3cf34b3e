package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation
import graft.streaming.CurationStream

/** Batch/stream unification of the curation verdict: the streaming
  * retention path must agree with `Curation.corpusRetention` on a
  * duplicate-free corpus (where the keep-min vs first-arrival policies
  * coincide), and later arrivals of an already-seen fingerprint must be
  * labeled duplicates across micro-batches.
  */
class CurationStreamSpec extends AnyFunSuite {

  // shared, never-stopped session (suites in one JVM would otherwise
  // tear down each other's SparkContext)
  private lazy val spark: SparkSession = SparkTestSession.spark

  private val sf = "/root/testdata/sf0.001"

  test("streaming retention == batch retention on a duplicate-free corpus; replays flagged") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.sources.Corpus.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val batchVerdicts = Curation.corpusRetention(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap

    val in = MemoryStream[(Long, String)]
    val out = CurationStream.retention(in.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("graft_curation_stream")
      .outputMode("append").start()
    try {
      // batch 1: the corpus itself (unique fingerprints — policies coincide)
      in.addData(docs)
      q.processAllAvailable()
      val got = spark.table("graft_curation_stream")
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getBoolean(2))).toMap
      assert(got.size === docs.size)
      assert(got === batchVerdicts,
        "streaming verdicts must match the batch operator on unique docs")

      // batch 2: replay five docs under new ids — all must flag duplicate
      val replays = docs.take(5).map { case (id, text) => (id + 1000000L, text) }
      in.addData(replays)
      q.processAllAvailable()
      val after = spark.table("graft_curation_stream")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      replays.foreach { case (id, _) =>
        assert(after(id) === "duplicate", s"replayed doc $id not flagged")
      }
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_curation_stream")
    }
  }

  test("quality classifier scores a stream at ingestion, equal to batch bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val docs = graft.sources.Corpus.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val batch = graft.operators.TextAnalysis.qualityClassifier(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
      .sortBy(_._1)

    // the operator is stateless + shuffle-free, so the SAME code path runs
    // over an unbounded stream — model-apply filtering at ingestion
    val in = MemoryStream[(Long, String)]
    val out = graft.operators.TextAnalysis.qualityClassifierFrom(
      in.toDF().toDF("doc_id", "text"),
      graft.operators.TextAnalysis.trainedWeights(spark, sf))
    val q = out.writeStream.format("memory").queryName("graft_classifier_stream")
      .outputMode("append").start()
    try {
      // deliver in two arbitrary micro-batches
      val (h1, h2) = docs.splitAt(docs.size / 2)
      in.addData(h1); q.processAllAvailable()
      in.addData(h2); q.processAllAvailable()
      val got = spark.table("graft_classifier_stream")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
        .sortBy(_._1)
      assert(got === batch, "streamed classifier scores diverged from batch")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_classifier_stream")
    }
  }
}
