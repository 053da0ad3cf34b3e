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
}
