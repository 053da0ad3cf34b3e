package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, PostingsIndex}
import graft.streaming.StreamBm25Serve

/** Auto-scheduled maintenance (round-12 verdict, Next #5): a streaming
  * ingest that fragments its own index gets repaired by the ingest
  * stream itself — `appendStream(maintainEvery = N)` runs [[PostingsIndex
  * .maintain]] after every N-th micro-batch, consulting the same stored
  * stats a manual call would — while a RUNNING serve keeps answering:
  * before-repair triggers answer from the old layout, after-repair
  * triggers from the new (rebucketed) one, with no restart and no torn
  * reads (the mutation markers + PinnedIndex wait protocol).
  */
class StreamAutoMaintainSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  test("a fragmenting ingest auto-rebuckets; the running serve answers correctly across the swap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val idx = s"/tmp/graft_automnt_pidx_${System.nanoTime()}"
    val ckptIn = s"/tmp/graft_automnt_in_${System.nanoTime()}"
    val ckptSv = s"/tmp/graft_automnt_sv_${System.nanoTime()}"

    // bootstrap: 10 low-id docs at superBits=2 (256-doc superblocks) — 1 sb
    val docs0 = (0L until 10L).map(i => (i, s"alpha beta doc$i"))
    PostingsIndex.buildFrom(spark, docs0.toDF("doc_id", "text"), idx,
      superBits = 2)
    assert(spark.read.parquet(s"$idx/blockstats").count() === 1L)

    val perBatch = mutable.ArrayBuffer.empty[Set[(Long, Long)]]
    val qIn = MemoryStream[(Long, Seq[String])]
    val serve = StreamBm25Serve.serve(spark, idx,
      qIn.toDF().toDF("query_id", "terms"), ckptSv) { (res, _) =>
      perBatch += res.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val docIn = MemoryStream[(Long, String)]
    // maintainEvery=1 with a tiny target: the policy runs after every
    // micro-batch's append, from the ingest stream itself
    val ingest = PostingsIndex.appendStream(spark, idx,
      docIn.toDF().toDF("doc_id", "text"), ckptIn,
      maintainEvery = 1, targetSbs = 2)
    try {
      qIn.addData(Seq((1L, Seq("alpha"))))
      serve.processAllAvailable()

      // the fragmenting growth: 15 docs, one per 256-doc superblock →
      // 16 sbs > 4×targetSbs → the scheduled maintain must rebucket
      // tf=3 so the ingested docs OUTRANK the tf=1 bootstraps — batch 2
      // can only contain them if it reads the post-swap layout
      docIn.addData((1L to 15L).map(i => (i * 256L, "alpha alpha alpha")))
      ingest.processAllAvailable()
      val bits = spark.read.parquet(s"$idx/meta")
        .collect().head.getLong(0)
      assert(bits > 2L,
        s"the ingest-scheduled maintain must have rebucketed: superBits=$bits")
      assert(spark.read.parquet(s"$idx/blockstats").count() <= 8L,
        "the re-laid-out index must be back in the target band")

      // the serve keeps answering — next trigger sees the new layout
      qIn.addData(Seq((2L, Seq("alpha"))))
      serve.processAllAvailable()
      assert(serve.isActive, "the serve must survive the whole-tree swap")
    } finally { serve.stop(); ingest.stop() }

    assert(perBatch.size === 2)
    assert(!perBatch(0).exists(_._2 >= 256L),
      "batch 1 answered from the pre-ingest layout")
    assert(perBatch(1).exists(_._2 >= 256L),
      s"batch 2 must see the ingested docs through the rebucketed " +
        s"layout: ${perBatch(1)}")
    // trigger-exactness against the rebucketed index
    val want = PostingsIndex.bm25Batch(
        spark.read.parquet(s"$idx/postings"),
        spark.read.parquet(s"$idx/termstats"),
        spark.read.parquet(s"$idx/blockstats"),
        Seq((2L, "alpha")).toDF("query_id", "term"), k = 10,
        excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(perBatch(1) === want,
      "post-swap answers must equal the batch kernel on the new layout")
  }

  test("a drifting vector ingest is auto-retrained by the ingest stream (fit detector, no manual call)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val idx = s"/tmp/graft_automnt_vidx_${System.nanoTime()}"
    val ckpt = s"/tmp/graft_automnt_vin_${System.nanoTime()}"
    def vecs(ids: Seq[Long], axisOf: Long => Int): Seq[(Long, Seq[Double])] =
      ids.map { id =>
        val a = axisOf(id)
        (id, Array.tabulate(64)(d =>
          (if (d == a) 1.0 else 0.0) +
            0.02 * (((id * 31 + d * 7) % 11).toDouble / 11.0)).toSeq)
      }
    // RetrainSpec's proven drift corpus: quantizer fit to axes 0..15,
    // region B (axes 32..39) lands under it by jitter, region A expires
    // — the standing members' own-cell fit collapses
    IvfIndex.buildFrom(spark,
      vecs(0L until 80L, id => (id % 16).toInt).toDF("vec_id", "embedding"),
      idx, nCells = 16)
    IvfIndex.append(spark, idx,
      vecs(1000L until 1100L, id => 32 + (id % 8).toInt)
        .toDF("vec_id", "embedding"))
    IvfIndex.delete(spark, idx, (0L until 80L).toDF("vec_id"))
    assert(IvfIndex.assignmentFit(spark, idx) < 0.5,
      "precondition: the standing fit must be drift-collapsed")
    val in = MemoryStream[(Long, Seq[Double])]
    val ingest = IvfIndex.appendStream(spark, idx,
      in.toDF().toDF("vec_id", "embedding"), ckpt, maintainEvery = 1)
    try {
      in.addData(vecs(1100L until 1120L, id => 32 + (id % 8).toInt))
      ingest.processAllAvailable()
    } finally ingest.stop()
    // the scheduled maintain must have re-fit the quantizer: the live
    // members' own-cell fit is healthy again with no manual call
    val fit = IvfIndex.assignmentFit(spark, idx)
    assert(fit >= 0.9,
      f"the ingest-scheduled maintain must have re-trained: fit $fit%.3f")
    assert(IvfIndex.maintain(spark, idx) === Seq.empty,
      "and the repaired index reports healthy")
  }
}
