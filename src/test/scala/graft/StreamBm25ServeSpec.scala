package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{PostingsIndex, Retrieval}
import graft.streaming.StreamBm25Serve

/** Streaming lexical serving must answer exactly what the batch index
  * scorer answers — per query, independent of how queries are
  * micro-batched — and every trigger's postings scan must carry the
  * term-pruning pushdown (the point of re-planning the batch scorer per
  * trigger; see the operator's scaladoc).
  */
class StreamBm25ServeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  test("served stream == batch scorer under uneven micro-batching; a queryTerms query == bm25 top-10") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val idx = s"/tmp/graft_bm25serve_${System.nanoTime()}"
    val ckpt = s"/tmp/graft_bm25serve_ckpt_${System.nanoTime()}"
    PostingsIndex.buildFrom(spark,
      sources.Corpus.documents(spark, sf).select(col("doc_id"), col("text")),
      idx, superBits = 2)

    val qs: Seq[(Long, Seq[String])] = Seq(
      1L -> Retrieval.queryTerms,
      2L -> Seq("table", "part"),
      3L -> Seq("data"),
      4L -> Seq("window", "scan"),
      5L -> Seq("join"))

    val got = mutable.ArrayBuffer.empty[(Long, Long, Int, Double)]
    val plans = mutable.ArrayBuffer.empty[String]
    val in = MemoryStream[(Long, Seq[String])]
    val q = StreamBm25Serve.serve(spark, idx,
      in.toDF().toDF("query_id", "terms"), ckpt) { (res, _) =>
      got ++= res.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
      plans += res.queryExecution.executedPlan.toString
    }
    try {
      // uneven micro-batching: the per-query answer must not depend on
      // which trigger carried the query
      Seq(qs.take(2), qs.slice(2, 3), qs.drop(3)).foreach { b =>
        in.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()

    // comparand 1: the batch core over all queries at once
    val qt = qs.flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .toDF("query_id", "term").distinct()
    val want = PostingsIndex.bm25Batch(
        spark.read.parquet(s"$idx/postings"),
        spark.read.parquet(s"$idx/termstats"),
        spark.read.parquet(s"$idx/blockstats"),
        qt, k = 10, excludeSelf = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(got.sorted.toSeq === want.sorted.toSeq,
      "streamed serving diverged from the batch scorer")
    assert(got.nonEmpty)

    // comparand 2: the queryTerms query must reproduce the oracle-gated
    // bm25_indexed top-10 exactly (r order == the TakeOrdered order)
    val servedQ1 = got.filter(_._1 == 1L).sortBy(_._3)
      .map(r => (r._2, r._4)).toSeq
    val topk = PostingsIndex.query(spark, idx).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(servedQ1 === topk,
      "the queryTerms serving answer diverged from bm25_indexed")

    // every trigger's scan was term-pruned (a single-term batch pushes
    // EqualTo, a multi-term one pushes In)
    assert(plans.size === 3)
    plans.foreach(p => assert(
      p.contains("In(term") || p.contains("EqualTo(term,"),
      s"a trigger's postings scan lost the term pushdown:\n$p"))

    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(idx), spark.sparkContext.hadoopConfiguration)
    Seq(idx, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }
}
