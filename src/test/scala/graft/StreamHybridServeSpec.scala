package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, PostingsIndex}
import graft.streaming.StreamHybridServe

/** Hybrid serving must answer exactly what the batch fusion kernel
  * answers — per query, independent of micro-batching — and every
  * trigger must keep BOTH prunes: the term pushdown on the postings
  * scan and dynamic partition pruning on the members scan.
  */
class StreamHybridServeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  test("served stream == batch fusion under uneven micro-batching; both prunes in every trigger") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val pidx = s"/tmp/graft_hybserve_p_${System.nanoTime()}"
    val vidx = s"/tmp/graft_hybserve_v_${System.nanoTime()}"
    val ckpt = s"/tmp/graft_hybserve_ckpt_${System.nanoTime()}"
    PostingsIndex.buildFrom(spark,
      sources.Corpus.documents(spark, sf).select(col("doc_id"), col("text")),
      pidx, superBits = 2)
    IvfIndex.build(spark, sf, vidx, nCells = 16)

    // query vectors from the corpus, term profiles over the vocabulary
    val qvs = sources.Corpus.embeddings(spark, sf)
      .where(col("vec_id") < 5)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val qs: Seq[(Long, Seq[String], Seq[Double])] = Seq(
      0L -> Seq("table", "part"), 1L -> Seq("data"),
      2L -> Seq("spark", "scan"), 3L -> Seq("window"),
      4L -> Seq("join", "table"))
      .map { case (id, ts) => (id, ts, qvs(id)) }

    val got = mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val plans = mutable.ArrayBuffer.empty[String]
    val in = MemoryStream[(Long, Seq[String], Seq[Double])]
    val q = StreamHybridServe.serve(spark, pidx, vidx,
      in.toDF().toDF("query_id", "terms", "qv"), ckpt) { (res, _) =>
      got ++= res.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      plans += res.queryExecution.executedPlan.toString
    }
    try {
      Seq(qs.take(1), qs.slice(1, 4), qs.drop(4)).foreach { b =>
        in.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()

    val want = StreamHybridServe.fuseOn(
        spark.read.parquet(s"$pidx/postings"),
        spark.read.parquet(s"$pidx/termstats"),
        spark.read.parquet(s"$pidx/blockstats"),
        spark.read.parquet(s"$vidx/centroids"),
        spark.read.parquet(s"$vidx/members"),
        qs.toDF("query_id", "terms", "qv"), legK = 10, k = 5, nProbe = 2)
      ._1.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.sorted.toSeq === want.sorted.toSeq,
      "streamed hybrid serving diverged from the batch fusion")
    assert(got.nonEmpty)

    assert(plans.size === 3)
    plans.foreach { p =>
      assert(p.contains("In(term") || p.contains("EqualTo(term,"),
        s"a trigger lost the lexical term pushdown:\n$p")
      assert(p.toLowerCase.contains("dynamicpruning"),
        s"a trigger lost dynamic partition pruning on the members scan:\n$p")
    }

    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(pidx), spark.sparkContext.hadoopConfiguration)
    Seq(pidx, vidx, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }
}
