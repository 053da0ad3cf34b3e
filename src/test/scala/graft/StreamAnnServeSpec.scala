package graft

import scala.collection.mutable

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex
import graft.streaming.StreamAnnServe

/** Streaming ANN serving must answer exactly what the batch index query
  * answers — per query, independent of how queries are micro-batched —
  * and every trigger's members scan must carry the dynamic-pruning
  * partition filter (the whole point of running the batch planner per
  * trigger; see the operator's scaladoc).
  */
class StreamAnnServeSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  test("served stream == batch index query under uneven micro-batching; every trigger DPP-pruned") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val idx = s"/tmp/graft_annserve_${System.nanoTime()}"
    val ckpt = s"/tmp/graft_annserve_ckpt_${System.nanoTime()}"
    IvfIndex.build(spark, sf, idx, nCells = 16)

    val queries = sources.Corpus.embeddings(spark, sf)
      .where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
    val all = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).toSeq

    val got = mutable.ArrayBuffer.empty[(Long, Long, Long, Double)]
    val plans = mutable.ArrayBuffer.empty[String]
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamAnnServe.serve(spark, idx,
      in.toDF().toDF("query_id", "qv"), ckpt) { (res, _) =>
      val rows = res.collect()
      got ++= rows.map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      plans += res.queryExecution.executedPlan.toString
    }
    try {
      // uneven micro-batching: the per-query answer must not depend on
      // which trigger carried the query
      Seq(all.take(4), all.slice(4, 5), all.drop(5)).foreach { b =>
        in.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()

    val want = IvfIndex.query(spark, idx, queries).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.sorted.toSeq === want.sorted.toSeq,
      "streamed serving diverged from the batch index query")
    assert(got.nonEmpty)

    assert(plans.size === 3)
    plans.foreach(p => assert(p.toLowerCase.contains("dynamicpruning"),
      s"a trigger's members scan lost dynamic partition pruning:\n$p"))

    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(idx), spark.sparkContext.hadoopConfiguration)
    Seq(idx, ckpt).foreach(p =>
      fs.delete(new org.apache.hadoop.fs.Path(p), true))
  }
}
