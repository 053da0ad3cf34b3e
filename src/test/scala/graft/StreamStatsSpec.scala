package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Sketches
import graft.streaming.StreamStats

/** At-ingestion ANALYZE: the stream's final per-column stats row must
  * equal the batch mergeable stats over everything streamed, under
  * arbitrary micro-batching — registers, counts, and bounds all fold
  * associatively, and the shared Catalyst bucket/rho/estimator
  * expressions leave nothing to drift.
  */
class StreamStatsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  private val statsCols =
    Seq("l_orderkey", "l_suppkey", "l_linestatus", "l_returnflag", "l_shipdate")

  test("final streamed stats row per column == batch stats, uneven batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val li = graft.sources.Corpus.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_suppkey"),
        col("l_linestatus"), col("l_returnflag"),
        col("l_shipdate").cast("string").as("l_shipdate"))
    val rows = li.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3),
        r.getString(4))).toSeq
    val in = MemoryStream[(Long, Long, String, String, String)]
    val q = StreamStats.stats(spark, in.toDF().toDF(statsCols: _*))
      .writeStream.format("memory").queryName("ss_out")
      .outputMode("update").start()
    try {
      val (b1, rest) = rows.splitAt(rows.length / 4)
      val (b2, b3) = rest.splitAt(rest.length / 2)
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.table("ss_out").collect()
        .map(r => r.getString(0) -> r.toSeq.drop(1).map(String.valueOf))
        .foldLeft(Map.empty[String, Seq[String]])(_ + _) // latest wins
      // batch twin over the SAME rows, including the string-cast shipdate
      val want = {
        // stats over the full table; shipdate is a date in the corpus
        // and a string in the stream — both stringify identically (ISO)
        val full = Sketches.tableStats(spark, sf)
          .select(col("col_name"), col("n_rows"), col("n_nulls"),
            col("ndv_est"), col("min_num"), col("max_num"),
            col("min_str"), col("max_str"))
          .collect()
          .map(r => r.getString(0) -> r.toSeq.drop(1).map(String.valueOf))
          .toMap
        full
      }
      assert(streamed.keySet === want.keySet)
      streamed.foreach { case (c, got) =>
        assert(got === want(c), s"column $c diverged: $got vs ${want(c)}")
      }
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ss_out")
    }
  }
}
