package graft

import org.apache.spark.sql.functions._

/** Dev-only decomposition of hybrid_rrf_indexed's latency: times each leg
  * (MLT postings leg, IVF vector leg, fusion) in isolation so a composed
  * regression can be attributed. Not part of the shipped library. */
object ProfileHybrid {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("32")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val pidx = time("ensure_postings") {
        operators.PostingsIndex.ensureLifecycleIndex(spark, dir)
      }
      val vidx = time("ensure_ivf") {
        operators.IvfIndex.ensureLifecycleIndex(spark, dir)
      }
      val qt = sources.Corpus.documents(spark, dir)
        .where(col("doc_id") < 10)
        .select(col("doc_id").as("query_id"),
          explode(operators.TextAnalysis.tokensCol(col("text"))).as("term"))
        .where(length(col("term")) > 0)
        .distinct()
      val qtRows = time("mlt_qt_collect") {
        qt.select(col("query_id"), col("term")).collect()
      }
      time("mlt_df_lookup") {
        val allTerms = qtRows.map(_.getString(1)).distinct.toSeq
        spark.read.parquet(s"$pidx/termstats")
          .where(col("term").isin(allTerms: _*))
          .groupBy(col("term")).agg(sum(col("df_sb")).as("df"))
          .collect()
      }
      time("mlt_leg") {
        noop(operators.PostingsIndex.bm25MoreLikeThis(spark, pidx, qt, 20))
      }
      val qb = sources.Corpus.embeddings(spark, dir)
        .where(col("vec_id") < 10)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      time("ivf_leg") {
        noop(operators.IvfIndex.query(spark, vidx, qb, nProbe = 2, k = 20))
      }
      time("full_hybrid_indexed") {
        noop(operators.Retrieval.hybridRrfIndexed(spark, dir))
      }
      time("full_hybrid_scanned") {
        noop(operators.Retrieval.hybridRrfScanned(spark, dir))
      }
    }
    spark.stop()
  }
}
