package graft
import graft.operators.{PostingsIndex, Retrieval, Router}
object Bm25CrossoverProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1", "/root/repo/testdata/sf1")
    spark.range(100000).selectExpr("sum(id)").collect()
    dirs.foreach { dir =>
      val pidx = PostingsIndex.ensureLifecycleIndex(spark, dir)
      def time(f: => Int): Double = {
        val runs = (1 to 2).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
        spark.sharedState.cacheManager.clearCache(); runs.min
      }
      val scan = time(Retrieval.bm25Topk(spark, dir).collect().length)
      val idx = time(PostingsIndex.query(spark, pidx).collect().length)
      val tl = Router.totalLenOf(spark, pidx)
      val df = Router.sumDfOf(spark, pidx, Retrieval.queryTerms)
      println(f"[bm25x] $dir%-30s scan=$scan%6.2f s  indexed=$idx%6.2f s  totalLen=$tl  sumDf=$df")
    }
  }
}
