package graft

import graft.operators.{IvfIndex, PostingsIndex, Retrieval, Router}

/** The measured hybrid crossover (round-11 verdict, What's-wrong #2):
  * times the SEMANTICS-IDENTICAL pair — [[Retrieval.hybridRrfIndexed]]
  * vs [[Retrieval.hybridRrfScanned]] — per corpus dir, collect-timed
  * min-of-2, plus the [[Router.decideHybrid]] choice the stats would
  * make there, so the cost model is validated against the measured
  * winner point by point. Index build time is printed separately (it is
  * the amortized pre-paid pass, not per-query cost). Dev tool; run idle.
  *
  *   sbt "Test/runMain graft.HybridCrossoverProbe <dir> [<dir> ...]"
  */
object HybridCrossoverProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("ERROR")
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1",
        "/root/repo/testdata/sf1")
    spark.range(100000).selectExpr("sum(id)").collect() // JIT warm
    dirs.foreach { dir =>
      val tb0 = System.nanoTime()
      val pidx = PostingsIndex.ensureLifecycleIndex(spark, dir)
      val vidx = IvfIndex.ensureLifecycleIndex(spark, dir)
      val buildSec = (System.nanoTime() - tb0) / 1e9
      def time(f: => Int): Double = {
        val runs = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          f
          (System.nanoTime() - t0) / 1e9
        }
        spark.sharedState.cacheManager.clearCache()
        runs.min
      }
      val scanned = time(Retrieval.hybridRrfScanned(spark, dir).collect().length)
      val indexed = time(Retrieval.hybridRrfIndexed(spark, dir).collect().length)
      val (totalLen, nSb, _) = Router.postingsMetaOf(spark, pidx)
      val choice = Router.decideHybrid(totalLen, nSb)
      val winner = if (indexed < scanned) "indexed" else "scanned"
      println(f"[xover] $dir%-34s scanned=$scanned%6.2f s  indexed=$indexed%6.2f s" +
        f"  measured-winner=$winner%-7s router=${choice.leg}%-7s" +
        f"  (${choice.reason}; ensure=$buildSec%.1f s)")
    }
  }
}
