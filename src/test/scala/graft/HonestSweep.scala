package graft
/** One-pass collect()-timed sweep of every query — surfaces operators
  * whose Bench count() number is count-pruning fiction (the r11 stats
  * finding). Dev tool; compare against the artifact's min-of-2 counts
  * and chase ratios, not absolutes. */
object HonestSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    spark.range(100000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/region.parquet").count()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val r = scala.util.Try(fn(spark, dir).collect().length)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[sweep] $name%-28s $sec%8.2f s  rows=${r.getOrElse(-1)}")
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
