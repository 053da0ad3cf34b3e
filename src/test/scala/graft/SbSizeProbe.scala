package graft
import graft.operators.{PostingsIndex, Retrieval}
object SbSizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    spark.range(100000).selectExpr("sum(id)").collect()
    Seq(2, 5, 8).foreach { sb =>
      val idx = s"/tmp/graft_sbsize_${sb}_${dir.hashCode.toHexString}"
      if (!new java.io.File(s"$idx/meta").isDirectory)
        PostingsIndex.buildFrom(spark,
          graft.sources.Corpus.documents(spark, dir), idx, superBits = sb)
      val nSb = new java.io.File(s"$idx/postings").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("sb="))
      def time(f: => Int): Double = {
        val runs = (1 to 2).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
        spark.sharedState.cacheManager.clearCache(); runs.min
      }
      val t = time(PostingsIndex.query(spark, idx).collect().length)
      println(f"[sbsize] superBits=$sb nSb=$nSb indexed=$t%6.2f s  ($dir)")
    }
  }
}
