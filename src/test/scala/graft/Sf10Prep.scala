package graft

/** Put the sf10 lifecycle indexes into their maintained state before the
  * post-fix full-suite bench (round-14 verdict Next #4): ensure both
  * exist, run plain threshold maintenance on each, print the layout.
  * Dev tool.
  *
  *   sbt "Test/runMain graft.Sf10Prep [corpusDir]"
  */
object Sf10Prep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("testdata/sf10")
    val spark = GraftSession.local("32")
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators._
    val pidx = PostingsIndex.ensureLifecycleIndex(spark, dir)
    val vidx = IvfIndex.ensureLifecycleIndex(spark, dir)
    Router.advise(spark, dir).foreach(a => println(s"PREP advise ${a.render}"))
    val pa = PostingsIndex.maintain(spark, pidx)
    println(s"PREP postings maintain: ${if (pa.isEmpty) "healthy" else pa.mkString("; ")}")
    val va = IvfIndex.maintain(spark, vidx)
    println(s"PREP ivf maintain: ${if (va.isEmpty) "healthy" else va.mkString("; ")}")
    println(s"PREP postings sbs=${spark.read.parquet(s"$pidx/blockstats").count()} " +
      s"superBits=${spark.read.parquet(s"$pidx/meta").collect().head.getLong(0)}")
    println(s"PREP ivf cells=${IvfIndex.standingCells(vidx)}")
    spark.stop()
  }
}
