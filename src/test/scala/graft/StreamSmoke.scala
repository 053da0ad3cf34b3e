package graft

// Dev-only: StreamingBench.allPaths JSON at a chosen size —
//   Test/runMain graft.StreamSmoke [batches] [perBatch] [cpus]
// defaults to the tiny shape-smoke config (2 x 2000).
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(2)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = GraftSession.local(args.lift(2).getOrElse("4"))
    spark.sparkContext.setLogLevel("WARN")
    val j = graft.streaming.StreamingBench.allPaths(spark, batches, perBatch)
    println(s"[smoke] $j")
    spark.stop()
  }
}
