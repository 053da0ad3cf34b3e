package graft

// Dev-only: tiny-config smoke of StreamingBench.allPaths JSON shape
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("WARN")
    val j = graft.streaming.StreamingBench.allPaths(spark, batches = 2, perBatch = 2000)
    println(s"[smoke] $j")
    spark.stop()
  }
}
