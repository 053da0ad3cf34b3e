package graft
object HybridServeLegProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("ERROR")
    println("[leg] " + graft.streaming.StreamingBench.allPaths(spark, batches = 3, perBatch = 20000))
  }
}
