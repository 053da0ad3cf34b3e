package graft
import org.apache.spark.sql.SparkSession
object NanosProbe {
  def main(args: Array[String]): Unit = {
    // simulate the driver's session: NO nanosAsLong at build time
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = graft.SparkEntry.entry(spark)
      println("[nanos-probe] entry rows = " + df.count())
    } catch { case e: Throwable => println("[nanos-probe] FAILED: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
