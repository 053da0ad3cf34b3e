package graft

import graft.operators.Sketches

/** Honest-cost probe for the ANALYZE hash modes: noop-sink-evaluates
  * `tableStats` under md5 (oracle mode) and xxhash64 (fast mode) at the
  * given SF dir. Dev tool — run idle; BASELINE records the floor drop. */
object FastAnalyzeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("ERROR")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    spark.range(100000).selectExpr("sum(id)").collect() // JIT warm
    def time(mode: String): Double = {
      if (mode == "md5") spark.conf.unset(Sketches.hashModeKey)
      else spark.conf.set(Sketches.hashModeKey, mode)
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Sketches.tableStats(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.conf.unset(Sketches.hashModeKey)
      runs.min
    }
    val md5Sec = time("md5")
    val fastSec = time("xxhash64")
    println(f"[probe] table_stats md5=$md5Sec%.2f s  xxhash64=$fastSec%.2f s  " +
      f"speedup=${md5Sec / fastSec}%.2fx  sf_dir=$dir")
  }
}
