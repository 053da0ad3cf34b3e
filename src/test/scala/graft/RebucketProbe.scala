package graft
import graft.operators.{PostingsIndex, Router}
object RebucketProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    spark.range(100000).selectExpr("sum(id)").collect()
    val src = PostingsIndex.ensureLifecycleIndex(spark, dir)
    val idx = s"/tmp/graft_rebucket_probe_${dir.hashCode.toHexString}"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(idx), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
    org.apache.hadoop.fs.FileUtil.copy(fs, new org.apache.hadoop.fs.Path(src),
      fs, new org.apache.hadoop.fs.Path(idx), false, spark.sparkContext.hadoopConfiguration)
    def time(f: => Int): Double = {
      val runs = (1 to 2).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }
      spark.sharedState.cacheManager.clearCache(); runs.min
    }
    val want = PostingsIndex.query(spark, idx).collect().map(_.toString).toSeq
    val tBefore = time(PostingsIndex.query(spark, idx).collect().length)
    val t0 = System.nanoTime()
    val (b, a) = PostingsIndex.rebucket(spark, idx, newSuperBits = 8)
    val rebSec = (System.nanoTime()-t0)/1e9
    val tAfter = time(PostingsIndex.query(spark, idx).collect().length)
    val same = PostingsIndex.query(spark, idx).collect().map(_.toString).toSeq == want
    println(f"[rebucket] $dir sbs=$b->$a rewrite=$rebSec%.1f s  query $tBefore%.2f -> $tAfter%.2f s  answers-equal=$same")
  }
}
