package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JVM, codegen, parquet reader init) so the first
    // timed query doesn't absorb several seconds of one-time setup.
    spark.range(100000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    // deterministic order: per-query numbers comparable across rounds;
    // SPARK_GRAFT_ONLY (comma-separated names) = local iteration filter
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    def runOnce(): Seq[(String, Double)] = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    // two passes, per-query min: the first run absorbs codegen/JIT/parquet
    // footer caching fixed costs, so the min is the steady-state number and
    // round-over-round deltas are signal, not first-run noise (BASELINE.md)
    val cold = runOnce()
    val warm = runOnce()
    val results = cold.zip(warm).map { case ((n, a), (_, b)) => n -> math.min(a, b) }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // streaming perf signal (skipped when SPARK_GRAFT_ONLY filters queries)
    val streaming = if (only.isEmpty) {
      val batches = 5
      val (events, sec) = graft.streaming.StreamingBench.fixedWindowThroughput(spark, batches = batches)
      val rate = events / sec
      s""","streaming":{"path":"ctr_fixed_window_update","events":$events,"batches":$batches,"sec":$sec,"events_per_sec":$rate}"""
    } else ""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$streaming,"sf":"$sfDir"}""")
    spark.stop()
  }
}
