package graft

// Dev-only: star-contraction at graph sizes the corpus never produces —
//   sbt "Test/runMain graft.CcScale 1000000"
// Builds a deterministic random graph (~n edges over ~2n nodes: mostly
// small components) PLUS a 1024-node path (worst-case diameter, forcing
// real multi-round contraction), runs Dedup.starContract, and relies on
// the operator's own built-in proof (it THROWS on any wrong label), then
// cross-checks the path component explicitly.
import org.apache.spark.sql.functions._

object CcScale {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nNodes = nEdges * 2
    // deterministic pseudo-random endpoints from murmur3 hash (no
    // Math.random); pmod, not abs(..)%n — abs(Int.MinValue) overflows
    // under ANSI mode. Canonical (src > dst), self-loops dropped.
    val rand = spark.range(nEdges).select(
        pmod(hash(col("id"), lit(1)).cast("long"), lit(nNodes)).as("a"),
        pmod(hash(col("id"), lit(2)).cast("long"), lit(nNodes)).as("b"))
      .where(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("src"),
        least(col("a"), col("b")).as("dst"))
    // the adversarial component: a 1024-node path in a disjoint id range
    val base = nNodes + 10
    val path = spark.range(1023).select(
      (col("id") + base + 1).as("src"), (col("id") + base).as("dst"))
    val edges0 = rand.union(path).distinct().localCheckpoint()
    val m = edges0.count()

    val t0 = System.nanoTime()
    val labels = graft.operators.Dedup.starContract(spark, edges0)
    val nLabels = labels.count() // starContract already threw if wrong
    val sec = (System.nanoTime() - t0) / 1e9
    // the path component must have collapsed to its minimum
    val pathLabels = labels.where(col("doc_id") >= base)
      .select(countDistinct(col("label")).as("d"), min(col("label")).as("mn"))
      .head()
    assert(pathLabels.getLong(0) == 1 && pathLabels.getLong(1) == base,
      s"path component mislabeled: $pathLabels")
    println(f"[ccscale] $m edges -> $nLabels labeled nodes in $sec%.2f s " +
      "(round count on stderr; labels proven by the operator's own check)")
    spark.stop()
  }
}
