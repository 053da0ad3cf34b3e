package graft

// Dev-only: embedding_near_dups (b, L) scaling demonstration at 10x —
// wider band keys restore near-linear candidate volume on a larger corpus.
object EmbScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft-scale/sf10x")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    for (bits <- Seq(2, 4); pass <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.operators.Similarity.embeddingNearDups(spark, dir, bits).count()
      println(f"[embscale] bits=$bits pass=$pass ${(System.nanoTime() - t0) / 1e9}%.2f s pairs=$n")
    }
    spark.stop()
  }
}
