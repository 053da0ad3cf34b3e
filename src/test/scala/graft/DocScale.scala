package graft

// Dev-only scale-trajectory timing for the round-5 document operators —
//   sbt "Test/runMain graft.DocScale /tmp/graft-scale/sf3x"
// Times each query min-of-2 (same steady-state convention as graft.Bench)
// on a documents-only corpus dir (ScaleGen output or a real sf dir) and
// prints one line per query. Dev tool; the shipped bench is graft.Bench.
object DocScale {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    val ops: Seq[(String, () => Long)] = Seq(
      "dup_gram_fraction" -> (() => graft.operators.Dedup.dupGramFraction(spark, dir).count()),
      "contamination_bloom" -> (() => graft.operators.Dedup.contaminationBloom(spark, dir).count()),
      "heavy_hitters" -> (() => graft.operators.Sketches.heavyHitters(spark, dir).count()),
      "bm25_topk" -> (() => graft.operators.Retrieval.bm25Topk(spark, dir).count()),
      "bpe_merges" -> (() => graft.operators.TextAnalysis.bpeMerges(spark, dir).count()),
      "ann_pq" -> (() => graft.operators.Similarity.annPq(spark, dir).count()),
      "embedding_outliers" -> (() => graft.operators.Similarity.embeddingOutliers(spark, dir).count()),
      // the DEFAULT (self-sizing bitsPerBand) entry — the r6 done-criterion
      // is this row staying <=2x between 1x and 10x corpora
      "embedding_near_dups" -> (() => graft.operators.Similarity.embeddingNearDups(spark, dir).count()))

    ops.foreach { case (name, run) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }
      val sec = math.min(once(), once())
      println(f"[docscale] $name%-20s $sec%8.2f s  ($dir)")
    }
    spark.stop()
  }
}
