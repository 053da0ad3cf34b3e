package graft

import org.apache.spark.sql.functions._

// Dev-only probe: the recall-vs-nCand curve of the composed IVF+PQ
// path. The exact re-rank makes returned sims true cosines, so recall
// against the brute-force top-k measures CANDIDATE-SELECTION loss only
// — the knob a deployment turns when the ADC ordering misses true
// neighbors inside the probed cells.
//   Test/runMain graft.IvfPqProbe [sfDir]
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val sf = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local("16")
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.sources.Corpus.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", sqrt(graft.functions.VectorFunctions.dot(col("v"), col("v"))))
      .localCheckpoint()
    val truth = graft.operators.Similarity.annBruteForceFrom(e)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.operators.Similarity.annIvfFrom(e)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"[probe] ivf-ceiling recall=${(ivf & truth).size.toDouble / truth.size}%.2f")
    Seq(5, 10, 20, 40, 60).foreach { c =>
      val got = graft.operators.Similarity.annIvfPqFromAt(e, c)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"[probe] nCand=$c%3d recall=${(got & truth).size.toDouble / truth.size}%.2f")
    }
    spark.stop()
  }
}
