package graft

// Dev-only 10× corpus generator for scale-trajectory runs:
//   sbt "Test/runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/graft-scale/sf10x 10"
//
// Replicas must be CONTENT-DISTINCT or the pair-generating operators
// (minhash/simhash/winnow/embedding near-dups) would see every document
// with R-1 exact twins and the candidate volume would grow quadratically
// in R — measuring that would say nothing about corpus growth. So:
// - documents: replica k > 0 suffixes every token with k (all shingles,
//   k-grams and fingerprints change; token/char counts stay comparable),
//   preserving the ORIGINAL's intra-replica near-dup structure exactly.
// - embeddings: replica k cyclically shifts the vector by k dimensions —
//   norms and intra-replica cosines are preserved exactly, cross-replica
//   cosines drop to noise.
import org.apache.spark.sql.functions._

object ScaleGen {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft-scale/sf10x")
    val reps = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val docsOut = (0 until reps).map { k =>
      val text =
        if (k == 0) col("text")
        else regexp_replace(col("text"), "(\\S+)", "$1" + k.toString)
      docs.select(
        (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
        text.as("text"), col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    docsOut.repartition(32).write.mode("overwrite")
      .parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val dims = emb.select(size(col("embedding"))).head().getInt(0)
    val embOut = (0 until reps).map { k =>
      val shifted =
        if (k == 0) col("embedding")
        else concat(
          slice(col("embedding"), k + 1, dims - k),
          slice(col("embedding"), 1, k))
      emb.select(
        (col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        shifted.as("embedding"), col("label"))
    }.reduce(_ unionByName _)
    embOut.repartition(32).write.mode("overwrite")
      .parquet(s"$out/embeddings.parquet")

    println(s"[scalegen] wrote ${reps}x corpus to $out: " +
      s"${spark.read.parquet(s"$out/documents.parquet").count()} docs, " +
      s"${spark.read.parquet(s"$out/embeddings.parquet").count()} vectors")
    spark.stop()
  }
}
