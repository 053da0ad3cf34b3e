package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.operators.Similarity

/** sf100-equivalent pricing for the highest-risk family (verdict r14
  * Next #8, stretch): embedding near-dups one decade PAST the sf10
  * campaign — 200 K vectors (the sf10 scale, where the r14 re-measure
  * landed 5.18 s) and 2 M vectors (10× further, the sf100-equivalent
  * corpus for this family alone; full-suite sf100 is out of sandbox
  * budget). Verifies the two scale laws the family rides:
  *
  *  - **(b, L) selection**: both scales sit past [[Similarity.bigNCut]]
  *    so the narrow entry takes (16, 4) and the wide entry's
  *    recall-target selection takes (16, 8) — the probe prints what was
  *    actually selected;
  *  - **candidate-volume law**: for random corpora candidates grow
  *    ~n²·L/2^bb per decade (100× at 10× n) while staying FAR below
  *    all-pairs (n²/2); the probe measures Σ C(cnt,2) over (band, key)
  *    buckets at both scales and prints measured-vs-predicted growth,
  *    plus wall time per entry — the numbers BASELINE's sf100 section
  *    quotes.
  *
  * The corpus is deterministic (xxhash64-seeded, zero-centered uniform
  * components) so the point is reproducible. Dev tool; run idle:
  *
  *   sbt "Test/runMain graft.Sf100EmbProbe"
  */
object Sf100EmbProbe {

  private def ensureCorpus(
      spark: org.apache.spark.sql.SparkSession, dir: String, n: Long): Unit = {
    val tbl = s"$dir/embeddings.parquet"
    if (!graft.operators.IndexFs.isDirectory(tbl)) {
      spark.range(0L, n, 1L, 64)
        .select(col("id").as("vec_id"),
          expr("transform(sequence(0, 63), d -> " +
            "cast(pmod(xxhash64(id, d), 2000001) - 1000000 as double) " +
            "/ 1000000.0)").as("embedding"))
        .write.mode("overwrite").parquet(tbl)
    }
  }

  /** Σ C(cnt, 2) over (band, key) buckets for the (bb, nBands) banding —
    * the exact-verify input volume, the family's cost driver. */
  private def candidateVolume(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      bb: Int, nBands: Int): Long = {
    val mask = -1L >>> (64 - bb)
    val perWord = 64 / bb
    val wide = bb * nBands > 64
    val planes0 = VectorFunctions.planesRange(0, math.min(64, bb * nBands))
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val sig =
      if (!wide)
        e.select(VectorFunctions.hyperplaneSig(col("v"), planes0).as("s0"),
          lit(0L).as("s1"))
      else e.select(
        VectorFunctions.hyperplaneSig(col("v"), planes0).as("s0"),
        VectorFunctions.hyperplaneSig(col("v"),
          VectorFunctions.planesRange(64, bb * nBands)).as("s1"))
    val keyed = sig.select(posexplode(array((0 until nBands).map { b =>
      shiftright(if (b < perWord) col("s0") else col("s1"),
        bb * (b % perWord)).bitwiseAND(lit(mask))
    }: _*)).as(Seq("band", "key")))
    keyed.groupBy("band", "key").count()
      .agg(coalesce(sum(col("count") * (col("count") - 1)), lit(0L)))
      .collect()(0).getLong(0) / 2
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("32")
    spark.sparkContext.setLogLevel("ERROR")
    val base = args.headOption.getOrElse("/tmp/graft_sf100emb")
    val results = for (n <- Seq(200000L, 2000000L)) yield {
      val dir = s"$base/n$n"
      ensureCorpus(spark, dir, n)
      // what the self-sized entries select at this n
      val wp = Similarity.wideParams(n, 0.9)
      println(s"[sf100emb] n=$n narrow=(16,4) wide=$wp " +
        s"(bigNCut=${Similarity.bigNCut})")
      def time(label: String)(f: => Long): (Double, Long) = {
        val t0 = System.nanoTime(); val out = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[sf100emb] n=$n $label%-10s $sec%8.2f s  out=$out")
        (sec, out)
      }
      val (narrowSec, _) =
        time("narrow")(Similarity.embeddingNearDups(spark, dir).count())
      val (wideSec, _) =
        time("wide")(Similarity.embeddingNearDupsWide(spark, dir).count())
      val candNarrow = candidateVolume(spark, dir, 16, 4)
      val candWide = candidateVolume(spark, dir, wp._1, wp._2)
      println(s"[sf100emb] n=$n candidates narrow(16,4)=$candNarrow " +
        s"wide$wp=$candWide allPairs=${n * (n - 1) / 2}")
      (n, narrowSec, wideSec, candNarrow, candWide)
    }
    val Seq((n1, ns1, ws1, cn1, cw1), (n2, ns2, ws2, cn2, cw2)) = results
    val decade = (n2.toDouble / n1) * (n2.toDouble / n1)
    println(f"[sf100emb] growth over ${n2 / n1}x vectors: predicted " +
      f"candidate x$decade%.0f; measured narrow x${cn2.toDouble / cn1}%.1f " +
      f"wide x${cw2.toDouble / cw1}%.1f; wall narrow x${ns2 / ns1}%.1f " +
      f"wide x${ws2 / ws1}%.1f")
    spark.stop()
  }
}
