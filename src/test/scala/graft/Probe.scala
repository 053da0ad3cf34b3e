package graft

// Dev-only stage profiler: sbt "Test/runMain graft.Probe <sfDir>"
// Phase-replicates Dedup.minhashLshPairsImpl using the OPERATOR'S OWN
// constants and kernels (no hard-coded copies to drift from).
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    import org.apache.spark.sql.functions._
    import graft.operators.Dedup

    t("warm docs.count")(graft.sources.Corpus.documents(spark, dir).count())
    // two passes, pass 2 = steady state
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val sigs = t(s"p$pass sigs checkpoint") {
        Dedup.minhashPerDoc(spark, dir)
          .toDF("doc_id", "mh", "n_shingles").localCheckpoint()
      }
      val nBands = Dedup.numMinhash / Dedup.bandSize
      val keyCols = (0 until nBands).map { b =>
        concat_ws("|",
          (0 until Dedup.bandSize).map(j => col("mh")(b * Dedup.bandSize + j)): _*)
      }
      val bands = sigs.select(col("doc_id"), array(keyCols: _*).as("keys"))
        .select(col("doc_id"), col("keys"),
          posexplode(col("keys")).as(Seq("band", "key")))
      val firstBand = coalesce(
        (0 until nBands).map(b =>
          when(col("l.keys")(b) === col("r.keys")(b), lit(b))): _*)
      val candidates = t(s"p$pass candidates ckpt") {
        bands.as("l").join(bands.as("r"),
            col("l.band") === col("r.band") && col("l.key") === col("r.key") &&
            col("l.doc_id") < col("r.doc_id"))
          .where(col("l.band") === firstBand)
          .select(col("l.doc_id").as("doc_a"), col("r.doc_id").as("doc_b"))
          .localCheckpoint()
      }
      t(s"p$pass full pairs count")(Dedup.minhashLshPairs(spark, dir).count())
      t(s"p$pass dedup_clusters full")(Dedup.dedupClusters(spark, dir).count())
      org.apache.spark.sql.graft.Bridge.releaseCheckpoint(sigs)
      org.apache.spark.sql.graft.Bridge.releaseCheckpoint(candidates)
    }
    spark.stop()
  }
}
