package graft

// Dev-only stage profiler: sbt "Test/runMain graft.Probe <sfDir>"
import org.apache.spark.sql.{DataFrame, SparkSession}

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

    t("warm docs.count")(graft.sources.Corpus.documents(spark, dir).count())
    // phase replication of Dedup.minhashLshPairs; two passes, pass 2 = steady
    for (pass <- 1 to 2) {
      println(s"--- pass $pass ---")
      val sigs = t(s"p$pass sigs checkpoint") {
        graft.operators.Dedup.minhashPerDoc(spark, dir)
          .toDF("doc_id", "mh", "n_shingles").localCheckpoint()
      }
      val sizes = sigs.select(col("doc_id"), col("n_shingles"))
      val nBands = 4; val bandSize = 2
      val keyCols = (0 until nBands).map { b =>
        concat_ws("|", (0 until bandSize).map(j => col("mh")(b * bandSize + j)): _*)
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
      val docsInPlay = candidates.select(col("doc_a").as("doc_id"))
        .union(candidates.select(col("doc_b").as("doc_id"))).distinct()
      val candDocs = graft.sources.Corpus.documents(spark, dir)
        .join(broadcast(docsInPlay), Seq("doc_id"), "left_semi")
      val shc = t(s"p$pass shingle ckpt") {
        candDocs.select(col("doc_id"), col("text")).as[(Long, String)](
          org.apache.spark.sql.Encoders.product[(Long, String)])
          .flatMap { case (id, text) =>
            val toks = text.trim.toLowerCase(java.util.Locale.ROOT)
              .replaceAll("\\s+", " ").split(' ')
            val it = if (toks.length >= 3) toks.sliding(3).map(_.mkString(" "))
                     else Iterator(toks.mkString(" "))
            it.toSet[String].iterator.map((sh: String) => (id, sh))
          }(org.apache.spark.sql.Encoders.product[(Long, String)])
          .toDF("doc_id", "shingle").localCheckpoint()
      }
      t(s"p$pass jaccard+count") {
        val inter = broadcast(candidates)
          .join(shc.as("sa"), col("doc_a") === col("sa.doc_id"))
          .join(shc.as("sb"),
            col("doc_b") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("n_inter"))
        inter
          .join(sizes.as("za"), col("doc_a") === col("za.doc_id"))
          .join(sizes.as("zb"), col("doc_b") === col("zb.doc_id"))
          .select(col("doc_a"), col("doc_b"),
            (col("n_inter").cast("double") /
             (col("za.n_shingles") + col("zb.n_shingles") - col("n_inter")).cast("double"))
              .as("jaccard"))
          .where(col("jaccard") >= 0.5)
          .count()
      }
      t(s"p$pass dedup_clusters full")(
        graft.operators.Dedup.dedupClusters(spark, dir).count())
    }
    spark.stop()
  }
}
