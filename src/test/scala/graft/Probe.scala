package graft

// Dev-only stage profiler: sbt "Test/runMain graft.Probe <sfDir>"
import org.apache.spark.sql.SparkSession

object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
      r
    }

    import org.apache.spark.sql.functions._
    val docs = graft.sources.Corpus.documents(spark, dir)
    t("docs.count")(docs.count())
    val toks = graft.operators.TextAnalysis.tokensCol(col("text"))
    t("tokenize+explode")(docs.select(col("doc_id"), explode(toks).as("t")).count())
    t("minhash_signatures narrow")(graft.operators.Dedup.minhashSignatures(spark, dir).count())
    t("full minhash_lsh_pairs")(graft.operators.Dedup.minhashLshPairs(spark, dir).count())
    t("minhash again (warm)")(graft.operators.Dedup.minhashLshPairs(spark, dir).count())
    t("simhash_signatures")(graft.operators.Dedup.simhashSignatures(spark, dir).count())
    t("simhash_pairs")(graft.operators.Dedup.simhashPairs(spark, dir).count())
    spark.stop()
  }
}
