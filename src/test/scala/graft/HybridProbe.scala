package graft
import org.apache.spark.sql.functions._
import graft.operators.{IvfIndex, PostingsIndex, Retrieval, TextAnalysis}
import graft.sources.Corpus
object HybridProbe {
  def t[A](tag: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $tag%-30s ${(System.nanoTime()-t0)/1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/region.parquet").count()
    val pidx = PostingsIndex.ensureLifecycleIndex(spark, dir)
    import spark.implicits._
    val qt = Corpus.documents(spark, dir).where(col("doc_id") < 10)
      .select(col("doc_id").as("query_id"),
        explode(TextAnalysis.tokensCol(col("text"))).as("term"))
      .where(length(col("term")) > 0).distinct()
    val profRows = qt.collect().map(r => (r.getLong(0), r.getString(1)))
    val allTerms = profRows.map(_._2).distinct.toSeq
    val dfByTerm = spark.read.parquet(s"$pidx/termstats")
      .where(col("term").isin(allTerms: _*))
      .groupBy(col("term")).agg(sum(col("df_sb")).as("df"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val selected = profRows.filter(p => dfByTerm.contains(p._2)).groupBy(_._1).toSeq
      .flatMap { case (q, ps) => ps.map(_._2).distinct.sortBy(t => (dfByTerm(t), t)).take(25).map(t => (q, t)) }
    val selTerms = selected.map(_._2).distinct
    println(s"[probe] profile: ${allTerms.size} terms -> ${selTerms.size} selected")
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      t("postings scan selected terms")(
        spark.read.parquet(s"$pidx/postings").where(col("term").isin(selTerms: _*))
          .select(col("term"), explode(col("plist")).as("e")).count())
      t("postings scan no filter")(
        spark.read.parquet(s"$pidx/postings").select(col("term")).count())
      t("blockstats agg")(
        spark.read.parquet(s"$pidx/blockstats")
          .agg(sum(col("n_docs")), sum(col("total_len"))).collect().length)
      t("lexical full")(PostingsIndex.bm25MoreLikeThis(spark, pidx, qt, 10).count())
    }
  }
}
