package graft

import org.apache.spark.sql.functions._

/** r16 measurement probe: wandSelect's internal phases (ts checkpoint,
  * per-sb bound collect, bootstrap scoring collect) — replicated here
  * verbatim so each driver round-trip is timed separately. */
object WandPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.sparkContext.setLogLevel("WARN")
    import graft.Materialize.MaterializeOps
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[wdphase] $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val indexDir = t("ensure") {
      graft.operators.PostingsIndex.ensureLifecycleIndex(s, sfDir)
    }
    val terms = graft.operators.Retrieval.queryTerms
    (1 to 2).foreach { pass =>
      println(s"[wdphase] pass $pass")
      val ts = t("ts_ckpt") {
        s.read.parquet(s"$indexDir/termstats")
          .where(col("term").isin(terms: _*))
          .graftCheckpoint()
      }
      val perSb = t("persb_collect") {
        val dfT = ts.groupBy(col("term")).agg(sum(col("df_sb")).as("df"))
        ts.join(broadcast(dfT), Seq("term"))
          .crossJoin(broadcast(
            s.read.parquet(s"$indexDir/blockstats")
              .agg(sum(col("n_docs")).as("n_docs"),
                sum(col("total_len")).as("total_len"))))
          .select(col("sb"), col("df_sb"),
            graft.operators.Retrieval.qScoreCol(col("max_tf"), col("min_dl")).as("ubq"))
          .groupBy(col("sb"))
          .agg(sum(col("ubq")).as("ub"), max(col("df_sb")).as("min_docs"))
          .collect()
      }
      println(s"[wdphase] perSb rows = ${perSb.length}")
      org.apache.spark.sql.graft.Bridge.releaseCheckpoint(ts)
      val boot = perSb.map(_.getInt(0)).take(4).map(Integer.valueOf).toSeq
      t("boot_score") {
        val dfT = s.read.parquet(s"$indexDir/termstats")
          .where(col("term").isin(terms: _*))
          .groupBy(col("term")).agg(sum(col("df_sb")).as("df"))
          .select(col("term").as("token"), col("df"))
        val tf = s.read.parquet(s"$indexDir/postings")
          .where(col("sb").isin(boot: _*) && col("term").isin(terms: _*))
          .select(col("term").as("token"), explode(col("plist")).as("e"))
          .select(col("e.doc_id").as("doc_id"), col("e.dl").as("dl"),
            col("token"), col("e.tf").as("tf"))
        val stats = s.read.parquet(s"$indexDir/blockstats")
          .agg(sum(col("n_docs")).as("n_docs"), sum(col("total_len")).as("total_len"))
        graft.operators.Retrieval.bm25ScoreWith(tf, stats, dfT, 10).collect()
      }
    }
    s.stop()
  }
}
