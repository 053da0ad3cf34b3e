package graft

import org.apache.spark.sql.functions._

/** r16 measurement probe: where do link_pagerank's seconds go?
  * Times each phase of the operator's exact shape separately (e0
  * checkpoint, adj checkpoint, the 3-round iteration DAG) on a warm
  * session, two passes. Throwaway evidence tool, not a spec. */
object PagerankPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.sparkContext.setLogLevel("WARN")
    import graft.Materialize.MaterializeOps
    import graft.sources.Corpus
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prphase] $label%-12s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"[prphase] pass $pass")
      val e0 = t("e0_ckpt") {
        Corpus.table(s, sfDir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Corpus.table(s, sfDir, "lineitem")
            .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
          .graftCheckpoint()
      }
      val edges = e0.select(explode(array(
          struct(col("src"), col("dst")),
          struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val adj = t("adj_ckpt") { edges.join(deg, Seq("src")).graftCheckpoint() }
      var pr = adj.select(col("src").as("node")).distinct()
        .select(col("node"), lit(1000000L).as("score"))
      for (_ <- 1 to 3) {
        pr = adj.join(pr, col("src") === col("node"))
          .select(col("dst"), expr("score div deg").as("contrib"))
          .groupBy(col("dst"))
          .agg(expr(s"150000 + (85 * sum(contrib)) div 100").as("score"))
          .select(col("dst").as("node"), col("score"))
      }
      t("rounds_noop") {
        pr.write.format("noop").mode("overwrite").save()
      }
      Seq(e0, adj).foreach(org.apache.spark.sql.graft.Bridge.releaseCheckpoint)
    }
    s.stop()
  }
}
