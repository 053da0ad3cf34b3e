package graft

import org.apache.spark.sql.functions._

/** r16 measurement probe: where do hybrid_rrf_indexed's seconds go?
  * Times construction (the two driver collects inside bm25MoreLikeThis +
  * the IVF probe construction) vs the fused execution job. */
object HybridPhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    s.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[hyphase] $label%-14s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"[hyphase] pass $pass")
      val df = t("construct") {
        graft.operators.Retrieval.hybridRrfIndexed(s, sfDir)
      }
      t("execute_noop") {
        df.write.format("noop").mode("overwrite").save()
      }
      // and the scanned twin
      val df2 = t("construct_scan") {
        graft.operators.Retrieval.hybridRrfScanned(s, sfDir)
      }
      t("execute_scan") {
        df2.write.format("noop").mode("overwrite").save()
      }
      val df3 = t("construct_wand") {
        graft.operators.PostingsIndex.bm25Wand(s, sfDir)
      }
      t("execute_wand") {
        df3.write.format("noop").mode("overwrite").save()
      }
    }
    s.stop()
  }
}
