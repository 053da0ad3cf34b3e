package graft

// Dev probe: apply BandedRangeJoinRule manually and print which node is
// unresolved. Not a test; run with Test/runMain graft.RuleProbe.
object RuleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val points = (0L until 20L).map(i => (i, i * 7 % 50)).toDF("pid", "v")
    val ranges = (0L until 10L).map(i => (1000L + i, i * 11 % 48, i * 11 % 48 + 4)).toDF("rid", "s", "e")
    val df = points.join(ranges, col("s") <= col("v") && col("v") < col("e"))
    spark.conf.set("spark.graft.rangeJoin.bandWidth", "4")
    val analyzed = df.queryExecution.analyzed
    val rule = new graft.plans.BandedRangeJoinRule
    val out = rule(analyzed)
    println("== rewritten ==")
    println(out.treeString)
    out.foreach { n =>
      if (!n.resolved) {
        println(s"UNRESOLVED NODE: ${n.getClass.getSimpleName}")
        println(n.toString.take(500))
        n.expressions.foreach { e =>
          e.foreach { sub =>
            if (!sub.resolved) println(s"  unresolved expr: ${sub.getClass.getSimpleName}: ${sub.toString.take(200)}")
          }
        }
      }
    }
    spark.stop()
  }
}
