package graft

import graft.streaming.{StreamStats, StreamingBench}

/** Throughput probe for the `stats` leg: same generator, standalone. */
object StreamStatsProbe {

  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(5)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(60000)
    val spark = GraftSession.local(args.lift(2).getOrElse("32"))
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.sparkContext.defaultParallelism.toString)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    (1 to 2).foreach { rep =>
      val (events, sec) = StreamingBench.throughputOf[(Long, Long, String, String, String)](spark,
        ds => StreamStats.stats(spark, ds.toDF("l_orderkey", "l_suppkey",
          "l_linestatus", "l_returnflag", "l_shipdate")),
        (b, per) => (0 until per).map { i =>
          val g = b.toLong * per + i
          (g, g % 997, if (g % 2 == 0) "O" else "F",
            if (g % 3 == 0) "R" else "N",
            f"1995-${g % 12 + 1}%02d-${g % 28 + 1}%02d")
            : (Long, Long, String, String, String)
        }, "update", s"graft_stats_probe_$rep", batches, perBatch)
      println(f"[probe] stats rep=$rep events=$events sec=$sec%.2f rate=${events / sec / 1000}%.2fk ev/s")
    }
    spark.stop()
  }
}
