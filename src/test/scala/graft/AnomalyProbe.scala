package graft

import java.sql.Timestamp

import graft.streaming.{StreamAnomaly, StreamingBench}

/** Throughput probe for the `anomaly` leg: same generator, standalone. */
object AnomalyProbe {

  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(5)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(60000)
    val spark = GraftSession.local(args.lift(2).getOrElse("32"))
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.sparkContext.defaultParallelism.toString)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = 1700000000000L
    (1 to 2).foreach { rep =>
      val (events, sec) = StreamingBench.throughputOf[(String, Timestamp)](spark,
        ds => StreamAnomaly.verdicts(ds.toDF("event_type", "ts")).toDF(),
        (b, per) => (0 until per).map { i =>
          val g = b.toLong * per + i
          (s"src${g % 64}", new Timestamp(base + g * 2000L)): (String, Timestamp)
        }, "append", s"graft_anomaly_probe_$rep", batches, perBatch)
      println(f"[probe] anomaly rep=$rep events=$events sec=$sec%.2f rate=${events / sec / 1000}%.2fk ev/s")
    }
    spark.stop()
  }
}
