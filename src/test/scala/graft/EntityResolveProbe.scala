package graft

import graft.streaming.{StreamEntityResolve, StreamingBench}

/** Throughput probe for the `entity` leg: same generator, standalone. */
object EntityResolveProbe {

  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(5)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(60000)
    val spark = GraftSession.local(args.lift(2).getOrElse("32"))
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.sparkContext.defaultParallelism.toString)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    (1 to 2).foreach { rep =>
      val (events, sec) = StreamingBench.throughputOf[(Long, String)](spark,
        ds => StreamEntityResolve.resolve(spark,
          ds.toDF("p_partkey", "p_name")).toDF(),
        (b, per) => (0 until per).map { i =>
          val g = b.toLong * per + i
          val blk = g % 64
          val v = (g / 64) % 50
          (g, s"v${v / 5}a${v % 5} blk$blk"): (Long, String)
        }, "update", s"graft_entity_probe_$rep", batches, perBatch)
      println(f"[probe] entity rep=$rep events=$events sec=$sec%.2f rate=${events / sec / 1000}%.2fk ev/s")
    }
    spark.stop()
  }
}
