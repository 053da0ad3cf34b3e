package graft

import java.sql.Timestamp

import graft.streaming.{StreamNearDup, StreamingBench}

// Dev-only probe for the streaming near-dup leg: same generator as
// StreamingBench's neardup leg, isolated so kernel changes (md5 → fast
// 64-bit family) can be A/B'd without paying for the full bench.
//   Test/runMain graft.NearDupProbe [batches] [perBatch] [cpus] [reps]
object NearDupProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(5)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(60000)
    val spark = GraftSession.local(args.lift(2).getOrElse("4"))
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.sparkContext.defaultParallelism.toString)
    if (sys.env.contains("GRAFT_ROCKS"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.sparkContext.setLogLevel("WARN")
    val base = 1700000000000L
    def doc(n: Long): StreamNearDup.DocEvent = {
      val src = if (n % 10 == 9) n - 9 else n
      val toks = (0 until 25).map(i => s"w${(src * 31 + i * 7) % 997}")
      StreamNearDup.DocEvent(n, toks.mkString(" "), new Timestamp(base + n * 100L))
    }
    import spark.implicits._
    val reps = args.lift(3).map(_.toInt).getOrElse(3)
    (1 to reps).foreach { rep =>
      val (events, sec) = StreamingBench.throughputOf[StreamNearDup.DocEvent](spark,
        ds => StreamNearDup.candidates(ds, watermarkDelay = "2 hours").toDF(),
        (b, per) => {
          val n = math.max(1, per / 10)
          (0 until n).map(i => doc(b.toLong * n + i))
        }, "append", s"graft_neardup_probe_$rep", batches, perBatch)
      println(f"[probe] rep=$rep events=$events sec=$sec%.2f rate=${events / sec / 1000}%.2fk ev/s")
    }
    spark.stop()
  }
}
