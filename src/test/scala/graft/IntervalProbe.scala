package graft

import java.sql.Timestamp

import graft.model.{AdEvent, Screen}
import graft.streaming.{IntervalJoin, StreamingBench}

// Dev-only probe for the interval-join leg: same generators as
// StreamingBench's interval leg, but with the streaming state-partition
// count as a knob — isolates how much of the leg's cost is per-partition
// state-store commit overhead vs per-event join work.
//   Test/runMain graft.IntervalProbe [parts] [batches] [perBatch] [cpus]
object IntervalProbe {
  def main(args: Array[String]): Unit = {
    val parts = args.lift(0).getOrElse("32")
    val batches = args.lift(1).map(_.toInt).getOrElse(5)
    val perBatch = args.lift(2).map(_.toInt).getOrElse(60000)
    val spark = GraftSession.local(args.lift(3).getOrElse("4"))
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    // GRAFT_JOIN_FMT=3 + GRAFT_ROCKS=1: probe the single-store
    // virtual-column-family join state format (RocksDB-only)
    sys.env.get("GRAFT_JOIN_FMT").foreach(v =>
      spark.conf.set("spark.sql.streaming.join.stateFormatVersion", v))
    if (sys.env.contains("GRAFT_ROCKS"))
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.sparkContext.setLogLevel("WARN")
    val base = 1700000000000L
    val screenIds = 2000
    val intervalAds = (b: Int, n: Int) => (0 until n).map { i =>
      val g = b.toLong * n + i
      AdEvent(s"ad${g % 50}", s"screen${g % screenIds}",
        if (g % 3 == 0) "Click" else "Impression", new Timestamp(base + g * 100L))
    }
    val screens = (b: Int, n: Int) => (0 until n / 20).map { i =>
      val g = b.toLong * n + i * 20
      Screen(s"screen${(g / 20) % screenIds}", s"pub${g % 7}", new Timestamp(base + g * 100L))
    }
    import spark.implicits._
    val reps = args.lift(4).map(_.toInt).getOrElse(2)
    (1 to reps).foreach { rep =>
      val (events, sec) = StreamingBench.throughput2[AdEvent, Screen](spark,
        (ads, scs) => IntervalJoin.adScreenJoin(ads, scs, "30 seconds", "0 seconds"),
        intervalAds, screens, "append", s"graft_interval_probe_${parts}_$rep", batches, perBatch)
      println(f"[probe] parts=$parts rep=$rep events=$events sec=$sec%.2f rate=${events / sec / 1000}%.1fk ev/s")
    }
    spark.stop()
  }
}
