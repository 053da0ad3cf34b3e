package graft

import java.sql.Timestamp

// Dev-only: lookup-cache throughput under adversarial key skew —
//   sbt "Test/runMain graft.SkewBench [batches] [perBatch] [salts]"
// One hot publicationId carries ~99% of the value traffic (the regime the
// reference's "evenly distributed keys" scaling claim excludes); measures
// the plain transformWithState join (hot key = one state partition = one
// core) against the SaltedLookupCache mitigation on RocksDB.
object SkewBench {
  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(5)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(60000)
    val salts = args.lift(2).map(_.toInt).getOrElse(32)
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import spark.implicits._

    val base = 1700000000000L
    val coldKeys = 200
    // 99% of values on the hot key, the rest spread over 200 cold keys
    val values = (b: Int, n: Int) => (0 until n).map { i =>
      val g = b.toLong * n + i
      val k = if (g % 100 != 0) "hotpub" else s"cold${g % coldKeys}"
      (k, s"v$g", new Timestamp(base + g))
    }
    val lookups = (b: Int, n: Int) =>
      (("hotpub", s"lk$b", new Timestamp(base + b.toLong * n)) +:
        (0 until coldKeys).map(c =>
          (s"cold$c", s"lk$b-$c", new Timestamp(base + b.toLong * n)))).toSeq

    def leg(name: String,
            mk: (org.apache.spark.sql.Dataset[(String, String, Timestamp)],
                 org.apache.spark.sql.Dataset[(String, String, Timestamp)]) =>
                   org.apache.spark.sql.DataFrame): Unit = {
      val (events, sec) = graft.streaming.StreamingBench.throughput2(
        spark, mk, values, lookups, "append", s"graft_skew_$name", batches, perBatch)
      println(f"[skewbench] $name%-12s ${events / sec}%10.0f events/s  ($sec%.1f s, $events events)")
    }
    leg("plain", (v, l) =>
      graft.streaming.LookupCacheProcessor.join(v, l, 3600000L, "2 hours").toDF())
    leg("salted", (v, l) =>
      graft.streaming.SaltedLookupCache.join(v, l, 3600000L, salts,
        useTransformWithState = true, watermarkDelay = "2 hours").toDF())
    spark.stop()
  }
}
