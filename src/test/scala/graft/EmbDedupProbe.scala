package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.col
import graft.streaming.{StreamEmbedDedup, StreamingBench}

// Dev-only probe for the streaming embedding near-dup leg: measures the
// full detector against a stateless pass-through over the SAME events,
// so the leg's ev/s can be attributed between MemoryStream ingestion of
// 64-double rows (the harness floor) and the detector's own work.
//   Test/runMain graft.EmbDedupProbe [batches] [perBatch] [cpus]
object EmbDedupProbe {
  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(5)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(15000)
    val spark = GraftSession.local(args.lift(2).getOrElse("32"))
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.sparkContext.defaultParallelism.toString)
    spark.sparkContext.setLogLevel("WARN")
    val base = 1700000000000L
    def vec(n: Long): StreamEmbedDedup.VecEvent = {
      val src = if (n % 10 == 9) n - 9 else n
      StreamEmbedDedup.VecEvent(n,
        Array.tabulate(64)(i => math.sin((src * 31 + i * 7) * 0.37)),
        new Timestamp(base + n * 100L))
    }
    import spark.implicits._
    Seq(
      "detector" -> ((ds: org.apache.spark.sql.Dataset[StreamEmbedDedup.VecEvent]) =>
        StreamEmbedDedup.candidates(ds, watermarkDelay = "2 hours").toDF()),
      // the state-row lever: SAME 16-plane signature regrouped as
      // 4 bands x 4 bits -> half the state lookups per vector
      "detector4x4" -> ((ds: org.apache.spark.sql.Dataset[StreamEmbedDedup.VecEvent]) =>
        StreamEmbedDedup.candidatesGrouped(ds, "2 hours", 3600000L, 4, 4).toDF()),
      // signature + 8-row fan-out, NO stateful operator: prices the
      // kernel and the extra rows without shuffle-to-state
      "bandsonly" -> ((ds: org.apache.spark.sql.Dataset[StreamEmbedDedup.VecEvent]) => {
        import ds.sparkSession.implicits._
        ds.mapPartitions { it =>
          it.flatMap { v =>
            val keys = StreamEmbedDedup.bandKeysOf(
              StreamEmbedDedup.signatureOf(v.embedding))
            Iterator.tabulate(keys.length)(b =>
              StreamEmbedDedup.BandRow(keys(b), b, v.vecId, v.ts))
          }
        }.toDF()
      }),
      // full shuffle + group + fMGWS machinery, ZERO state reads/writes:
      // isolates the stateful-operator framework cost from the state ops
      "statefulnoop" -> ((ds: org.apache.spark.sql.Dataset[StreamEmbedDedup.VecEvent]) => {
        import ds.sparkSession.implicits._
        import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
        ds.mapPartitions { it =>
          it.flatMap { v =>
            val keys = StreamEmbedDedup.bandKeysOf(
              StreamEmbedDedup.signatureOf(v.embedding))
            Iterator.tabulate(keys.length)(b =>
              StreamEmbedDedup.BandRow(keys(b), b, v.vecId, v.ts))
          }
        }.withWatermark("ts", "2 hours")
          .groupByKey(_.key)
          .flatMapGroupsWithState[StreamEmbedDedup.SeenState, StreamEmbedDedup.BandHit](
            OutputMode.Append, GroupStateTimeout.NoTimeout) {
            (_: Long, _: Iterator[StreamEmbedDedup.BandRow],
             _: GroupState[StreamEmbedDedup.SeenState]) => Iterator.empty
          }.toDF()
      }),
      "passthrough" -> ((ds: org.apache.spark.sql.Dataset[StreamEmbedDedup.VecEvent]) =>
        ds.select(col("vecId"), col("ts")).toDF())
    ).foreach { case (name, mk) =>
      (1 to 2).foreach { rep =>
        val (events, sec) = StreamingBench.throughputOf[StreamEmbedDedup.VecEvent](spark,
          mk, (b, per) => (0 until per).map(i => vec(b.toLong * per + i)),
          "append", s"graft_embprobe_${name}_$rep", batches, perBatch)
        println(f"[probe] $name rep=$rep events=$events sec=$sec%.2f rate=${events / sec / 1000}%.2fk ev/s")
      }
    }
    spark.stop()
  }
}
