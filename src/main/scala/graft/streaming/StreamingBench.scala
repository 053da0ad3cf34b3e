package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.AdEvent

/** Micro-benchmark for the stateful streaming path: drives
  * [[CtrStream.fixedWindowCtr]] over a [[MemoryStream]] in scripted
  * micro-batches and reports wall time — so the streaming operators have a
  * perf signal next to the batch bench, not just correctness scenarios.
  *
  * The measured plan is the real streaming one: partial HashAggregate →
  * shuffle → StateStore(update-mode) → final HashAggregate, with an
  * advancing event-time watermark. Events are generated in-order on the
  * driver (the harness side, like Beam's TestStream), synthesized
  * deterministically so the number is comparable across rounds.
  */
object StreamingBench {

  /** Returns (events processed, wall seconds) for `batches` micro-batches
    * of `perBatch` synthetic ad events through the fixed-window CTR. */
  def fixedWindowThroughput(
      spark: SparkSession,
      batches: Int = 5,
      perBatch: Int = 60000): (Long, Double) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[AdEvent]
    val out = CtrStream.fixedWindowCtr(in.toDS(), "10 minutes", "0 seconds")
    val name = "graft_stream_bench"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    val base = 1700000000000L // fixed epoch: deterministic windows
    try {
      val t0 = System.nanoTime()
      (0 until batches).foreach { b =>
        val evs = (0 until perBatch).map { i =>
          val n = b.toLong * perBatch + i
          AdEvent(
            s"ad${n % 50}", s"screen${n % 20}",
            if (n % 3 == 0) "Click" else "Impression",
            new Timestamp(base + n * 100L))
        }
        in.addData(evs)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      (batches.toLong * perBatch, sec)
    } finally {
      q.stop()
      spark.sql(s"DROP VIEW IF EXISTS $name")
    }
  }
}
