package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.model.AdEvent

/** Micro-benchmark for the stateful streaming paths: drives each CTR
  * variant over a [[MemoryStream]] in scripted micro-batches and reports
  * wall time — so the streaming operators have a perf signal next to the
  * batch bench, not just correctness scenarios.
  *
  * The measured plans are the real streaming ones: partial HashAggregate →
  * shuffle → StateStore → final HashAggregate for the windowed aggs, and a
  * key-partitioned flatMapGroupsWithState store for the custom window.
  * Events are generated in-order on the driver (the harness side, like
  * Beam's TestStream), synthesized deterministically so the numbers are
  * comparable across rounds.
  */
object StreamingBench {

  /** One synthetic ad event; shared by all paths so their inputs are
    * identical and the per-path numbers differ only by the plan. */
  private def event(n: Long, baseMs: Long): AdEvent =
    AdEvent(
      s"ad${n % 50}", s"screen${n % 20}",
      if (n % 3 == 0) "Click" else "Impression",
      new Timestamp(baseMs + n * 100L))

  /** Returns (events processed, wall seconds) for `batches` micro-batches
    * of `perBatch` synthetic ad events through `mkQuery`'s streaming plan.
    * `outputMode` must match the plan ("update" for windowed aggs,
    * "append" for flatMapGroupsWithState). */
  def throughput(
      spark: SparkSession,
      mkQuery: Dataset[AdEvent] => DataFrame,
      outputMode: String,
      queryName: String,
      batches: Int = 5,
      perBatch: Int = 60000): (Long, Double) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[AdEvent]
    val out = mkQuery(in.toDS())
    val q = out.writeStream.format("memory").queryName(queryName)
      .outputMode(outputMode).start()
    val base = 1700000000000L // fixed epoch: deterministic windows
    try {
      val t0 = System.nanoTime()
      (0 until batches).foreach { b =>
        val evs = (0 until perBatch).map { i => event(b.toLong * perBatch + i, base) }
        in.addData(evs)
        q.processAllAvailable()
      }
      val sec = (System.nanoTime() - t0) / 1e9
      (batches.toLong * perBatch, sec)
    } finally {
      q.stop()
      spark.sql(s"DROP VIEW IF EXISTS $queryName")
    }
  }

  /** Kept as the named single-path entry point (round-2 API). */
  def fixedWindowThroughput(
      spark: SparkSession,
      batches: Int = 5,
      perBatch: Int = 60000): (Long, Double) =
    throughput(spark, CtrStream.fixedWindowCtr(_, "10 minutes", "0 seconds"),
      "update", "graft_stream_bench", batches, perBatch)

  /** Runs the streaming paths and returns the JSON object `Bench` splices
    * in verbatim as `"streaming":{...}`: fixed / sliding windowed
    * aggregations, the custom merging ad-event window
    * (flatMapGroupsWithState), and watermark-bounded exact dedup — each
    * once on the default (HDFS-backed) state store and once on RocksDB,
    * the store the 100 TB arguments (O(1) ListState appends, state larger
    * than heap) actually assume. */
  def allPaths(spark: SparkSession, batches: Int = 5, perBatch: Int = 60000): String = {
    val paths: Seq[(String, Dataset[AdEvent] => DataFrame, String)] = Seq(
      ("fixed", CtrStream.fixedWindowCtr(_, "10 minutes", "0 seconds"), "update"),
      ("sliding", CtrStream.slidingWindowCtr(_, "20 minutes", "10 minutes", "0 seconds"), "update"),
      ("session", (ds: Dataset[AdEvent]) => AdEventWindower.ctrByScreen(ds).toDF(), "append"),
      ("dedup", (ds: Dataset[AdEvent]) => StreamDedup.dedupEvents(ds).toDF(), "append"))
    def run(suffix: String): Seq[String] = paths.map { case (name, mk, mode) =>
      val (events, sec) = throughput(spark, mk, mode,
        s"graft_stream_bench$suffix$name", batches, perBatch)
      val rate = if (sec > 0) events / sec else 0.0
      s""""$name":{"events":$events,"batches":$batches,"sec":$sec,"events_per_sec":$rate}"""
    }
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    val defaults = run("_")
    // a RocksDB failure (e.g. missing/incompatible native lib) must not
    // discard the default-store results already paid for — it degrades to
    // an err entry inside its own block
    val rocks =
      try {
        spark.conf.set(providerKey,
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        run("_rocksdb_").mkString("\"rocksdb\":{", ",", "}")
      } catch {
        case e: Throwable =>
          val msg = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
            .flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                       case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
          s""""rocksdb":{"err":"$msg"}"""
      } finally prev.fold(spark.conf.unset(providerKey))(spark.conf.set(providerKey, _))
    (defaults :+ rocks).mkString("{", ",", "}")
  }
}
