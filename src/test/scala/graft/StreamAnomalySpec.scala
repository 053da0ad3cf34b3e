package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamAnomaly

/** The streaming ingest-anomaly monitor must emit, for every closed
  * (event_type, day), exactly the prefix-causal verdict a sequential
  * day-ordered sweep computes — under arbitrary micro-batching, with
  * types that stop arriving closed through the event-time timeout. */
class StreamAnomalySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  private val dayMs = 86400000L
  private val types = Seq("view", "click", "purchase")
  private val nDays = 14

  // deterministic per-(type, day) volumes with one planted spike large
  // enough that even the PREFIX-INCLUSIVE z (bounded by (n-1)/sqrt(n) for
  // a single outlier) crosses 3 at day 12
  private def countOf(t: Int, d: Long): Long =
    if (types(t) == "click" && d == 12) 500L else 10L + (t * 3 + d * 7) % 5

  test("stream == sequential prefix sweep; spike flagged; idle types closed by timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val events = for {
      d <- 0L until nDays.toLong
      t <- types.indices
      j <- 0L until countOf(t, d)
    } yield (types(t), new Timestamp(d * dayMs + j * 1000L + 37L))
    val ordered = events.sortBy(_._2.getTime)

    val in = MemoryStream[(String, Timestamp)]
    // a realistic reordering allowance: with "0 seconds" a row whose ts
    // TIES the previous batch's max is dropped as late at the boundary
    val q = StreamAnomaly.verdicts(in.toDF().toDF("event_type", "ts"), "1 hour")
      .writeStream.format("memory").queryName("graft_anomaly_spec")
      .outputMode("append").start()
    try {
      // uneven micro-batches in event-time order, then one sentinel far
      // in the future: every regular day must close — the last days of
      // the non-sentinel types only via the event-time timeout
      val cuts = Seq(ordered.take(100), ordered.slice(100, 101),
        ordered.slice(101, 700), ordered.drop(700))
      cuts.foreach { b => if (b.nonEmpty) { in.addData(b); q.processAllAvailable() } }
      in.addData(Seq(("view", new Timestamp(30L * dayMs))))
      q.processAllAvailable()
      q.processAllAvailable() // no-data batch: timeout-driven closures land
    } finally q.stop()

    val got = spark.sql("SELECT * FROM graft_anomaly_spec").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getBoolean(4)))
      .sortBy(v => (v._1, v._2))

    // the sequential prefix sweep: moments folded in day order, z against
    // the history up to and including the day
    val want = types.indices.flatMap { t =>
      var (n, s, s2) = (0L, 0L, 0L)
      (0L until nDays.toLong).map { d =>
        val c = countOf(t, d)
        n += 1; s += c; s2 += c * c
        val nn = n.toDouble
        val mean = s / nn
        val varr = (s2 - s.toDouble * s / nn) / nn
        val z = if (varr > 0) Some((c - mean) / math.sqrt(varr)) else None
        (types(t), d, c, z.map(v => math.rint(v * 10000.0) / 10000.0),
          z.exists(v => math.abs(v) > 3.0))
      }
    }.sortBy(v => (v._1, v._2))

    assert(got.length === types.size * nDays,
      s"every regular (type, day) must close and emit exactly once; got ${got.length}")
    assert(got.toSeq === want.toSeq, "streamed verdicts diverge from the prefix sweep")
    // the planted spike is the one anomaly
    assert(got.filter(_._5).map(v => (v._1, v._2)).toSeq === Seq(("click", 12L)))
  }
}
