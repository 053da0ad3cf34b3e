package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.KeySkewStream

/** The live hot-key monitor must (a) keep its single global state row
  * equal to the batch sketch over the prefix seen so far — the same
  * incremental-merge contract TopTermsStreamSpec pins — and (b) surface a
  * sustained hot key with its share, which is the signal the salted-lookup
  * crossover rule consumes. */
class KeySkewStreamSpec extends AnyFunSuite {

  // shared, never-stopped session (suites in one JVM would otherwise
  // tear down each other's SparkContext)
  private lazy val spark: SparkSession = SparkTestSession.spark

  // one hot key (42) carrying ~60% of traffic, a tail of cold keys
  private val batch1: Seq[Long] = Seq.fill(30)(42L) ++ (1L to 20L)
  private val batch2: Seq[Long] = Seq.fill(40)(42L) ++ (21L to 40L)

  test("hot-key state tracks the stream and the hot key's share is exact") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[Long]
    val out = KeySkewStream.profile(
      KeySkewStream.hotKeys(in.toDF().toDF("user_id")), topK = 3)
    val q = out.writeStream.format("memory").queryName("graft_key_skew")
      .outputMode("complete").start()
    try {
      def rows(): Array[Row] = spark.table("graft_key_skew").collect()
      in.addData(batch1)
      q.processAllAvailable()
      val r1 = rows()
      assert(r1.length === 3)
      val hot1 = r1.find(_.getLong(0) == 1L).get
      assert(hot1.getString(1) === "42", s"hot key not ranked first: ${r1.toSeq}")
      // 50 rows seen, 30 are key 42; capacity (64) exceeds distinct keys
      // (21), so the sketch is exact: cnt 30, err 0, share 0.6
      assert(hot1.getLong(2) === 30L && hot1.getLong(3) === 0L)
      assert(hot1.getLong(4) === 50L && hot1.getDouble(5) === 0.6)

      in.addData(batch2)
      q.processAllAvailable()
      val hot2 = rows().find(_.getLong(0) == 1L).get
      // 110 rows seen, 70 are key 42 — the share the crossover rule reads
      assert(hot2.getString(1) === "42" && hot2.getLong(2) === 70L)
      assert(hot2.getLong(4) === 110L)
      assert(math.abs(hot2.getDouble(5) - 70.0 / 110.0) < 1e-4)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_key_skew")
    }
  }

  test("update mode emits one refreshed global row per micro-batch (the documented contract)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[Long]
    val q = KeySkewStream.hotKeys(in.toDF().toDF("user_id"))
      .writeStream.format("memory").queryName("graft_key_skew_upd")
      .outputMode("update").start()
    try {
      in.addData(batch1)
      q.processAllAvailable()
      in.addData(batch2)
      q.processAllAvailable()
      // the sink accumulates the per-batch UPDATES of the single global
      // row: one row per micro-batch, each with the cumulative count
      val counts = spark.table("graft_key_skew_upd")
        .select("n_rows").as[Long].collect().toSeq.sorted
      assert(counts === Seq(50L, 110L),
        s"expected one updated global row per batch (50 then 110): $counts")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_key_skew_upd")
    }
  }
}
