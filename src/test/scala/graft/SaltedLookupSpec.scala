package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{LookupCacheJoin, LookupCacheProcessor, SaltedLookupCache}

/** Adversarial key skew through the lookup-cache join: the reference
  * claims "unlimited scalability as long as keys are distributed evenly"
  * (its README's cache-join section) — this suite pins the UNEVEN case's
  * mitigation: [[SaltedLookupCache]] must produce the unsalted operator's
  * exact enriched output under a one-hot-key distribution (one
  * publicationId carrying ~100x the others' traffic), and the same
  * GC-flushed (key, value) DLQ set (flush timestamps may differ per salt
  * group — each salts its own GC timer; that is the documented delta).
  */
class SaltedLookupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(hhmmss: String): Timestamp =
    Timestamp.from(Instant.parse(s"1970-01-01T${hhmmss}Z"))

  private def minutes(n: Int): Long = n * 60L * 1000L

  /** One hot key at 100x, two cold keys; lookups arrive mid-stream so half
    * the hot values buffer first. */
  private def skewedScript(
      values: MemoryStream[(String, String, Timestamp)],
      lookups: MemoryStream[(String, String, Timestamp)],
      process: () => Unit): Unit = {
    values.addData((0 until 100).map(i =>
      ("hotpub", f"hot$i%03d", ts(f"12:00:${i % 60}%02d"))) ++
      Seq(("coldA", "a0", ts("12:00:10")), ("coldB", "b0", ts("12:00:20"))))
    process()
    lookups.addData(("hotpub", "vHot", ts("12:01:40")),
      ("coldA", "vA", ts("12:01:40")), ("coldB", "vB", ts("12:01:40")))
    process()
    values.addData((100 until 200).map(i =>
      ("hotpub", f"hot$i%03d", ts(f"12:02:${i % 60}%02d"))))
    process()
  }

  private type Out = (String, String, Option[String], Long)

  private def runPlain(name: String): Seq[Out] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val values = MemoryStream[(String, String, Timestamp)]
    val lookups = MemoryStream[(String, String, Timestamp)]
    val out = LookupCacheProcessor.join(values.toDS(), lookups.toDS(), minutes(60))
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      skewedScript(values, lookups, () => q.processAllAvailable())
      spark.table(name).as[LookupCacheJoin.Enriched[String, String, String]]
        .collect().toSeq.map(e => (e.key, e.value, e.lookup, e.emitTs.getTime))
        .sorted
    } finally { q.stop(); spark.sql(s"DROP VIEW IF EXISTS $name") }
  }

  private def runSalted(name: String, tws: Boolean): Seq[Out] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val values = MemoryStream[(String, String, Timestamp)]
    val lookups = MemoryStream[(String, String, Timestamp)]
    val out = SaltedLookupCache.join(values.toDS(), lookups.toDS(),
      minutes(60), salts = 8, useTransformWithState = tws)
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      skewedScript(values, lookups, () => q.processAllAvailable())
      spark.table(name).as[LookupCacheJoin.Enriched[String, String, String]]
        .collect().toSeq.map(e => (e.key, e.value, e.lookup, e.emitTs.getTime))
        .sorted
    } finally { q.stop(); spark.sql(s"DROP VIEW IF EXISTS $name") }
  }

  test("salted join reproduces the unsalted enriched output under 100x key skew") {
    val plain = runPlain("slc_plain")
    assert(plain.size === 202, "every value must eventually enrich (no DLQ here)")
    // buffered-then-flushed hot values stamp at the lookup's arrival time;
    // post-lookup values stamp at their own time — all of it must survive
    // salting bit-for-bit, on both engines
    assert(runSalted("slc_tws", tws = true) === plain,
      "salted transformWithState output diverged from the unsalted operator")
    assert(runSalted("slc_fm", tws = false) === plain,
      "salted fMGWS output diverged from the unsalted operator")
  }

  test("stableSalt is content-stable for identity-hashCode payloads (arrays)") {
    val t = ts("12:00:00")
    // Two DISTINCT array instances with equal content — exactly what a task
    // retry produces when it re-deserializes the batch. Under the old
    // `v.hashCode` these got independent identity hashes, so a replayed
    // micro-batch could land the element in a different salt group than the
    // checkpoint recorded.
    val a1 = Array[Byte](1, 2, 3, 4)
    val a2 = Array[Byte](1, 2, 3, 4)
    assert(a1 ne a2)
    (1 to 64).foreach { n =>
      assert(SaltedLookupCache.stableSalt(a1, t, n) ===
        SaltedLookupCache.stableSalt(a2, t, n),
        s"equal-content arrays must salt identically (salts=$n)")
    }
    // ...and the timestamp fallback still spreads opaque payloads across
    // groups rather than funneling them all into salt 0
    val spread = (0 until 100).map(i =>
      SaltedLookupCache.stableSalt(a1, ts(f"12:00:${i % 60}%02d"), 8)).toSet
    assert(spread.size > 1, "timestamp mixing must spread opaque payloads")
    // value-stable types keep their content hash: same string, new instance
    assert(SaltedLookupCache.stableSalt(new String("hot001"), t, 8) ===
      SaltedLookupCache.stableSalt("hot001", t, 8))
  }

  test("same-timestamp array payloads spread by CONTENT, not timestamp (r7 note)") {
    // A hot key whose events share one coarse timestamp — a burst landing
    // in the same second — used to collapse onto a single salt for array
    // payloads (timestamp-only fallback). Content hashing restores the
    // spread while staying replay-deterministic.
    val t = ts("12:00:00")
    val salts = (0 until 64).map { i =>
      SaltedLookupCache.stableSalt(s"payload$i".getBytes("UTF-8"), t, 8)
    }.toSet
    assert(salts.size > 4,
      s"same-ts distinct-content byte arrays must spread across salts: $salts")
    // non-byte arrays hash element-wise too
    val ls = (0 until 64).map { i =>
      SaltedLookupCache.stableSalt(Array(i.toLong, 2L * i), t, 8)
    }.toSet
    assert(ls.size > 4, s"same-ts Array[Long] payloads must spread: $ls")
    // the documented residual trade: a truly opaque class still spreads
    // by timestamp only — same ts, same salt
    final class Opaque(val x: Int)
    assert(SaltedLookupCache.stableSalt(new Opaque(1), t, 8) ===
      SaltedLookupCache.stableSalt(new Opaque(2), t, 8))
  }

  test("salted join matches unsalted output for an Array[Byte] payload (self-sized salts)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def run(name: String, salted: Boolean): Seq[(String, String, Option[String], Long)] = {
      val values = MemoryStream[(String, Array[Byte], Timestamp)]
      val lookups = MemoryStream[(String, String, Timestamp)]
      val out =
        if (salted) SaltedLookupCache.join(values.toDS(), lookups.toDS(), minutes(60))
        else LookupCacheProcessor.join(values.toDS(), lookups.toDS(), minutes(60))
      val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        values.addData((0 until 40).map(i =>
          ("hotpub", f"hot$i%02d".getBytes("UTF-8"), ts(f"12:00:${i % 60}%02d"))) ++
          Seq(("coldA", "a0".getBytes("UTF-8"), ts("12:00:10"))))
        q.processAllAvailable()
        lookups.addData(("hotpub", "vHot", ts("12:01:40")), ("coldA", "vA", ts("12:01:40")))
        q.processAllAvailable()
        values.addData((40 until 80).map(i =>
          ("hotpub", f"hot$i%02d".getBytes("UTF-8"), ts(f"12:02:${i % 60}%02d"))))
        q.processAllAvailable()
        spark.table(name).as[LookupCacheJoin.Enriched[String, Array[Byte], String]]
          .collect().toSeq
          .map(e => (e.key, new String(e.value, "UTF-8"), e.lookup, e.emitTs.getTime))
          .sorted
      } finally { q.stop(); spark.sql(s"DROP VIEW IF EXISTS $name") }
    }
    val plain = run("slc_arr_plain", salted = false)
    assert(plain.size === 81, "every byte-array value must enrich")
    assert(run("slc_arr_salted", salted = true) === plain,
      "salted output diverged for an identity-hashCode payload type")
  }

  test("defaultSalts sizes to the session's task slots") {
    assert(SaltedLookupCache.defaultSalts(spark) ===
      spark.sparkContext.defaultParallelism)
    assert(SaltedLookupCache.defaultSalts(spark) >= 1)
  }

  test("salted GC flush drains the same DLQ (key, value) set") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def dlqOf(salted: Boolean): Set[(String, String)] = {
      val name = s"slc_dlq_$salted"
      val values = MemoryStream[(String, String, Timestamp)]
      val lookups = MemoryStream[(String, String, Timestamp)]
      val out =
        if (salted) SaltedLookupCache.join(values.toDS(), lookups.toDS(),
          minutes(5), salts = 8)
        else LookupCacheProcessor.join(values.toDS(), lookups.toDS(), minutes(5))
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        values.addData((0 until 50).map(i => ("hotpub", f"hot$i%02d", ts("12:00:00"))))
        q.processAllAvailable()
        // no lookup ever arrives; advance the watermark past ts + ttl via a
        // driver element on a throwaway key so the GC timer fires
        values.addData(("__wm__", "wm", ts("12:30:00")))
        q.processAllAvailable()
        values.addData(("__wm__", "wm2", ts("13:00:00")))
        q.processAllAvailable()
        spark.table(name).as[LookupCacheJoin.Enriched[String, String, String]]
          .collect().toSeq
          .filter(e => e.key == "hotpub" && e.lookup.isEmpty)
          .map(e => (e.key, e.value)).toSet
      } finally { q.stop(); spark.sql(s"DROP VIEW IF EXISTS $name") }
    }
    val plain = dlqOf(salted = false)
    assert(plain.size === 50, "all unresolved hot values must GC-flush to the DLQ")
    assert(dlqOf(salted = true) === plain,
      "salting must flush the identical (key, value) DLQ set")
  }
}
