package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AutoSaltedLookupCache, KeySkewStream, LookupCacheJoin, LookupCacheProcessor}

/** The monitor→mitigation wiring: [[AutoSaltedLookupCache]] must read the
  * LIVE hot-key profile ([[KeySkewStream]], update mode — the documented
  * deployment shape), apply the measured crossover rule, and produce the
  * plain operator's exact output whichever branch it picks. */
class AutoSaltSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(hhmmss: String): Timestamp =
    Timestamp.from(Instant.parse(s"1970-01-01T${hhmmss}Z"))

  private def minutes(n: Int): Long = n * 60L * 1000L

  test("crossover rule reproduces the measured bracket") {
    import AutoSaltedLookupCache.decide
    // BASELINE.md table: 99%-hot at 60k rows/batch lost to fixed cost —
    // must stay plain; at 240k rows/batch salting won 1.64× — must salt
    assert(!decide(0.99, 60000, 32).salted)
    assert(decide(0.99, 240000, 32).salted)
    // a key under 1/slots of traffic cannot serialize the join: the
    // partitioner already spreads the rest, whatever the volume
    assert(!decide(0.02, 10000000, 32).salted)
    // salts sized to the task slots, not a magic constant
    assert(decide(0.99, 240000, 8).salts === 8)
  }

  test("live update-mode profile feeds the decision: skewed salts, uniform stays plain") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    def liveProfile(name: String, batches: Seq[Seq[Long]]): AutoSaltedLookupCache.Decision = {
      val in = MemoryStream[Long]
      val out = KeySkewStream.profile(
        KeySkewStream.hotKeys(in.toDF().toDF("user_id")), topK = 3)
      // update mode IS the monitor's documented contract (one updated
      // global row per micro-batch) — the decision reads its sink table
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        batches.foreach { b => in.addData(b); q.processAllAvailable() }
        AutoSaltedLookupCache.decideFromProfile(
          spark.table(name), rowsPerBatch = 300000, slots = 32)
      } finally { q.stop(); spark.sql(s"DROP VIEW IF EXISTS $name") }
    }

    // one key at ~60% across two micro-batches — the FRESHEST profile row
    // (largest n_rows) must drive the decision, not the first batch's
    val skewed = liveProfile("graft_auto_skewed",
      Seq(Seq.fill(30)(42L) ++ (1L to 20L), Seq.fill(40)(42L) ++ (21L to 40L)))
    assert(skewed.salted, s"skewed profile must salt: $skewed")
    assert(skewed.salts === 32)
    assert(math.abs(skewed.topShare - 70.0 / 110.0) < 1e-4)

    // uniform over 40 keys: top share 1/40 < 1/32 — plain
    val uniform = liveProfile("graft_auto_uniform",
      Seq((1L to 40L).flatMap(k => Seq.fill(5)(k))))
    assert(!uniform.salted, s"uniform profile must stay plain: $uniform")
  }

  // --- output equivalence through the auto operator ---------------------

  /** The SaltedLookupSpec skew scenario: one hot key at 100×, lookups
    * arriving mid-stream so half the hot values buffer first. */
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

  private def runAuto(name: String, decision: AutoSaltedLookupCache.Decision): Seq[Out] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val values = MemoryStream[(String, String, Timestamp)]
    val lookups = MemoryStream[(String, String, Timestamp)]
    val out = AutoSaltedLookupCache.join(values.toDS(), lookups.toDS(), minutes(60), decision)
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      skewedScript(values, lookups, () => q.processAllAvailable())
      spark.table(name).as[LookupCacheJoin.Enriched[String, String, String]]
        .collect().toSeq.map(e => (e.key, e.value, e.lookup, e.emitTs.getTime))
        .sorted
    } finally { q.stop(); spark.sql(s"DROP VIEW IF EXISTS $name") }
  }

  test("auto-salted output matches the plain operator element-for-element") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val plain = {
      val values = MemoryStream[(String, String, Timestamp)]
      val lookups = MemoryStream[(String, String, Timestamp)]
      val out = LookupCacheProcessor.join(values.toDS(), lookups.toDS(), minutes(60))
      val q = out.writeStream.format("memory").queryName("graft_auto_ref")
        .outputMode("append").start()
      try {
        skewedScript(values, lookups, () => q.processAllAvailable())
        spark.table("graft_auto_ref")
          .as[LookupCacheJoin.Enriched[String, String, String]]
          .collect().toSeq.map(e => (e.key, e.value, e.lookup, e.emitTs.getTime))
          .sorted
      } finally { q.stop(); spark.sql("DROP VIEW IF EXISTS graft_auto_ref") }
    }
    assert(plain.size === 202, s"scenario must enrich all values: ${plain.size}")
    // the salted branch (what a skewed profile selects)
    val salted = runAuto("graft_auto_salted",
      AutoSaltedLookupCache.decide(0.99, 240000, 8))
    assert(salted === plain, "salted branch diverged from the plain operator")
    // the plain branch (what a uniform profile selects)
    val auto = runAuto("graft_auto_plain",
      AutoSaltedLookupCache.decide(0.01, 240000, 8))
    assert(auto === plain, "plain branch diverged from the plain operator")
  }
}
