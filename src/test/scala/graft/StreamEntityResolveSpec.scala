package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.EntityResolution
import graft.streaming.StreamEntityResolve

/** At-ingestion entity resolution: the LAST emission per name must equal
  * the batch closure over every event streamed — under arbitrary
  * micro-batching, with bridge-merge corrections emitted in update mode,
  * and re-deliveries idempotent under latest-wins.
  */
class StreamEntityResolveSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  /** Drive `events` through the stream in the given batch splits; return
    * (all emissions in order, latest label per name). */
  private def run(batches: Seq[Seq[(Long, String)]])
    : (Seq[(String, Long, Long)], Map[String, Long]) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(Long, String)]
    val q = StreamEntityResolve.resolve(spark,
      in.toDF().toDF("p_partkey", "p_name"))
      .writeStream.format("memory").queryName("ser_out")
      .outputMode("update").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      val rows = spark.table("ser_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      // memory sink appends per batch in emission order; latest wins
      val latest = rows.foldLeft(Map.empty[String, Long]) {
        case (acc, (n, _, l)) => acc + (n -> l)
      }
      (rows, latest)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS ser_out")
    }
  }

  private def batchLabels(events: Seq[(Long, String)]): Map[String, Long] = {
    import spark.implicits._
    EntityResolution.resolveLabels(spark,
      EntityResolution.universeOf(events.toDF("p_partkey", "p_name")))
      .collect()
      .map(r => r.getAs[String]("p_name") -> r.getAs[Long]("entity_id"))
      .toMap
  }

  // the bridge corpus: two entities 3 edits apart, merged by a later name
  private val bridge = Seq(
    (1L, "aaaaaa k"), (2L, "bbbaaa k"), (3L, "zzzz q"), (101L, "bbaaaa k"))

  test("latest emission per name == batch closure, regardless of batching") {
    val splits = Seq(
      Seq(bridge),                                  // one batch
      bridge.map(Seq(_)),                           // one event per batch
      Seq(bridge.take(2), bridge.drop(2)))          // uneven
    val want = batchLabels(bridge)
    splits.foreach { s =>
      val (_, latest) = run(s)
      assert(latest === want, s"split $s diverged from the batch closure")
    }
  }

  test("a bridge merge emits corrections for the relabeled standing members") {
    val (rows, latest) = run(Seq(bridge.take(3), bridge.drop(3)))
    // first batch: three provisional singletons
    assert(rows.take(3).map(r => (r._1, r._3)).toSet ===
      Set(("aaaaaa k", 1L), ("bbbaaa k", 2L), ("zzzz q", 3L)))
    // bridge batch: the new name lands at the component min AND the
    // stranded member (bbbaaa, old label 2) is re-emitted corrected
    val correction = rows.drop(3)
    assert(correction.contains(("bbaaaa k", 101L, 1L)))
    assert(correction.contains(("bbbaaa k", 2L, 1L)),
      s"missing correction for the relabeled member: $correction")
    assert(latest === batchLabels(bridge))
  }

  test("re-delivered names re-emit their current label; latest-wins unchanged") {
    val redelivered = Seq(bridge.take(3), bridge.take(2), bridge.drop(3))
    val (_, latest) = run(redelivered)
    assert(latest === batchLabels(bridge))
  }

  test("blockless (single-token) names stay singletons, like batch's null key") {
    val evs = Seq((5L, "solo"), (6L, "sola"), (7L, "solo"))
    val (_, latest) = run(Seq(evs))
    // batch: split(name)[2] is null, null never equi-joins — despite
    // edit distance 1, solo and sola stay separate entities
    assert(latest === Map("solo" -> 5L, "sola" -> 6L))
    assert(batchLabels(evs) === latest)
  }

  test("streamed corpus at sf0.001 converges to the batch operator") {
    val parts = graft.sources.Corpus.part(spark, "/root/testdata/sf0.001")
      .select(col("p_partkey"), col("p_name")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val (b1, rest) = parts.splitAt(parts.length / 3)
    val (b2, b3) = rest.splitAt(rest.length / 3)
    val (_, latest) = run(Seq(b1, b2, b3))
    assert(latest === batchLabels(parts))
  }
}
