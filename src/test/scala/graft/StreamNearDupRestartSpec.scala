package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamNearDup
import graft.streaming.StreamNearDup.DocEvent

/** Checkpoint-restart equivalence for the streaming near-dup detector:
  * killed mid-scenario (with an in-flight uncommitted batch and more docs
  * arriving while the query is down) and recovered from its checkpoint,
  * the flagged set must be byte-identical to the uninterrupted run — the
  * band-key first-seen state lives in the checkpoint, so recovery must
  * neither re-flag an original nor miss a duplicate of a pre-kill doc.
  * Completes the restart coverage CheckpointRestartSpec gives the
  * lookup/repeat/interval paths.
  */
class StreamNearDupRestartSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(min: Int): Timestamp = new Timestamp(3600_000L + min * 60_000L)

  private val original =
    "the quick brown fox jumps over the lazy dog while the hunter watches from the hill in silence"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog while the hunter watches from the hill in sunshine"
  private val unrelated =
    "completely different content about distributed query engines and columnar storage formats for analytics"

  private def run(interrupt: Boolean): Seq[(Long, Long, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dir = Files.createTempDirectory(s"neardup-restart-$interrupt").toString
    val in = MemoryStream[DocEvent]
    def start() =
      StreamNearDup.candidates(in.toDS(), watermarkDelay = "5 minutes")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .outputMode("append").start()
    val q1 = start()
    in.addData(DocEvent(1L, original, ts(0)), DocEvent(2L, unrelated, ts(1)))
    q1.processAllAvailable()
    if (interrupt) {
      in.addData(DocEvent(3L, original, ts(2))) // in-flight at the kill
      q1.stop()
      in.addData(DocEvent(4L, nearDup, ts(3))) // arrives while down
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
    } else {
      in.addData(DocEvent(3L, original, ts(2)))
      q1.processAllAvailable()
      in.addData(DocEvent(4L, nearDup, ts(3)))
      q1.processAllAvailable()
      q1.stop()
    }
    spark.read.parquet(s"$dir/out").as[StreamNearDup.BandHit]
      .collect().map(h => (h.docId, h.dupOf, h.band)).toSeq.sorted
  }

  test("kill/restart mid-scenario produces the uninterrupted run's flags") {
    val clean = run(interrupt = false)
    val recovered = run(interrupt = true)
    assert(recovered === clean)
    // the scenario must actually flag both the copy and the near-dup
    assert(clean.map(_._1).toSet === Set(3L, 4L))
    assert(clean.forall(_._2 == 1L))
  }
}
