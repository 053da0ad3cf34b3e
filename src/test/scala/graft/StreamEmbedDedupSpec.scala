package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamEmbedDedup
import graft.streaming.StreamEmbedDedup.{BandHit, VecEvent}

/** Streaming embedding near-dup detection: stream collisions must equal
  * the sequential same-kernel band sweep on a real corpus slice, COVER
  * every verified batch near-dup pair (candidate completeness — the
  * stream may flag more candidates, never fewer pairs than the batch
  * sweep verifies), and evict state by event time.
  */
class StreamEmbedDedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  private def ts(min: Int): Timestamp = new Timestamp(3600_000L + min * 60_000L)

  private def corpusVecs(sf: String): Seq[(Long, Array[Double])] = {
    import org.apache.spark.sql.functions._
    graft.sources.Corpus.embeddings(spark, sf)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1).toSeq
  }

  test("streamed collisions == sequential band sweep; batch near-dup pairs all covered") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val vecs = corpusVecs(sf)

    // sequential truth with the SAME kernel: flagged iff any band key
    // seen on an earlier vector
    val firstSeen = scala.collection.mutable.Map[Long, Long]()
    val expected = scala.collection.mutable.Set[Long]()
    vecs.foreach { case (id, v) =>
      val keys = StreamEmbedDedup.bandKeysOf(StreamEmbedDedup.signatureOf(v)).toSeq
      if (keys.exists(k => firstSeen.get(k).exists(_ != id))) expected += id
      keys.foreach(k => firstSeen.getOrElseUpdate(k, id))
    }

    val in = MemoryStream[VecEvent]
    val out = StreamEmbedDedup.candidates(in.toDS(), watermarkDelay = "5 minutes")
    val q = out.writeStream.format("memory").queryName("graft_embdedup_stream")
      .outputMode("append").start()
    try {
      val events = vecs.map { case (id, v) => VecEvent(id, v, ts(id.toInt / 50)) }
      val (b1, rest) = events.splitAt(events.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      Seq(b1, b2, b3).foreach { b => in.addData(b); q.processAllAvailable() }
      val streamed = spark.table("graft_embdedup_stream").as[BandHit]
        .collect().map(_.vecId).toSet
      assert(streamed === expected.toSet,
        "stream flags diverge from the sequential band sweep")
      assert(streamed.nonEmpty, "corpus slice must produce band collisions")

      // candidate completeness: every VERIFIED batch pair's later member
      // must be stream-flagged (batch pairs come from the same planes,
      // bands, and bit convention at b = 2)
      val pairs = graft.operators.Similarity.embeddingNearDups(spark, sf)
        .select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.nonEmpty, "fixture must contain verified near-dup pairs")
      pairs.foreach { case (a, b) =>
        assert(streamed.contains(math.max(a, b)),
          s"batch-verified pair ($a,$b) not covered by the stream")
      }
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_embdedup_stream")
    }
  }

  test("completeness holds per-b: a b=4 stream covers the b=4 batch sweep") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val vecs = corpusVecs(sf)
    val in = MemoryStream[VecEvent]
    val out = StreamEmbedDedup.candidates(in.toDS(),
      watermarkDelay = "5 minutes", bitsPerBand = 4)
    val q = out.writeStream.format("memory").queryName("graft_embdedup_b4")
      .outputMode("append").start()
    try {
      in.addData(vecs.map { case (id, v) => VecEvent(id, v, ts(0)) })
      q.processAllAvailable()
      val streamed = spark.table("graft_embdedup_b4").as[BandHit]
        .collect().map(_.vecId).toSet
      val pairs = graft.operators.Similarity
        .embeddingNearDups(spark, sf, bitsPerBand = 4)
        .select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(pairs.nonEmpty, "b=4 batch sweep must still find pairs here")
      pairs.foreach { case (a, b) =>
        assert(streamed.contains(math.max(a, b)),
          s"b=4 batch pair ($a,$b) not covered by the b=4 stream")
      }
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_embdedup_b4")
    }
  }

  test("band-key state evicts once the watermark passes retention") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val v = Array.tabulate(64)(i => math.sin(i * 1.7) + 0.3)
    // the negation flips every sign bit, so NO band can collide with v —
    // a merely-random vector agrees on a 2-bit band with P = 1/4 each
    val other = v.map(x => -x)
    val in = MemoryStream[VecEvent]
    val out = StreamEmbedDedup.candidates(in.toDS(),
      watermarkDelay = "0 seconds", retentionMs = 60_000L)
    val q = out.writeStream.format("memory").queryName("graft_embdedup_evict")
      .outputMode("append").start()
    try {
      in.addData(VecEvent(1L, v, ts(0)))
      q.processAllAvailable()
      in.addData(VecEvent(2L, other, ts(30))) // advances watermark past retention
      q.processAllAvailable()
      in.addData(VecEvent(3L, v.clone(), ts(31)))
      q.processAllAvailable()
      val hits = spark.table("graft_embdedup_evict").as[BandHit].collect().toSeq
      assert(hits.forall(_.dupOf != 1L),
        s"evicted state must not vouch for a new original: $hits")
      // vec 3 now vouches: an exact copy right after collides in all bands
      in.addData(VecEvent(4L, v.clone(), ts(32)))
      q.processAllAvailable()
      val hits2 = spark.table("graft_embdedup_evict").as[BandHit]
        .collect().filter(_.vecId == 4L)
      assert(hits2.nonEmpty && hits2.forall(_.dupOf == 3L), s"${hits2.toSeq}")
      assert(hits2.map(_.band).toSet.size == 8, "exact copy collides in all 8 bands")
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS graft_embdedup_evict")
    }
  }

  test("kill/restart mid-scenario produces the uninterrupted run's flags") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val v = Array.tabulate(64)(i => math.sin(i * 1.7) + 0.3)
    val other = v.map(x => -x) // sign-disjoint: collides in no band
    def run(interrupt: Boolean): Seq[(Long, Long, Int)] = {
      val dir = java.nio.file.Files
        .createTempDirectory(s"embdedup-restart-$interrupt").toString
      val in = MemoryStream[VecEvent]
      def start() =
        StreamEmbedDedup.candidates(in.toDS(), watermarkDelay = "5 minutes")
          .writeStream.format("parquet")
          .option("path", s"$dir/out").option("checkpointLocation", s"$dir/ckpt")
          .outputMode("append").start()
      val q1 = start()
      in.addData(VecEvent(1L, v, ts(0)), VecEvent(2L, other, ts(1)))
      q1.processAllAvailable()
      if (interrupt) {
        in.addData(VecEvent(3L, v.clone(), ts(2))) // in-flight at the kill
        q1.stop()
        in.addData(VecEvent(4L, v.clone(), ts(3))) // arrives while down
        val q2 = start()
        try q2.processAllAvailable() finally q2.stop()
      } else {
        in.addData(VecEvent(3L, v.clone(), ts(2)))
        q1.processAllAvailable()
        in.addData(VecEvent(4L, v.clone(), ts(3)))
        q1.processAllAvailable()
        q1.stop()
      }
      spark.read.parquet(s"$dir/out").as[BandHit]
        .collect().map(h => (h.vecId, h.dupOf, h.band)).toSeq.sorted
    }
    val clean = run(interrupt = false)
    val recovered = run(interrupt = true)
    assert(recovered === clean)
    assert(clean.map(_._1).toSet === Set(3L, 4L))
    assert(clean.forall(_._2 == 1L))
  }
}
