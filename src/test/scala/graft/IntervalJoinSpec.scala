package graft

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{AdEvent, Screen}
import graft.streaming.IntervalJoin

/** Scenarios from the reference's repeater-join suite
  * (`AdEventFixedWindowWithRepeaterEnricherTest.scala:37-111`), replayed
  * against the native interval join: screen-before-ad matches within TTL,
  * expired-TTL ads go to DLQ, ad-before-screen does not match (the
  * reference only repeats screens forward in time). */
class IntervalJoinSpec extends AnyFunSuite {

  // shared, never-stopped session (suites in one JVM would otherwise
  // tear down each other's SparkContext)
  private lazy val spark: SparkSession = SparkTestSession.spark


  private def ts(hhmmss: String): Timestamp =
    Timestamp.from(Instant.parse(s"1970-01-01T${hhmmss}Z"))

  private def run(name: String)(
      script: (MemoryStream[AdEvent], MemoryStream[Screen],
               org.apache.spark.sql.streaming.StreamingQuery) => Unit)
      : Seq[(String, Option[String])] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val ads = MemoryStream[AdEvent]
    val screens = MemoryStream[Screen]
    val out = IntervalJoin.adScreenJoin(ads.toDS(), screens.toDS(), "10 minutes")
    val q = out.writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      script(ads, screens, q)
      spark.table(name)
        .select("adId", "publicationId").as[(String, Option[String])]
        .collect().toSeq.filterNot(_._1 == "wm").sortBy(_._1)
    } finally q.stop()
  }

  test("screen before ad within ttl enriches the ad") {
    val rows = run("ij1") { (ads, screens, q) =>
      screens.addData(Screen("screen1", "pub1", ts("12:00:00")))
      q.processAllAvailable()
      ads.addData(AdEvent("ad1", "screen1", "Impression", ts("12:05:00")))
      q.processAllAvailable()
      // close the join state on both sides
      ads.addData(AdEvent("wm", "none", "Impression", ts("12:40:00")))
      screens.addData(Screen("wm", "none", ts("12:40:00")))
      q.processAllAvailable()
    }
    assert(rows === Seq(("ad1", Some("pub1"))))
  }

  test("ad outside the ttl window lands in the dlq (null enrichment)") {
    val rows = run("ij2") { (ads, screens, q) =>
      screens.addData(Screen("screen1", "pub1", ts("12:00:00")))
      q.processAllAvailable()
      ads.addData(AdEvent("ad1", "screen1", "Impression", ts("12:11:00"))) // > ttl
      q.processAllAvailable()
      ads.addData(AdEvent("wm", "none", "Impression", ts("12:40:00")))
      screens.addData(Screen("wm", "none", ts("12:40:00")))
      q.processAllAvailable()
    }
    assert(rows === Seq(("ad1", None)))
  }

  test("ad before its screen does not match (screens only repeat forward)") {
    val rows = run("ij3") { (ads, screens, q) =>
      ads.addData(AdEvent("ad1", "screen1", "Impression", ts("12:00:00")))
      q.processAllAvailable()
      screens.addData(Screen("screen1", "pub1", ts("12:02:00"))) // after the ad
      q.processAllAvailable()
      ads.addData(AdEvent("wm", "none", "Impression", ts("12:40:00")))
      screens.addData(Screen("wm", "none", ts("12:40:00")))
      q.processAllAvailable()
    }
    assert(rows === Seq(("ad1", None)))
  }

  test("one screen serves many later ads (what the repeater emulated)") {
    val rows = run("ij4") { (ads, screens, q) =>
      screens.addData(Screen("screen1", "pub1", ts("12:00:00")))
      q.processAllAvailable()
      ads.addData(
        AdEvent("ad1", "screen1", "Impression", ts("12:01:00")),
        AdEvent("ad2", "screen1", "Click", ts("12:06:00")),
        AdEvent("ad3", "screen1", "Impression", ts("12:09:00")))
      q.processAllAvailable()
      ads.addData(AdEvent("wm", "none", "Impression", ts("12:40:00")))
      screens.addData(Screen("wm", "none", ts("12:40:00")))
      q.processAllAvailable()
    }
    assert(rows === Seq(
      ("ad1", Some("pub1")), ("ad2", Some("pub1")), ("ad3", Some("pub1"))))
  }
}
