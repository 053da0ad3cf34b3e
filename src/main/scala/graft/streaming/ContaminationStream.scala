package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.col

import graft.operators.{Dedup, TextAnalysis}

/** Streaming twin of [[graft.operators.Dedup.contaminationHashed]]:
  * benchmark decontamination AT INGESTION — each arriving document is
  * checked for 13-gram collisions against the (static) eval-suite gram
  * set and flagged before it ever lands in the corpus, instead of by a
  * batch sweep afterwards.
  *
  * Completely STATELESS streaming: a doc's verdict depends only on the
  * doc and the static benchmark set, so there is no state store, no
  * watermark, and no aggregation — the benchmark's md5'd grams broadcast
  * once as a sorted array of 16-byte (two-long) digests — the
  * [[Dedup.contaminationHashed]] payload discipline, with zero per-entry
  * object overhead — and each micro-batch runs a compiled per-partition
  * probe (one reused digest, binary search per gram) that stops at a
  * document's FIRST colliding gram (the batch operator's left-semi
  * early-exit, expressed directly). A stateful `distinct()` per doc is
  * exactly what this shape avoids — cross-batch dedup of verdicts is the
  * upstream pipeline's concern ([[StreamDedup]]), not the filter's.
  *
  * The equivalence spec pins the streamed verdicts equal to the batch
  * operator's on the same documents.
  */
object ContaminationStream {

  final case class Flagged(doc_id: Long, contaminated: Boolean)

  /** The benchmark gram set as a sorted array of interleaved (hi, lo)
    * 64-bit halves of each md5 — 16 bytes per gram in the broadcast,
    * probed by binary search over the pair ordering. */
  private def packedBench(benchDocs: DataFrame): Array[Long] = {
    import benchDocs.sparkSession.implicits._
    val hexes = Dedup.grams13(benchDocs)
      .select(org.apache.spark.sql.functions.md5(col("gram")).as("gh"))
      .distinct().as[String].collect()
    val pairs = hexes.map { h =>
      (java.lang.Long.parseUnsignedLong(h.substring(0, 16), 16),
        java.lang.Long.parseUnsignedLong(h.substring(16, 32), 16))
    }
    // unsigned pair order — the probe's binary search uses the same
    val sorted = pairs.sortWith { (a, b) =>
      val c = java.lang.Long.compareUnsigned(a._1, b._1)
      if (c != 0) c < 0 else java.lang.Long.compareUnsigned(a._2, b._2) < 0
    }
    val out = new Array[Long](sorted.length * 2)
    var i = 0
    while (i < sorted.length) {
      out(2 * i) = sorted(i)._1
      out(2 * i + 1) = sorted(i)._2
      i += 1
    }
    out
  }

  private def contains(sorted: Array[Long], hi: Long, lo: Long): Boolean = {
    var a = 0
    var b = sorted.length / 2 - 1
    while (a <= b) {
      val m = (a + b) >>> 1
      var c = java.lang.Long.compareUnsigned(sorted(2 * m), hi)
      if (c == 0) c = java.lang.Long.compareUnsigned(sorted(2 * m + 1), lo)
      if (c == 0) return true
      if (c < 0) a = m + 1 else b = m - 1
    }
    false
  }

  final case class Scrubbed(
      doc_id: Long, clean_text: String, n_tokens: Long, n_removed: Long)

  /** Streaming twin of [[graft.operators.Dedup.contaminationScrub]]: the
    * SURGICAL decontamination at ingestion — instead of flagging (and
    * losing) a whole document because one benchmark sentence leaked into
    * it, cut ONLY the contaminated 13-token spans and emit the rest,
    * before the doc ever lands in the corpus.
    *
    * Stateless like [[contaminated]] — a doc's scrub depends only on the
    * doc and the static benchmark gram set — so the span-cut kernel runs
    * entirely inside the map: mark every window position whose 13-gram
    * digest probes into the broadcast set (within-doc repeats all
    * marked: every leaked occurrence is cut, the batch policy), then cut
    * the UNION of the marked windows. That union IS the batch operator's
    * island machinery: marks whose gap is ≤ n merge into one island
    * [min, max + n − 1], and a gap of exactly n still yields adjacent
    * windows — so island-merged spans and the plain window union cover
    * identical token positions, position for position
    * (`ContaminationStreamSpec` pins stream rows == batch
    * `contaminationScrub` rows under arbitrary micro-batching).
    *
    * Emits one row per arriving doc (clean docs pass through with
    * n_removed = 0) — exactly-once output per input, no state store, no
    * watermark; the scale cost is the same per-token probe loop as the
    * flag path plus the rebuild string, with nothing shuffled. */
  def scrubbed(docs: DataFrame, benchDocs: DataFrame): Dataset[Scrubbed] = {
    val s = docs.sparkSession
    import s.implicits._
    val bcast = s.sparkContext.broadcast(packedBench(benchDocs))
    val n = 13
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        val md = MessageDigest.getInstance("MD5")
        val set = bcast.value
        it.map { case (id, text) =>
          val toks = TextAnalysis.normTokens(text)
          val cut = new Array[Boolean](toks.length)
          var pos = 0
          while (pos + n <= toks.length) {
            val d = md.digest(
              toks.slice(pos, pos + n).mkString(" ").getBytes("UTF-8"))
            var hi = 0L; var lo = 0L
            var i = 0
            while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
            while (i < 16) { lo = (lo << 8) | (d(i) & 0xffL); i += 1 }
            if (contains(set, hi, lo)) {
              var j = pos
              while (j < pos + n) { cut(j) = true; j += 1 }
            }
            pos += 1
          }
          val sb = new java.lang.StringBuilder
          var kept = 0L
          var i = 0
          while (i < toks.length) {
            if (!cut(i)) {
              if (kept > 0L) sb.append(' ')
              sb.append(toks(i))
              kept += 1L
            }
            i += 1
          }
          Scrubbed(id, sb.toString, toks.length.toLong, toks.length - kept)
        }
      }
  }

  /** `docs`: streaming frame with `doc_id: long, text: string`.
    * `benchDocs`: STATIC frame of benchmark documents (same schema).
    * Emits one `(doc_id, contaminated=true)` row per flagged arriving doc
    * — the same rows the batch operator produces for the same inputs. */
  def contaminated(docs: DataFrame, benchDocs: DataFrame): Dataset[Flagged] = {
    val s = docs.sparkSession
    import s.implicits._
    val bcast = s.sparkContext.broadcast(packedBench(benchDocs))
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        // one digest per partition, not per row (Dedup.minhashPerDoc rule)
        val md = MessageDigest.getInstance("MD5")
        val set = bcast.value
        it.flatMap { case (id, text) =>
          val toks = TextAnalysis.normTokens(text)
          val hit = toks.length >= 13 && toks.sliding(13).exists { w =>
            val d = md.digest(w.mkString(" ").getBytes("UTF-8"))
            var hi = 0L; var lo = 0L
            var i = 0
            while (i < 8) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
            while (i < 16) { lo = (lo << 8) | (d(i) & 0xffL); i += 1 }
            contains(set, hi, lo)
          }
          if (hit) Iterator.single(Flagged(id, contaminated = true))
          else Iterator.empty
        }
      }
  }
}
