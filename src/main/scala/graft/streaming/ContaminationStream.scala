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
  * once (the [[Dedup.contaminationHashed]] 16-byte payload discipline)
  * and each micro-batch runs a compiled narrow map that stops probing a
  * document at its FIRST colliding gram (the batch operator's left-semi
  * early-exit, expressed directly). A stateful `distinct()` per doc is
  * exactly what this shape avoids — cross-batch dedup of verdicts is the
  * upstream pipeline's concern ([[StreamDedup]]), not the filter's.
  *
  * The equivalence spec pins the streamed verdicts equal to the batch
  * operator's on the same documents.
  */
object ContaminationStream {

  private val hexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: MessageDigest, s: String): String = {
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  final case class Flagged(doc_id: Long, contaminated: Boolean)

  /** `docs`: streaming frame with `doc_id: long, text: string`.
    * `benchDocs`: STATIC frame of benchmark documents (same schema).
    * Emits one `(doc_id, contaminated=true)` row per flagged arriving doc
    * — the same rows the batch operator produces for the same inputs. */
  def contaminated(docs: DataFrame, benchDocs: DataFrame): Dataset[Flagged] = {
    val s = docs.sparkSession
    import s.implicits._
    // Spark's md5() and MessageDigest produce the identical lowercase hex,
    // so this set is bit-compatible with the batch operator's broadcast
    val benchSet: Set[String] = Dedup.grams13(benchDocs)
      .select(org.apache.spark.sql.functions.md5(col("gram")).as("gh"))
      .distinct().as[String].collect().toSet
    val bcast = s.sparkContext.broadcast(benchSet)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val toks = TextAnalysis.normTokens(text)
        val md = MessageDigest.getInstance("MD5")
        val set = bcast.value
        val hit = toks.length >= 13 &&
          toks.sliding(13).exists(w => set.contains(md5Hex(md, w.mkString(" "))))
        if (hit) Iterator.single(Flagged(id, contaminated = true)) else Iterator.empty
      }
  }
}
