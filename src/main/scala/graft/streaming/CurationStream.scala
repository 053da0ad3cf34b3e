package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis

/** Streaming twin of [[graft.operators.Curation.corpusRetention]]: the
  * same retention verdict — duplicate / language / quality / retained,
  * same precedence — over an unbounded document stream, so a corpus can
  * be curated AS IT ARRIVES instead of in a batch sweep.
  *
  * The stateless signals (fingerprint, language id, quality score) are
  * the exact same column expressions the batch operator uses. The
  * keep-one-per-fingerprint rule changes by necessity: batch keeps the
  * MINIMUM doc_id, but an unbounded stream cannot know the minimum, so
  * the streaming-correct policy is FIRST ARRIVAL — a per-fingerprint
  * boolean in flatMapGroupsWithState (one bit of state per distinct
  * document ever seen; at 100 TB that state lives in RocksDB partitioned
  * by fingerprint, the same shape as [[StreamDedup]]). Within one
  * micro-batch the group's rows are processed in doc_id order — the
  * shuffle-fetch order Spark presents is NOT deterministic, so the
  * smallest doc_id wins the batch (exactly the batch operator's keep-min
  * policy, per batch); across batches the policy is first-arrival. The
  * equivalence spec pins both against the batch operator. */
object CurationStream {

  final case class DocVerdict(doc_id: Long, reason: String, retained: Boolean)

  // NOT private: Spark's generated row deserializer must access the class
  final case class Sig(
      doc_id: Long, fingerprint: String, predicted: String, qKeep: Boolean)

  def retention(docs: DataFrame): Dataset[DocVerdict] = {
    val s = docs.sparkSession
    import s.implicits._
    val sig = docs.select(col("doc_id"),
        TextAnalysis.fingerprintCol(col("text")).as("fingerprint"),
        TextAnalysis.predictedLang(col("text")).as("predicted"),
        (TextAnalysis.qualityScore10(col("text")) >= TextAnalysis.qualityKeepCut)
          .as("qKeep"))
      .as[Sig]
    sig.groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Sig], st: GroupState[Boolean]) => {
          var seen = st.getOption.getOrElse(false)
          // doc_id order: the per-(batch, fingerprint) group is a handful
          // of rows, and sorting makes the winner deterministic
          val out = rows.toVector.sortBy(_.doc_id).map { r =>
            val reason =
              if (seen) "duplicate"
              else {
                seen = true
                if (r.predicted != "en") "language"
                else if (!r.qKeep) "quality"
                else "retained"
              }
            DocVerdict(r.doc_id, reason, reason == "retained")
          }
          st.update(seen)
          out.iterator
        })
  }
}
