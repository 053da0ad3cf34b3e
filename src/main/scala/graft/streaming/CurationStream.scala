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
  * equivalence spec pins both against the batch operator.
  *
  * Plan shape, chosen for where the CPU goes: only the FINGERPRINT (one
  * normalization regex + md5) is computed before the key shuffle — it has
  * to be, it IS the key. The expensive signals (5 language-marker
  * `regexp_count`s + the 3-regex quality score) run AFTER
  * flatMapGroupsWithState, i.e. parallel across all state partitions
  * rather than serialized on however few partitions the source hands us,
  * and inside a CaseWhen whose first branch is the duplicate verdict —
  * codegen short-circuits, so duplicates (a large fraction of any real
  * crawl) never pay the language/quality regex at all. The price is that
  * `text` rides through the key exchange (~the doc's own bytes) instead
  * of two booleans; at ~15 regex-microseconds-per-100-chars vs
  * ~wire-nanoseconds-per-byte, compute dominates shuffle by orders of
  * magnitude, and the state store still holds only the boolean. */
object CurationStream {

  final case class DocVerdict(doc_id: Long, reason: String, retained: Boolean)

  // NOT private: Spark's generated row deserializer must access the class
  final case class FpDoc(doc_id: Long, fingerprint: String, text: String)
  final case class Flag(doc_id: Long, text: String, dup: Boolean)

  def retention(docs: DataFrame): Dataset[DocVerdict] = {
    val s = docs.sparkSession
    import s.implicits._
    val keyed = docs.select(col("doc_id"),
        TextAnalysis.fingerprintCol(col("text")).as("fingerprint"),
        col("text"))
      .as[FpDoc]
    val flagged = keyed.groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[FpDoc], st: GroupState[Boolean]) => {
          var seen = st.getOption.getOrElse(false)
          // doc_id order: the per-(batch, fingerprint) group is a handful
          // of rows, and sorting makes the winner deterministic
          val out = rows.toVector.sortBy(_.doc_id).map { r =>
            val dup = seen
            seen = true
            Flag(r.doc_id, r.text, dup)
          }
          st.update(seen)
          out.iterator
        })
    // verdict precedence as one short-circuiting CaseWhen: winners fall
    // through to the language/quality regexes, duplicates exit at the
    // first branch without evaluating them
    val reason = when(col("dup"), "duplicate")
      .when(TextAnalysis.predictedLang(col("text")) =!= "en", "language")
      .when(TextAnalysis.qualityScore10(col("text")) < TextAnalysis.qualityKeepCut,
        "quality")
      .otherwise("retained")
    flagged.select(col("doc_id"), reason.as("reason"),
        (reason === "retained").as("retained"))
      .as[DocVerdict]
  }
}
