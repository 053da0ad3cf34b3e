package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TextAnalysis
import graft.streaming.{CurationStream, StreamingBench}

/** Attribution probe for the `curation` streaming leg: where do the
  * ~185 µs/event go, and what does moving the language/quality regexes
  * BEHIND the key shuffle buy?
  *
  * Layers (same synthetic docs as the bench leg):
  *  - `passthrough`   — harness + row decode only
  *  - `fponly`        — + fingerprint regex/md5 (the pre-shuffle work the
  *                       restructured operator keeps at the source)
  *  - `allsignals`    — + the 5 lang-marker regexp_counts and the 3-regex
  *                       quality score, all STATELESS PRE-SHUFFLE (the
  *                       old operator's placement; MemoryStream hands the
  *                       whole batch to ONE partition, so this is the
  *                       single-core regex floor)
  *  - `oldshape`      — the pre-restructure operator verbatim: all
  *                       signals pre-shuffle, then the state verdict
  *  - `retention`     — the shipped operator: fingerprint pre-shuffle,
  *                       signals post-shuffle inside a short-circuiting
  *                       CaseWhen (duplicates skip them)
  */
object CurationProbe {

  final case class Sig(
      doc_id: Long, fingerprint: String, predicted: String, qKeep: Boolean)
  final case class Verdict(doc_id: Long, reason: String, retained: Boolean)

  /** The r10 pre-restructure operator, kept verbatim for comparison. */
  private def oldRetention(docs: DataFrame): Dataset[Verdict] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("doc_id"),
        TextAnalysis.fingerprintCol(col("text")).as("fingerprint"),
        TextAnalysis.predictedLang(col("text")).as("predicted"),
        (TextAnalysis.qualityScore10(col("text")) >= TextAnalysis.qualityKeepCut)
          .as("qKeep"))
      .as[Sig]
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: String, rows: Iterator[Sig], st: GroupState[Boolean]) => {
          var seen = st.getOption.getOrElse(false)
          val out = rows.toVector.sortBy(_.doc_id).map { r =>
            val reason =
              if (seen) "duplicate"
              else {
                seen = true
                if (r.predicted != "en") "language"
                else if (!r.qKeep) "quality"
                else "retained"
              }
            Verdict(r.doc_id, reason, reason == "retained")
          }
          st.update(seen)
          out.iterator
        })
  }

  def main(args: Array[String]): Unit = {
    val batches = args.lift(0).map(_.toInt).getOrElse(5)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(30000)
    val spark = GraftSession.local(args.lift(2).getOrElse("32"))
    spark.conf.set("spark.sql.shuffle.partitions",
      spark.sparkContext.defaultParallelism.toString)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // the bench leg's docs: every 10th a planted duplicate
    def docOf(g: Long): (Long, String) = {
      val src = if (g % 10 == 9) g - 9 else g
      (g, (0 until 25).map(j => s"w${(src * 31 + j * 7) % 997}").mkString(" "))
    }

    Seq[(String, Dataset[(Long, String)] => DataFrame)](
      "passthrough" -> (ds => ds.toDF("doc_id", "text").select("doc_id").toDF()),
      "fponly" -> (ds => ds.toDF("doc_id", "text").select(col("doc_id"),
        TextAnalysis.fingerprintCol(col("text")).as("fingerprint"))),
      "allsignals" -> (ds => ds.toDF("doc_id", "text").select(col("doc_id"),
        TextAnalysis.fingerprintCol(col("text")).as("fingerprint"),
        TextAnalysis.predictedLang(col("text")).as("predicted"),
        (TextAnalysis.qualityScore10(col("text")) >= TextAnalysis.qualityKeepCut)
          .as("qKeep"))),
      "oldshape" -> (ds => oldRetention(ds.toDF("doc_id", "text")).toDF()),
      "retention" -> (ds => CurationStream.retention(ds.toDF("doc_id", "text")).toDF())
    ).foreach { case (name, mk) =>
      (1 to 2).foreach { rep =>
        val (events, sec) = StreamingBench.throughputOf[(Long, String)](spark,
          mk, (b, per) => (0 until per).map(i => docOf(b.toLong * per + i)),
          "append", s"graft_curprobe_${name}_$rep", batches, perBatch)
        println(f"[probe] $name rep=$rep events=$events sec=$sec%.2f rate=${events / sec / 1000}%.2fk ev/s")
      }
    }
    spark.stop()
  }
}
