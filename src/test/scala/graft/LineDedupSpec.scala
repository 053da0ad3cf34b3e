package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Line-level boilerplate dedup (the RefinedWeb-style line-wise pass,
  * arXiv:2306.01116 §3.3): invariants the row-level oracle can't express
  * — df semantics on a corpus with KNOWN line duplication (within-doc
  * repeats count once toward df but every instance is scrubbed), the
  * exact df cut boundary, order-preserving reassembly, and
  * normalization-insensitive line identity.
  */
class LineDedupSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  /** Known-duplication corpus (lineDfCut = 5):
    * - "shared footer" appears in docs 0-5 → df 6, boilerplate.
    *   Doc 5 carries it twice: verbatim AND as a whitespace/case variant
    *   that normalizes to the same identity.
    * - "rare note" appears in docs 0-3 → df 4, below the cut, kept.
    * - each doc has a unique body line, df 1.
    */
  private def corpus = {
    import spark.implicits._
    val docs = (0L to 5L).map { id =>
      val base = Seq(s"body of doc $id", "shared footer")
      val withRare = if (id <= 3) "rare note" +: base else base
      val lines = if (id == 5) withRare ++ Seq("  Shared   Footer ") else withRare
      (id, lines.mkString("\n"))
    }
    docs.toDF("doc_id", "text")
  }

  test("boilerplate set is df-cut exact, counting within-doc repeats once") {
    val rows = Dedup.boilerplateLinesFrom(corpus).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq === Seq(("shared footer", 6L)),
      s"expected exactly the df-6 footer (rare note df 4 is below the cut): ${rows.toSeq}")
  }

  test("scrub drops every instance of a boilerplate line, keeps order") {
    val out = Dedup.lineScrubFrom(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    // docs 0-3: 3 lines (rare, body, footer), 1 dropped
    for (id <- 0L to 3L) {
      val (_, nLines, nDropped, clean) = out(id.toInt)
      assert(nLines === 3L && nDropped === 1L)
      assert(clean === s"rare note\nbody of doc $id",
        s"doc $id clean text wrong: '$clean'")
    }
    // doc 4: 2 lines, footer dropped
    assert(out(4) === ((4L, 2L, 1L, "body of doc 4")))
    // doc 5: 3 lines, BOTH footer instances dropped — including the
    // whitespace/case variant, which normalizes to the same line identity
    assert(out(5) === ((5L, 3L, 2L, "body of doc 5")))
  }

  test("doc_share divides by the doc count of the input frame") {
    val share = Dedup.boilerplateLinesFrom(corpus).collect()(0).getDouble(2)
    assert(share === 1.0, s"footer is in all 6 docs, share must be 1.0: $share")
  }

  test("scrub matches a brute-force reference on randomized corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    // small line pool → some lines recur across many docs (df above the
    // cut), some stay rare; docs also repeat lines internally
    val pool = (0 until 9).map(i => s"line $i content")
    def norm(l: String) = l.trim.toLowerCase.replaceAll("\\s+", " ")
    for (trial <- 1 to 5) {
      val docs = (0 until 20).map { id =>
        val n = 2 + rnd.nextInt(6)
        (id.toLong, Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString("\n"))
      }
      // brute-force reference
      val df = docs.flatMap { case (id, t) =>
        t.split("\n", -1).map(norm).distinct.map(_ -> id)
      }.groupBy(_._1).map { case (l, xs) => l -> xs.size.toLong }
      val boiler = df.filter(_._2 >= Dedup.lineDfCut).keySet
      val want = docs.map { case (id, t) =>
        val ls = t.split("\n", -1)
        val kept = ls.filterNot(l => boiler(norm(l)))
        (id, ls.length.toLong, (ls.length - kept.length).toLong,
          kept.mkString("\n"))
      }.sortBy(_._1)
      val got = Dedup.lineScrubFrom(docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1)
      assert(got.toSeq === want.toSeq, s"trial $trial diverged")
      val gotBoiler = Dedup.boilerplateLinesFrom(docs.toDF("doc_id", "text"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(gotBoiler === df.filter(_._2 >= Dedup.lineDfCut),
        s"trial $trial boilerplate set diverged")
    }
  }

  test("incremental line-df merge == full recompute, and replays merge nothing") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // randomized corpora again: split at an arbitrary watermark, merge
    // the tail as a daily batch, compare against the full recompute
    val rnd = new scala.util.Random(20260814L)
    val pool = (0 until 9).map(i => s"line $i content")
    for (trial <- 1 to 5) {
      val docs = (0 until 24).map { id =>
        val n = 2 + rnd.nextInt(6)
        (id.toLong, Seq.fill(n)(pool(rnd.nextInt(pool.size))).mkString("\n"))
      }
      val wm = (6 + rnd.nextInt(12)).toLong
      val all = docs.toDF("doc_id", "text")
      val snap = all.where(col("doc_id") <= wm)
      val batch = all.where(col("doc_id") > wm)
      def stateMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val merged = Dedup.mergeLineDf(Dedup.lineDfStateOf(snap), wm, batch)
      // incremental state == full-corpus recompute, sub-threshold lines
      // included (the state must remember them)
      assert(stateMap(merged) === stateMap(Dedup.lineDfStateOf(all)),
        s"trial $trial merged state diverged from recompute")
      // replaying the same batch (at-least-once ingest) merges nothing:
      // the new watermark is the batch's max doc id
      val replayed = Dedup.mergeLineDf(merged, 23L, batch)
      assert(stateMap(replayed) === stateMap(merged),
        s"trial $trial replay was not a no-op")
      // a batch replayed against the ORIGINAL watermark would double
      // count — the guard is the watermark, so advancing it is part of
      // the merge contract (pin the failure mode the guard exists for)
      val unguarded = Dedup.mergeLineDf(merged, wm, batch)
      if (batch.count() > 0)
        assert(stateMap(unguarded) !== stateMap(merged),
          s"trial $trial expected the unguarded replay to double-count")
    }
  }
}
