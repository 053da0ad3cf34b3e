package graft

// The advise → maintain → re-route campaign at a given SF:
//   sbt "Test/runMain graft.AdviseProbe testdata/sf10"
//
// Measures the round-13 ledger's open promise ("the production answer to
// the sf10 fragmentation tax is rebucket") end to end, through the NEW
// advisory surface:
//   1. the router routes AROUND the fragmented gate index (measured);
//   2. Router.advise PREDICTS — from stored stats alone, before paying
//      for any rewrite — that maintain's planned rebucket flips the
//      route back (and prices both legs);
//   3. PostingsIndex.maintain runs the planned rebucket (timed);
//   4. the re-probed router takes the indexed leg and the query is
//      re-measured on it — prediction vs delivery, side by side.
// The postings rebucket is answer-preserving (r12: bit-identical), so
// running it on the shared lifecycle index is gate-safe. The IVF resize
// is NOT (probing 2 of 448 cells answers differently than 2 of 16), so
// the vector-side advisory is exercised on a scratch COPY of the index.
import org.apache.spark.sql.DataFrame

object AdviseProbe {
  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def copyTree(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      src.listFiles().foreach(f => copyTree(f, new java.io.File(dst, f.getName)))
    } else java.nio.file.Files.copy(src.toPath, dst.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("testdata/sf10")
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators._

    def runs(name: String, df: => DataFrame, n: Int = 2): Double = {
      val secs = (1 to n).map { _ => val (c, s) = time(df.count()); (c, s) }
      println(f"[advise] $name%-28s ${secs.map(_._2).min}%8.2f s  (rows ${secs.head._1})")
      secs.map(_._2).min
    }

    val pidx = PostingsIndex.ensureLifecycleIndex(spark, sf)
    val vidx = IvfIndex.ensureLifecycleIndex(spark, sf)

    println("== before: the index that exists ==")
    runs("bm25_topk(scan)", Retrieval.bm25Topk(spark, sf))
    runs("bm25_indexed", PostingsIndex.query(spark, pidx, Retrieval.queryTerms))
    runs("bm25_auto", Router.bm25AutoOn(spark, sf, pidx))

    println("== advise (stored stats only, nothing rewritten) ==")
    val before = Router.adviseOn(spark, pidx, vidx)
    before.foreach(a => println(s"[advise] ${a.render}"))
    val bmPredicted = before.find(_.family == "bm25").get

    println("== maintain: run the planned repair ==")
    val (log, mSec) = time(PostingsIndex.maintain(spark, pidx))
    println(f"[advise] maintain: $mSec%.1f s  ${log.mkString("; ")}")

    println("== after: prediction vs delivery ==")
    val after = Router.adviseOn(spark, pidx, vidx)
    after.foreach(a => println(s"[advise] ${a.render}"))
    val bmAfter = after.find(_.family == "bm25").get
    println(s"[advise] bm25 predicted=${bmPredicted.predicted.map(_.leg)} " +
      s"delivered=${bmAfter.current.leg} " +
      s"match=${bmPredicted.predicted.map(_.leg).contains(bmAfter.current.leg)}")
    runs("bm25_indexed(rebucketed)", PostingsIndex.query(spark, pidx, Retrieval.queryTerms))
    runs("bm25_auto(rebucketed)", Router.bm25AutoOn(spark, sf, pidx))
    runs("phrase_auto(rebucketed)", Router.phraseAutoOn(spark, sf, pidx))
    runs("hybrid_auto(rebucketed)", Router.hybridAutoOn(spark, sf, pidx, vidx))

    println("== vector side, on a scratch copy (resize changes answers) ==")
    val vcopy = s"/tmp/graft_advise_vidx_${System.nanoTime()}"
    copyTree(new java.io.File(vidx), new java.io.File(vcopy))
    val annBefore = Router.adviseOn(spark, pidx, vcopy).find(_.family == "ann").get
    println(s"[advise] ${annBefore.render}")
    // probed candidate rows per query at matched nProbe=2: the ~sqrt(n)
    // I/O claim, measured as the largest-2-cell upper bound
    def probedRows(idx: String): Long =
      spark.read.parquet(s"$idx/members")
        .groupBy("cell").count().collect().map(_.getLong(1))
        .sorted.reverse.take(2).sum
    val qb = IvfIndex.queryBatch(spark, sf).localCheckpoint()
    val rowsBefore = probedRows(vcopy)
    runs("ann_indexed(16 cells)", IvfIndex.query(spark, vcopy, qb, nProbe = 2, k = 5))
    val (vlog, vSec) = time(IvfIndex.maintain(spark, vcopy, lloydRounds = 0))
    println(f"[advise] ivf maintain: $vSec%.1f s  ${vlog.mkString("; ")}")
    val annAfter = Router.adviseOn(spark, pidx, vcopy).find(_.family == "ann").get
    println(s"[advise] ${annAfter.render}")
    runs("ann_indexed(resized)", IvfIndex.query(spark, vcopy, qb, nProbe = 2, k = 5))
    println(s"[advise] probed-rows/query (top-2-cell bound): " +
      s"$rowsBefore -> ${probedRows(vcopy)}")
    TestFs.rmTree(new java.io.File(vcopy))
    spark.stop()
  }
}
