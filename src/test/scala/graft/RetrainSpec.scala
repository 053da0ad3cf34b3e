package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfIndex

/** Quantizer re-training contracts (round-10 verdict, Missing #1):
  *
  *  1. drift decay + recovery — an index whose appends come from a
  *     distribution the build sample never saw loses probed-cell recall
  *     (the frozen quantizer scatters each drifted cluster across cells);
  *     `retrain(lloydRounds > 0)` re-fits the quantizer on the LIVE
  *     members and recall recovers;
  *  2. fresh-build equality — `retrain(lloydRounds = 0)` leaves the index
  *     bit-equal to a from-scratch [[IvfIndex.buildFrom]] over the
  *     surviving corpus, table for table (centroids, codebook, members);
  *  3. takedowns survive — the `deleted/` tombstones still block a
  *     replayed ingest after the migration.
  */
class RetrainSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** 64-dim synthetic vectors: id belongs to cluster `axis(id)`, its
    * vector is that axis direction plus small deterministic jitter —
    * tight clusters whose true neighbors are their cluster-mates. */
  private def vecs(ids: Seq[Long], axisOf: Long => Int): DataFrame = {
    import spark.implicits._
    ids.map { id =>
      val a = axisOf(id)
      val v = Array.tabulate(64) { d =>
        (if (d == a) 1.0 else 0.0) + 0.02 * (((id * 31 + d * 7) % 11).toDouble / 11.0)
      }
      (id, v.toSeq)
    }.toDF("vec_id", "embedding")
  }

  /** Mean top-`k` recall of the index query vs exact cosine over the
    * live corpus, for the given query vectors. */
  private def recallOf(
      idx: String, queries: DataFrame, corpus: DataFrame, k: Int): Double = {
    val got = IvfIndex.query(spark, idx, queries, nProbe = 2, k = k)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val c = corpus.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < 64) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = queries.collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val recalls = q.map { case (qid, qv) =>
      val truth = c.filter(_._1 != qid)
        .map { case (id, v) => (id, cos(qv, v)) }
        .sortBy { case (id, s) => (-s, id) }.take(k).map(_._1).toSet
      val hit = got.getOrElse(qid, Set.empty)
      truth.intersect(hit).size.toDouble / k
    }
    recalls.sum / recalls.length
  }

  test("drifted appends decay probed-cell recall; lloyd retrain recovers it; tombstones survive") {
    import spark.implicits._
    val idx = tmpDir("graft_retrain_drift")
    // region A: 16 tight clusters on axes 0..15, ids 0..79
    val regionA = vecs(0L until 80L, id => (id % 16).toInt)
    IvfIndex.buildFrom(spark, regionA, idx, nCells = 16)
    // region B drift: 8 NEW clusters on axes 32..39, ids 1000..1099 —
    // near-orthogonal to every build-time centroid, so the frozen
    // quantizer assigns them by jitter noise and cluster-mates scatter
    val regionB = vecs(1000L until 1100L, id => 32 + (id % 8).toInt)
    IvfIndex.append(spark, idx, regionB)
    // region A expires (the takedown/retention path)
    IvfIndex.delete(spark, idx,
      regionA.select(col("vec_id")))
    val live = regionB

    val queries = vecs(2000L until 2010L, id => 32 + (id % 8).toInt)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    val before = recallOf(idx, queries, live, k = 5)
    val (cellsRewritten, _) =
      IvfIndex.retrain(spark, idx, nCells = 16, lloydRounds = 5)
    val after = recallOf(idx, queries, live, k = 5)
    assert(cellsRewritten > 0, "drifted index should migrate cells")
    assert(after > before,
      s"retrain must recover recall: before=$before after=$after")
    assert(after >= 0.9, s"post-retrain recall too low: $after")
    assert(before <= 0.6, s"drift scenario not degraded enough: $before")

    // the tombstones survived the migration: a replayed region-A ingest
    // re-admits nothing
    IvfIndex.append(spark, idx, regionA)
    val ids = spark.read.parquet(s"$idx/members").select(col("vec_id"))
      .collect().map(_.getLong(0)).toSet
    assert(ids === (1000L until 1100L).toSet,
      "a replayed ingest resurrected deleted ids after retrain")
  }

  test("retrain(lloydRounds = 0) leaves the index bit-equal to a fresh build over survivors") {
    import spark.implicits._
    val idx = tmpDir("graft_retrain_eq")
    val freshIdx = tmpDir("graft_retrain_fresh")
    val a = vecs(0L until 60L, id => (id % 16).toInt)
    val b = vecs(60L until 100L, id => 16 + (id % 16).toInt)
    IvfIndex.buildFrom(spark, a, idx, nCells = 16)
    IvfIndex.append(spark, idx, b)
    // expire a prefix slice including some of the build-time sample ids
    val expired = (0L until 30L).filter(_ % 3 != 2)
    IvfIndex.delete(spark, idx, expired.toDF("vec_id"))
    IvfIndex.retrain(spark, idx, nCells = 16, lloydRounds = 0)

    val survivors = a.unionByName(b)
      .where(!col("vec_id").isin(expired.map(java.lang.Long.valueOf): _*))
    IvfIndex.buildFrom(spark, survivors, freshIdx, nCells = 16)

    def table(dir: String, t: String, cols: Seq[String]): Seq[String] =
      spark.read.parquet(s"$dir/$t").select(cols.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    for ((t, cols) <- Seq(
        "centroids" -> Seq("cid", "cv", "cn"),
        "codebook" -> Seq("cid", "cv"),
        "members" -> Seq("vec_id", "v", "nrm", "codes", "cell"))) {
      assert(table(idx, t, cols) === table(freshIdx, t, cols),
        s"$t diverged from the fresh build")
    }
    // idempotent: a replayed retrain rewrites nothing
    assert(IvfIndex.retrain(spark, idx, nCells = 16, lloydRounds = 0) ===
      ((0L, 0L)))
  }

  /** Mean top-`k` agreement of the ADC candidate path ([[IvfIndex
    * .queryPq]]) with the exact probed-cell scorer ([[IvfIndex.query]])
    * on the SAME index — isolates codebook quality from quantizer
    * recall: both paths share the probe tree, so any divergence is ADC
    * candidate selection ranking the wrong nCand rows. */
  private def adcAgreement(idx: String, queries: DataFrame, k: Int): Double = {
    def topk(df: DataFrame): Map[Long, Set[Long]] =
      df.collect().map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = topk(IvfIndex.query(spark, idx, queries, nProbe = 2, k = k))
    val adc = topk(IvfIndex.queryPq(spark, idx, queries, nProbe = 2, k = k))
    val per = exact.map { case (qid, want) =>
      want.intersect(adc.getOrElse(qid, Set.empty)).size.toDouble / k
    }
    per.sum / per.size
  }

  /** Mean PQ reconstruction error of the standing index: avg over
    * (member, subspace) of the min squared subspace distance to the
    * codebook — the PQ training objective, and the quantity that sets
    * ADC candidate quality at production cell sizes (at toy SF the exact
    * re-rank plus nCand-sized cells saturate end-to-end agreement at ANY
    * codebook fit, so the error is the honest measurable). */
  private def pqQuantError(idx: String): Double = {
    val cb = spark.read.parquet(s"$idx/codebook")
    val en = spark.read.parquet(s"$idx/members").select(col("vec_id"),
      transform(col("v"), x => x / col("nrm")).as("nv"))
    graft.operators.Similarity.pqCells(en, "vec_id", cb)
      .groupBy(col("vec_id"), col("m")).agg(min(col("d2")).as("d"))
      .agg(avg(col("d"))).collect()(0).getDouble(0)
  }

  test("drift decays the PQ codebook fit; the adaptive re-fit recovers it without hurting ADC selection") {
    val idx = tmpDir("graft_retrain_adc")
    // region A holds the smallest ids — under the old codebook rule a
    // retrain would re-fit PQ from exactly these pre-drift vectors
    val regionA = vecs(0L until 80L, id => (id % 16).toInt)
    IvfIndex.buildFrom(spark, regionA, idx, nCells = 16)
    // drifted region B stays ALONGSIDE region A (nothing expires): the
    // smallest live ids remain pre-drift, the worst case for an
    // id-anchored codebook — its entries cannot express region B's
    // subspace structure, so every drifted member quantizes to noise
    val regionB = vecs(1000L until 1600L, id => 32 + (id % 8).toInt)
    IvfIndex.append(spark, idx, regionB)
    val queries = vecs(2000L until 2010L, id => 32 + (id % 8).toInt)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    val errBefore = pqQuantError(idx)
    val agreeBefore = adcAgreement(idx, queries, k = 5)
    IvfIndex.retrain(spark, idx, nCells = 16, lloydRounds = 5)
    val errAfter = pqQuantError(idx)
    val agreeAfter = adcAgreement(idx, queries, k = 5)
    info(s"PQ reconstruction error: before=$errBefore after=$errAfter; " +
      s"ADC agreement: before=$agreeBefore after=$agreeAfter")
    assert(errAfter < errBefore * 0.5,
      s"adaptive codebook must follow the drifted distribution: " +
        s"before=$errBefore after=$errAfter")
    assert(agreeAfter >= agreeBefore,
      s"codebook re-fit must not hurt end-to-end ADC selection: " +
        s"before=$agreeBefore after=$agreeAfter")
  }

  test("a torn retrain converges on replay from every crash window; queries quiesce until then") {
    import java.io.File
    import java.nio.file.Files
    import TestFs.{copyTree, rmTree => rm}
    // three identical drifted indexes: R = reference (clean retrain),
    // X = crash mid-swap, Y = crash between the table writes and staging
    val dirs = Seq("ref", "midswap", "pretables").map(n => tmpDir(s"graft_torn_$n"))
    val (r, x, y) = (dirs(0), dirs(1), dirs(2))
    val regionA = vecs(0L until 80L, id => (id % 16).toInt)
    val regionB = vecs(1000L until 1100L, id => 32 + (id % 8).toInt)
    dirs.foreach { d =>
      IvfIndex.buildFrom(spark, regionA, d, nCells = 16)
      IvfIndex.append(spark, d, regionB)
    }
    val (cellsMoved, _) = IvfIndex.retrain(spark, r, nCells = 16, lloydRounds = 3)
    assert(cellsMoved > 0, "the drift scenario must migrate cells")

    def table(dir: String, t: String, cols: Seq[String]): Seq[String] =
      spark.read.parquet(s"$dir/$t").select(cols.map(col): _*)
        .collect().map(_.toString).sorted.toSeq
    def assertConverged(victim: String): Unit = {
      for ((t, cols) <- Seq(
          "centroids" -> Seq("cid", "cv", "cn"),
          "codebook" -> Seq("cid", "cv"),
          "members" -> Seq("vec_id", "v", "nrm", "codes", "cell")))
        assert(table(victim, t, cols) === table(r, t, cols),
          s"$t diverged from the clean retrain after replay")
      assert(!new File(s"$victim/_GRAFT_RETRAIN_INPROGRESS").exists())
      assert(!new File(s"$victim/members.retrain").exists())
    }

    // Y: crash AFTER the quantizer/codebook writes, BEFORE staging — new
    // tables over the old layout, marker standing
    copyTree(new File(s"$r/centroids"), { rm(new File(s"$y/centroids")); new File(s"$y/centroids") })
    copyTree(new File(s"$r/codebook"), { rm(new File(s"$y/codebook")); new File(s"$y/codebook") })
    assert(new File(s"$y/_GRAFT_RETRAIN_INPROGRESS").createNewFile())
    val qs = vecs(2000L until 2005L, id => 32 + (id % 8).toInt)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    intercept[IllegalArgumentException] { IvfIndex.query(spark, y, qs) }
    IvfIndex.retrain(spark, y, nCells = 16, lloydRounds = 3)
    assertConverged(y)

    // X: crash MID-SWAP — staging fully committed (manifest + marker),
    // some cells already renamed in, others not. Build the committed
    // staging from the reference's post-retrain members, then swap only
    // the first staged cell before "dying".
    copyTree(new File(s"$r/centroids"), { rm(new File(s"$x/centroids")); new File(s"$x/centroids") })
    copyTree(new File(s"$r/codebook"), { rm(new File(s"$x/codebook")); new File(s"$x/codebook") })
    val staging = new File(s"$x/members.retrain")
    Files.createDirectories(staging.toPath)
    val rCells = new File(s"$r/members").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.getName.stripPrefix("cell=").toInt).sorted
    rCells.foreach(c => copyTree(new File(s"$r/members/cell=$c"),
      new File(staging, s"cell=$c")))
    val xCells = new File(s"$x/members").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.getName.stripPrefix("cell=").toInt)
    val emptied = xCells.toSet -- rCells.toSet
    val mf = new java.io.PrintWriter(new File(staging, "_GRAFT_SWAP"), "UTF-8")
    mf.println(rCells.mkString(",")); mf.println(emptied.toSeq.sorted.mkString(","))
    mf.close()
    assert(new File(staging, "_GRAFT_STAGED").createNewFile())
    assert(new File(s"$x/_GRAFT_RETRAIN_INPROGRESS").createNewFile())
    // partial swap: first staged cell renamed in, then the crash
    val c0 = rCells.head
    rm(new File(s"$x/members/cell=$c0"))
    assert(new File(staging, s"cell=$c0").renameTo(new File(s"$x/members/cell=$c0")))
    intercept[IllegalArgumentException] { IvfIndex.query(spark, x, qs) }
    assert(IvfIndex.retrain(spark, x, nCells = 16, lloydRounds = 3) === ((0L, 0L)),
      "the replay must roll the committed swap forward, then find nothing to redo")
    assertConverged(x)
  }

  test("maintain detects drift by assignment-fit decay, retrains, and then reports healthy") {
    import spark.implicits._
    val idx = tmpDir("graft_ivf_maintain")
    // the proven drift-decay corpus (first test of this spec): region A
    // builds the quantizer, drifted region B lands under it, region A
    // expires — the standing members' own-cell cosine collapses to
    // jitter (the fit detector's signal) and probed-cell recall decays
    val regionA = vecs(0L until 80L, id => (id % 16).toInt)
    IvfIndex.buildFrom(spark, regionA, idx, nCells = 16)
    val regionB = vecs(1000L until 1100L, id => 32 + (id % 8).toInt)
    IvfIndex.append(spark, idx, regionB)
    IvfIndex.delete(spark, idx, regionA.select(col("vec_id")))
    val queries = vecs(2000L until 2010L, id => 32 + (id % 8).toInt)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    val before = recallOf(idx, queries, regionB, k = 5)
    val actions = IvfIndex.maintain(spark, idx)
    assert(actions.exists(_.startsWith("retrain:")),
      s"a drift-degraded assignment fit must trigger the adaptive retrain: $actions")
    val after = recallOf(idx, queries, regionB, k = 5)
    info(s"recall before=$before after=$after; actions=$actions")
    assert(before <= 0.6, s"drift scenario not degraded enough: $before")
    assert(after >= 0.9, s"maintenance must recover recall: $before -> $after")
    // the re-fit index reports healthy
    assert(IvfIndex.maintain(spark, idx) === Seq.empty)

    // a crashed retrain leaves the quiesce marker standing even when
    // the tables happen to be consistent (fit healthy) — the repair
    // entry point must REPLAY it, not report a permanently-quiesced
    // index as healthy
    assert(new java.io.File(s"$idx/_GRAFT_RETRAIN_INPROGRESS").createNewFile())
    intercept[IllegalArgumentException] { IvfIndex.query(spark, idx, queries) }
    val replay = IvfIndex.maintain(spark, idx)
    assert(replay.exists(_.startsWith("retrain-replay:")),
      s"maintain must roll a crashed retrain forward: $replay")
    assert(!new java.io.File(s"$idx/_GRAFT_RETRAIN_INPROGRESS").exists())
    assert(recallOf(idx, queries, regionB, k = 5) >= 0.9,
      "the replayed index must serve correctly")
  }

  /** nProbe·nVec/nCells — the indexed path's per-query candidate I/O. */
  private def probedRowsPerQuery(idx: String, nProbe: Int = 2): Double = {
    val nVec = spark.read.parquet(s"$idx/members").count().toDouble
    val nCells = spark.read.parquet(s"$idx/centroids").count().toDouble
    nProbe * nVec / nCells
  }

  test("maintain resizes an under-partitioned index to ~sqrt(n) cells: recall recovers, probed rows/query drop ~4x") {
    val idx = tmpDir("graft_ivf_resize")
    // built when the corpus was small (45 vectors, 16 cells — in band),
    // then grown 100× under the frozen quantizer and count. 64 true
    // clusters; the 16 build-time centroids cover only clusters 0..15,
    // so the growth's other 48 clusters scatter by jitter — AND every
    // probed cell is 1/16 of a 100×-bigger members table.
    IvfIndex.buildFrom(spark, vecs(0L until 45L, id => (id % 64).toInt),
      idx, nCells = 16)
    IvfIndex.append(spark, idx, vecs(45L until 4500L, id => (id % 64).toInt))
    val corpus = vecs(0L until 4500L, id => (id % 64).toInt)
    val queries = vecs(10000L until 10010L, id => (id % 64).toInt)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    val before = recallOf(idx, queries, corpus, k = 5)
    val rowsBefore = probedRowsPerQuery(idx)
    val actions = IvfIndex.maintain(spark, idx)
    assert(actions.exists(_.startsWith("resize:")),
      s"an out-of-band cell count must trigger the resize: $actions")
    val nCellsAfter = spark.read.parquet(s"$idx/centroids").count()
    assert(nCellsAfter === IvfIndex.targetCells(4500L).toLong,
      "the resize must land on the sqrt(n) target")
    val after = recallOf(idx, queries, corpus, k = 5)
    val rowsAfter = probedRowsPerQuery(idx)
    info(f"recall $before%.2f -> $after%.2f; probed rows/query " +
      f"$rowsBefore%.0f -> $rowsAfter%.0f")
    assert(rowsAfter * 3 <= rowsBefore,
      "per-query candidate I/O must drop ~nCellsNew/nCellsOld")
    assert(after >= before - 0.05 && after >= 0.9,
      s"recall must be preserved (and here recovered): $before -> $after")
    // the resized index is in band and freshly fit: healthy
    assert(IvfIndex.maintain(spark, idx) === Seq.empty)
  }

  test("the drift floor self-calibrates to the embedding space: a DIFFUSE healthy space below the old absolute 0.7 stays untouched") {
    // every vector: its cluster axis + noise of comparable magnitude —
    // a space whose HEALTHY own-cell cosine sits ~0.5-0.65. The legacy
    // absolute floor (0.7) would re-train this index forever, each pass
    // finding the same "bad" fit; the fitstats-calibrated floor
    // (relFitFloor x fit-at-build) reports it healthy.
    import spark.implicits._
    val diffuse = (0L until 160L).map { id =>
      val a = (id % 16).toInt
      val v = Array.tabulate(64) { d =>
        (if (d == a) 1.0 else 0.0) +
          0.44 * ((((id + 3) * 131 + d * 17) % 13).toDouble / 13.0 - 0.5)
      }
      (id, v.toSeq)
    }.toDF("vec_id", "embedding")
    val idx = tmpDir("graft_ivf_diffuse")
    IvfIndex.buildFrom(spark, diffuse, idx, nCells = 16)
    val fit = IvfIndex.assignmentFit(spark, idx)
    assert(fit < 0.7 && fit > 0.3,
      s"test corpus must sit below the legacy absolute floor: $fit")
    // self-calibrating default: healthy — no retrain
    val auto = IvfIndex.maintain(spark, idx)
    assert(!auto.exists(_.startsWith("retrain")),
      s"a healthy diffuse space must not re-train under the " +
        s"self-calibrated floor: $auto")
    // the documented footgun, still available explicitly: an absolute
    // 0.7 floor re-trains it (and would again every pass)
    val pinned = IvfIndex.maintain(spark, idx, minFit = 0.7)
    assert(pinned.exists(_.startsWith("retrain")),
      s"an explicit absolute floor above the space's healthy fit " +
        s"re-trains: $pinned")
  }

  test("build, query, and both retrain modes survive vec_ids above Int.MaxValue") {
    // the 100 TB posture: after heavy retention deletion the smallest
    // LIVE ids can be arbitrarily large — the dense-cid re-keying (not
    // the raw vec_id) is what keeps the int cell cast safe, and the
    // lloyd sample hash must not overflow a long under ANSI
    val idx = tmpDir("graft_retrain_bigid")
    val base = 3_000_000_000L // > Int.MaxValue
    val vs = vecs(base until (base + 64L), id => (id % 16).toInt)
    IvfIndex.buildFrom(spark, vs, idx, nCells = 16)
    val queries = vecs(9_000_000_000L until 9_000_000_005L, id => (id % 16).toInt)
      .select(org.apache.spark.sql.functions.col("vec_id").as("query_id"),
        org.apache.spark.sql.functions.col("embedding").as("qv"))
    assert(IvfIndex.query(spark, idx, queries, nProbe = 2, k = 3)
      .collect().length === 15, "5 queries x top-3")
    assert(IvfIndex.retrain(spark, idx, nCells = 16, lloydRounds = 0) ===
      ((0L, 0L)), "same sample -> same quantizer -> no-op")
    val (cells, _) = IvfIndex.retrain(spark, idx, nCells = 8, lloydRounds = 2)
    assert(cells > 0, "k change must migrate cells")
    assert(IvfIndex.query(spark, idx, queries, nProbe = 2, k = 3)
      .collect().length === 15, "index serves after big-id lloyd retrain")
  }
}
