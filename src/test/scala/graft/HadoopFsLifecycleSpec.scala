package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{HadoopFs, IndexFs, IvfIndex, PostingsIndex}

/** The persisted-index LIFECYCLES parameterized over the [[IndexFs]]
  * binding (verdict r14 Next #4, second half): the contract spec proves
  * call-for-call semantics; this spec proves the PROTOCOLS — markers,
  * mutation journal, whole-tree rebucket swap, retrain quiesce bracket,
  * version stamps — produce an identical index when every IndexFs call
  * goes through the Hadoop delegation instead of `java.io.File`. Spark
  * keeps reading/writing the same local parquet paths; only the seam's
  * binding changes ([[IndexFs.localBindingOverride]]), which is exactly
  * the deployment shape: parquet IO through Spark's Hadoop layer,
  * lifecycle control files through this binding. */
class HadoopFsLifecycleSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkTestSession.spark

  private def rawLocalConf() = {
    val c = new org.apache.hadoop.conf.Configuration()
    c.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    c.setBoolean("fs.file.impl.disable.cache", true)
    c
  }

  private def withHadoopBinding[T](f: => T): T = {
    IndexFs.localBindingOverride = Some(new HadoopFs(() => rawLocalConf()))
    try f finally IndexFs.localBindingOverride = None
  }

  // one doc per 256-doc superblock at superBits=2: fragmented enough
  // that maintain's rebucket (the whole-tree swap) actually fires
  private def fragmentedDocs: DataFrame = {
    import spark.implicits._
    (0L to 40L).map(i => (i * 256L, s"alpha beta doc$i spark"))
      .toDF("doc_id", "text")
  }

  test("postings lifecycle (build -> append -> rebucket swap -> query) through the Hadoop binding == LocalFs") {
    import spark.implicits._
    def lifecycle(idx: String): (Long, Long, Seq[(Long, Double)]) = {
      PostingsIndex.buildFrom(spark, fragmentedDocs, idx, superBits = 2)
      PostingsIndex.append(spark, idx,
        (41L to 45L).map(i => (i * 256L, s"alpha beta doc$i spark"))
          .toDF("doc_id", "text"))
      val actions = PostingsIndex.maintain(spark, idx, targetSbs = 2)
      assert(actions.exists(_.startsWith("rebucket")),
        s"the whole-tree swap must actually run: $actions")
      (spark.read.parquet(s"$idx/meta").collect().head.getLong(0),
        spark.read.parquet(s"$idx/blockstats").count(),
        PostingsIndex.queryWand(spark, idx, Seq("alpha", "spark"), 10)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    }
    val (bitsL, sbsL, topL) =
      lifecycle(s"/tmp/graft_hfs_pidx_local_${System.nanoTime()}")
    val (bitsH, sbsH, topH) = withHadoopBinding {
      lifecycle(s"/tmp/graft_hfs_pidx_hadoop_${System.nanoTime()}")
    }
    assert(bitsH === bitsL, "rebucketed superBits must match")
    assert(sbsH === sbsL, "post-swap superblock count must match")
    assert(topH === topL, "WAND rankings through the swapped tree must match")
  }

  private def axisVecs(ids: Seq[Long]): Seq[(Long, Seq[Double])] =
    ids.map { id =>
      (id, Array.tabulate(64)(d =>
        (if (d == (id % 16).toInt) 1.0 else 0.0) +
          0.02 * (((id * 31 + d * 7) % 11).toDouble / 11.0)).toSeq)
    }

  test("ivf lifecycle (build -> resize retrain swap -> query) through the Hadoop binding == LocalFs") {
    import spark.implicits._
    val queries = axisVecs(0L until 8L)
      .toDF("vec_id", "embedding")
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def lifecycle(idx: String): (Long, Set[(Long, Long)]) = {
      IvfIndex.buildFrom(spark,
        axisVecs(0L until 500L).toDF("vec_id", "embedding"), idx, nCells = 4)
      // resize = retrain: quiesce marker, mutation journal, per-cell
      // swap, version bump — the full protocol through the binding
      val actions = IvfIndex.maintain(spark, idx, lloydRounds = 0)
      assert(actions.exists(_.startsWith("resize:")),
        s"the retrain swap must actually run: $actions")
      (IvfIndex.standingCells(idx).toLong,
        IvfIndex.query(spark, idx, queries, nProbe = 2, k = 3)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
    val (cellsL, topL) =
      lifecycle(s"/tmp/graft_hfs_vidx_local_${System.nanoTime()}")
    val (cellsH, topH) = withHadoopBinding {
      lifecycle(s"/tmp/graft_hfs_vidx_hadoop_${System.nanoTime()}")
    }
    assert(cellsH === cellsL, "post-resize cell count must match")
    assert(topH === topL, "probed neighbors through the retrained index must match")
  }
}
