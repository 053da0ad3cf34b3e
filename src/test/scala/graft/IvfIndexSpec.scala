package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{IvfIndex, Similarity}
import graft.sources.Corpus

/** Persisted IVF index: build-once/query-many must return exactly the
  * inline `ann_ivf` results, and the query must read ONLY probed cells —
  * dynamic partition pruning on the cell-partitioned members table.
  */
class IvfIndexSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private lazy val spark: SparkSession = SparkTestSession.spark

  test("indexed query == inline ann_ivf; members scan is DPP-pruned to probed cells") {
    val idx = s"/tmp/graft_ivf_${System.nanoTime()}"
    val (cells, vectors) = IvfIndex.build(spark, sf, idx, nCells = 16)
    assert(vectors === Corpus.embeddings(spark, sf).count())
    assert(cells > 1 && cells <= 16)

    // same query batch as the inline operator: the first 10 corpus vectors
    val queries = Corpus.embeddings(spark, sf)
      .where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val got = IvfIndex.query(spark, idx, queries, nProbe = 2, k = 5)

    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val gotSet = got.collect().map(key).toSet
    val wantSet = Similarity.annIvf(spark, sf).collect().map(key).toSet
    assert(gotSet === wantSet, "indexed results diverge from inline ann_ivf")
    assert(gotSet.nonEmpty)

    // the layout guarantee: the members scan carries a dynamic-pruning
    // partition filter fed by the broadcast probe list
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"members scan not DPP-pruned:\n$plan")

    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(idx), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(idx), true)
  }
}
