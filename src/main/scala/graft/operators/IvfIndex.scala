package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions
import graft.sources.Corpus

/** Persisted IVF index: build once, query many — the piece [[Similarity]]'s
  * inline `ann_ivf` deliberately leaves out (its one-shot query re-derives
  * cells every run, the right shape for an oracle but not for production).
  *
  * At 100 TB the coarse quantizer is built ONCE, the corpus is written
  * clustered by cell, and every subsequent query batch reads only its
  * probed cells. Both halves map to first-class Spark machinery:
  *
  *  - `build` writes `members/` **partitioned by cell** (plus a k-row
  *    `centroids/` table). The cell is a DIRECTORY, not a column value —
  *    the listing itself is the inverted index.
  *  - `query` joins the members table to a broadcast probe list on the
  *    partition column, so Spark's dynamic partition pruning derives the
  *    probed-cell set at runtime and skips every other cell's files
  *    entirely (plan-asserted: `dynamicpruning` on the members scan).
  *    I/O per batch is `nProbe/nCells` of the corpus — same candidate-set
  *    arithmetic as the inline operator, now enforced by the layout.
  *
  * Semantics are pinned to the inline operator: same deterministic
  * first-k centroids, same (score, cid) argmax assignment, same probe
  * ordering and top-k epilogue — `IvfIndexSpec` asserts indexed results ==
  * `ann_ivf` row-for-row.
  */
object IvfIndex {

  private def vec(c: Column): Column = transform(c, x => x.cast("double"))
  private def dot(a: Column, b: Column): Column = VectorFunctions.dot(a, b)
  private def norm(a: Column): Column = sqrt(dot(a, a))

  /** Build the index under `indexDir`: `centroids/` (cid, cv, cn) and
    * `members/` (vec_id, v, nrm) partitioned by `cell`. Centroids are the
    * first `nCells` corpus vectors (the deterministic sample quantizer the
    * inline operator uses; swap for k-means centroids via
    * [[Similarity.kmeansAssign]] when cluster quality matters more than
    * reproducibility). Returns (cells written, vectors indexed). */
  def build(
      s: SparkSession,
      corpusDir: String,
      indexDir: String,
      nCells: Int = 16): (Long, Long) = {
    val e = Corpus.embeddings(s, corpusDir)
      .select(col("vec_id"), vec(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val cents = e.where(col("vec_id") < nCells)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    cents.coalesce(1).write.mode("overwrite").parquet(s"$indexDir/centroids")
    val bc = broadcast(s.read.parquet(s"$indexDir/centroids"))
    val assigned = e.crossJoin(bc)
      .select(col("vec_id"), col("v"), col("nrm"), col("cid"),
        (dot(col("v"), col("cv")) / (col("nrm") * col("cn"))).as("cscore"))
      .groupBy(col("vec_id"))
      .agg(first(col("v")).as("v"), first(col("nrm")).as("nrm"),
        max(struct(col("cscore"), col("cid"))).as("b"))
      // int cell: the partition-directory value reads back as an inferred
      // IntegerType column; writing int keeps the probe join cast-free so
      // dynamic partition pruning sees a bare partition-column key
      .select(col("vec_id"), col("v"), col("nrm"), col("b.cid").cast("int").as("cell"))
    assigned.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$indexDir/members")
    val m = s.read.parquet(s"$indexDir/members")
    (m.select(col("cell")).distinct().count(), m.count())
  }

  /** Oracle-gated query entry (`ann_ivf_indexed`): build-once/query-many
    * against the inline operator's constants and query batch, sharing
    * `ann_ivf`'s DuckDB oracle — bucketedJoinRevenue's amortization
    * discipline applied to the ANN index (the build is the pre-paid pass;
    * re-paying it every call would misstate steady-state query cost).
    * Done-ness is the index's _SUCCESS marker under a path keyed by the
    * corpus dir AND the embeddings file's (length, mtime), so a
    * driver-regenerated corpus can never serve a stale index. */
  def annIvfIndexed(s: SparkSession, dir: String): DataFrame = {
    val f = new java.io.File(s"$dir/embeddings.parquet")
    val tag = ((dir.hashCode.toLong * 31 + f.length()) * 31 + f.lastModified()) &
      0x7fffffffffffffffL
    val idx = s"/tmp/graft_ivf_${java.lang.Long.toHexString(tag)}"
    if (!new java.io.File(s"$idx/members/_SUCCESS").exists())
      build(s, dir, idx, nCells = 16)
    val queries = Corpus.embeddings(s, dir).where(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    query(s, idx, queries, nProbe = 2, k = 5)
  }

  /** Query the persisted index with a (query_id, qv: array<double>) batch:
    * probe the `nProbe` closest cells per query, exact-score within probed
    * cells only, return (query_id, rank, neighbor_id, sim) top-k. The
    * members scan is pruned to probed cells by dynamic partition pruning —
    * the broadcast probe join's build side feeds the partition filter. */
  def query(
      s: SparkSession,
      indexDir: String,
      queries: DataFrame,
      nProbe: Int = 2,
      k: Int = 5): DataFrame = {
    val q = queries
      .select(col("query_id"), vec(col("qv")).as("qv"))
      .withColumn("qn", norm(col("qv")))
    val cents = broadcast(s.read.parquet(s"$indexDir/centroids"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("cscore").desc, col("cid").asc)
    val probes = q.crossJoin(cents)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"),
        (dot(col("qv"), col("cv")) / (col("qn") * col("cn"))).as("cscore"))
      .withColumn("pr", row_number().over(wq)).where(col("pr") <= nProbe)
      .select(col("query_id"), col("qv"), col("qn"),
        col("cid").cast("int").as("cell"))
    val members = s.read.parquet(s"$indexDir/members")
    val scored = members.join(broadcast(probes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (dot(col("qv"), col("v")) / (col("qn") * col("nrm"))).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("sim"), 4).as("sim"))
  }
}
