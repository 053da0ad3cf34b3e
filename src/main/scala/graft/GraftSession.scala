package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point: one place that wires the graft
  * Catalyst extensions ([[GraftExtensions]] — `graft_dot`,
  * `graft_hyperplane_sig`) and the configuration every graft workload
  * needs, so a user replaces
  * `SparkSession.builder()...` with `GraftSession.builder()...` and every
  * operator and Catalyst-injected SQL function in this library just
  * works. The sketch AGGREGATE functions ride on per-session UDF
  * registration (Spark offers no extensions hook for `Aggregator`-backed
  * UDAFs), so cluster users additionally call
  * `GraftSession.registerSketches(spark)` on the built session — the
  * local harness path does it automatically.
  *
  * On a cluster, leave `master` unset and submit normally — only the
  * local-mode mains (Verify/Bench/tests) pin `local[n]`. Shuffle
  * partitions default to the cluster's setting unless `shufflePartitions`
  * is given (the local harnesses pass the core count; at 100 TB you'd size
  * it to data volume, not cores).
  */
object GraftSession {

  def builder(
      master: Option[String] = None,
      shufflePartitions: Option[Int] = None): SparkSession.Builder = {
    val b = SparkSession.builder()
      .config("spark.sql.extensions", classOf[GraftExtensions].getName)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS); read as long + convert
      // (see graft.sources.Corpus.normalizeTs)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Join strategy (optimization guide §3.1/§9): allow shuffled hash
      // join when its size conditions are met instead of always sorting
      // both sides, and let AQE rewrite a planned sort-merge join to
      // shuffled-hash at runtime when every post-shuffle partition fits
      // 128 MB (the conservative per-task build bound — an executor
      // core's working memory at any scale, not a local[32] tune). Both
      // engines' results are join-strategy-independent; the fact-to-fact
      // joins (orders⋈lineitem and friends) drop their two sorts.
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        (128L * 1024 * 1024).toString)
      // RocksDB ListState appends are only O(1) with row tracking off:
      // with it on (Spark's default), every merge() does a full GET of the
      // accumulated list for the numRows metric, so n appends cost O(n²)
      // bytes read — measured as a single pegged core inside
      // handleMetricsUpdate under the state-heavy lookup-cache leg. The
      // trade is an approximate numTotalStateRows metric, the documented
      // contract of this knob; the 100 TB posture (LookupCacheProcessor's
      // O(1)-append argument) needs the O(1), not the metric.
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
      // ObjectHashAggregate (graft_str_bounds — the ANALYZE family's
      // hash-compatible string bounds) falls back to SORT-based
      // aggregation past this many distinct groups per task. The default
      // 128 is sized for heavyweight buffers (collect_list of whole
      // groups); graft's object buffers hold two short strings, and the
      // one grouped consumer's key space is PROVABLY bounded at any data
      // size — (2^hllBits + 2) · n_cols ≈ 1.3K groups for the stats
      // family — so 8192 keeps it hash-based everywhere it is used while
      // still bounding per-task buffer memory. Scale-independent: the
      // bound comes from the algorithm's register space, not the corpus.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "8192")
    val b1 = master.fold(b)(m => b.master(m))
    shufflePartitions.fold(b1)(n => b1.config("spark.sql.shuffle.partitions", n.toString))
  }

  /** Registers the mergeable corpus sketches as SQL aggregate/scalar
    * functions on a live session (UDF registration is per-session, so —
    * unlike the Catalyst expressions, which ride in via
    * `spark.sql.extensions` — this is a post-build step):
    * `graft_hll_users(str)`, `graft_log2_hist(long)`,
    * `graft_log2_quantile(array<long>, double)`,
    * `graft_top_terms(str)` (Space-Saving heavy hitters). */
  def registerSketches(spark: SparkSession): SparkSession = {
    import graft.functions.SketchFunctions
    spark.udf.register("graft_hll_users",
      org.apache.spark.sql.functions.udaf(SketchFunctions.hllUsers))
    spark.udf.register("graft_log2_hist",
      org.apache.spark.sql.functions.udaf(SketchFunctions.log2Hist))
    spark.udf.register("graft_log2_quantile", SketchFunctions.log2Quantile _)
    spark.udf.register("graft_top_terms",
      org.apache.spark.sql.functions.udaf(SketchFunctions.spaceSaving,
        org.apache.spark.sql.Encoders.STRING))
    spark.udf.register("graft_cms",
      org.apache.spark.sql.functions.udaf(SketchFunctions.countMin,
        org.apache.spark.sql.Encoders.STRING))
    spark.udf.register("graft_cms_estimate", SketchFunctions.cmsEstimate _)
    spark
  }

  /** Local-harness convenience: `local[cpus]` with matching shuffle
    * partitions and no UI — what Verify/Bench/the test session use.
    * `cpus` is any master-legal token (so `SPARK_GRAFT_CPUS="*"` keeps
    * working), passed through to both settings exactly as the harnesses
    * always did. */
  def local(cpus: String): SparkSession =
    registerSketches(
      builder(Some(s"local[$cpus]"))
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate())

  def local(cpus: Int): SparkSession = local(cpus.toString)
}
