package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Sink parity with the reference's BigQuery/Avro I/O (SURVEY.md §2.2),
  * re-targeted at the formats available offline (parquet/json/csv/orc —
  * identical disposition semantics; spark-avro is not on this image's
  * classpath).
  *
  *  - [[writeAppend]] ≙ K1/K3 batch file-load sink
  *    (`bigquery/SaveSpecificRecord.scala:59-79`, `SaveTypedBigQuery
  *    .scala:30-37`): WRITE_APPEND ⇒ `mode("append")`; CREATE_NEVER ⇒
  *    fail fast when the target does not already exist.
  *  - [[streamFiles]] ≙ K1 unbounded variant: `withTriggeringFrequency` ⇒
  *    `Trigger.ProcessingTime`, `withNumFileShards` ⇒ `repartition(n)`.
  *  - [[foreachBatchSink]] ≙ K2 streaming-insert sink with transient-error
  *    retry: per-micro-batch delivery where idempotent writes + Spark task
  *    retry replace Beam's `retryTransientErrors` policy.
  *  - [[debug]] ≙ K4 console/debug sink (`bigquery/BigQueryRecord
  *    .scala:18-21`): sample one row + count.
  */
object Io {

  sealed trait CreateDisposition
  case object CreateIfNeeded extends CreateDisposition
  case object CreateNever extends CreateDisposition

  /** Append `df` to `path` in `format`. With [[CreateNever]], throws if the
    * target was never created — the reference's CREATE_NEVER contract. */
  def writeAppend(
      df: DataFrame,
      path: String,
      format: String = "parquet",
      disposition: CreateDisposition = CreateIfNeeded): Unit = {
    if (disposition == CreateNever) {
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), df.sparkSession.sparkContext.hadoopConfiguration)
      require(fs.exists(new org.apache.hadoop.fs.Path(path)),
        s"CREATE_NEVER: target $path does not exist")
    }
    df.write.mode("append").format(format).save(path)
  }

  /** Streaming file sink: shard + trigger-frequency control. Caller starts
    * the returned writer (`.start()`), mirroring the reference's unbounded
    * FILE_LOADS config. */
  def streamFiles[T](
      ds: Dataset[T],
      path: String,
      checkpoint: String,
      triggerInterval: String = "10 seconds",
      numShards: Int = 1,
      format: String = "parquet"): DataStreamWriter[Row] =
    ds.toDF().repartition(numShards)
      .writeStream
      .format(format)
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime(triggerInterval))

  /** Row-delivery streaming sink: the K2 shape. `deliver` receives each
    * micro-batch and its id; it must be idempotent on retry. */
  def foreachBatchSink[T](
      ds: Dataset[T],
      checkpoint: String)(deliver: (Dataset[T], Long) => Unit): DataStreamWriter[T] =
    ds.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[T], id: Long) => deliver(batch, id) }

  /** Debug sink: one sample row + total count, like `.debug()` in the
    * reference. Returns the count so callers can assert on it. */
  def debug(df: DataFrame, prefix: String = "debug"): Long = {
    df.show(1, truncate = false)
    val n = df.count()
    println(s"$prefix: $n rows")
    n
  }

  /** Layout probe: (parquet file count, total row-group count) for a
    * table path (single file or directory of part files). `rowGroups ==
    * files` is the one-row-group-per-file signature of an
    * externally-produced monolithic corpus — the layout [[compact]]
    * exists to fix, and the trigger for Bench's relayout prelude. Footer
    * reads only; no data pages touched. */
  def rowGroupStats(spark: SparkSession, path: String): (Int, Int) = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path), hconf)
    val p = new org.apache.hadoop.fs.Path(path)
    val files =
      (if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
       else Seq(fs.getFileStatus(p)))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val groups = files.map { s =>
      val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(s.getPath, hconf))
      try rdr.getFooter.getBlocks.size
      finally rdr.close()
    }.sum
    (files.size, groups)
  }

  /** Ingest re-layout (compaction): rewrite a parquet table so that scans
    * parallelize. Spark cannot split a parquet ROW GROUP across tasks, so
    * a table shipped as one monolithic file with one row group (the
    * round-7 corpus regeneration did exactly this — see BASELINE.md,
    * "Corpus regeneration re-baseline": a measured 1.85× scan slowdown)
    * serializes every downstream scan no matter what
    * `maxPartitionBytes` says. The first stage of a 100 TB pipeline over
    * externally-produced files is this rewrite; every scan after it
    * splits into `ceil(bytes / targetBytes)` tasks.
    *
    * Output file count is sized from the INPUT's on-disk bytes (compressed
    * parquet → parquet of the same codec keeps the ratio), clamped to at
    * least the session's default parallelism so small tables still fan
    * out. Returns the file count written.
    *
    * `sortBy` optionally range-clusters rows before the write (a
    * repartitionByRange + local sort), so parquet row-group min/max stats
    * line up with the cluster key and downstream range predicates skip
    * whole files — the data-skipping half of the layout story. */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetBytes: Long = 128L * 1024 * 1024,
      sortBy: Seq[String] = Nil): Int = {
    val hconf = spark.sparkContext.hadoopConfiguration
    // in and out may live on DIFFERENT filesystems (hdfs → s3a, file →
    // hdfs): resolve each from its own URI, and refuse a same-path call —
    // mode("overwrite") would clobber the input before the lazy read runs
    val inFs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(inPath), hconf)
    val outFs = org.apache.hadoop.fs.FileSystem.get(new java.net.URI(outPath), hconf)
    val inQ = inFs.makeQualified(new org.apache.hadoop.fs.Path(inPath))
    val outQ = outFs.makeQualified(new org.apache.hadoop.fs.Path(outPath))
    require(inQ != outQ,
      s"Io.compact would overwrite its own input (in == out == $inQ)")
    val bytes = inFs.getContentSummary(inQ).getLength
    val files = math.max(
      spark.sparkContext.defaultParallelism,
      math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(inPath)
    val laid =
      if (sortBy.isEmpty) df.repartition(files)
      else df.repartitionByRange(files, sortBy.map(org.apache.spark.sql.functions.col): _*)
        .sortWithinPartitions(sortBy.map(org.apache.spark.sql.functions.col): _*)
    laid.write.mode("overwrite").parquet(outPath)
    outFs.listStatus(outQ)
      .count(s => s.getPath.getName.endsWith(".parquet"))
  }
}
