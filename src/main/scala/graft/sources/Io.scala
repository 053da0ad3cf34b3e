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
}
