package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.IvfIndex

/** Streaming QUERY side of the persisted IVF index — the last leg of the
  * index lifecycle (build → append → appendStream → compact → **serve**):
  * a continuous stream of (query_id, qv) vectors answered against
  * [[IvfIndex]]'s cell-partitioned layout, micro-batch by micro-batch.
  *
  * Why `foreachBatch` running the batch [[IvfIndex.query]] verbatim, and
  * not a stream-static join: the serving plan's load-bearing property is
  * that the members scan reads ONLY the probed cells, and that pruning is
  * data-dependent — the partition filter comes from a broadcast of the
  * per-query probe list, i.e. dynamic partition pruning. A streaming
  * plan can never provide it: the stream side of a stream-static join
  * cannot be the broadcast build side, so the static members scan would
  * be re-read IN FULL every trigger — exactly the shape that dies at the
  * 10^9-vector target regime. `foreachBatch` hands each trigger's rows to
  * the full batch planner, so every micro-batch gets the same
  * DPP + broadcast-probe + bounded-window plan `IvfIndexSpec` audits, and
  * result exactness is inherited from the batch operator by construction
  * rather than re-proven against it.
  *
  * No state: serving is read-only and per-query independent, so the only
  * streaming state is the sink checkpoint, and `foreachBatch`'s
  * at-least-once redelivery is idempotent for any sink keyed by
  * (query_id, rank). At 1000-executor scale the trigger cost is one
  * probe broadcast + `nProbe` cell partitions read per distinct probed
  * cell — never the index. */
object StreamAnnServe {

  /** Serve `queries` (streaming frame: `query_id: long, qv: array`)
    * against the index at `indexDir`. `sink` receives each micro-batch's
    * answered top-k frame — (query_id, rank, neighbor_id, sim), the batch
    * operator's exact schema — plus the batch id. */
  def serve(
      s: SparkSession,
      indexDir: String,
      queries: DataFrame,
      checkpointDir: String,
      nProbe: Int = 2,
      k: Int = 5)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    // retrain quiesce: a session must not pin frames from an index whose
    // quantizer and layout may disagree ([[IvfIndex.retrain]]'s
    // contract) — checked at session start AND before every refresh
    IvfIndex.requireNotRetraining(indexDir)
    // [[PinnedIndex]]: one directory listing per index VERSION, a
    // one-file-stat staleness check per trigger — mutations become
    // visible at the next trigger without restarting the query
    val idx = new PinnedIndex(s, indexDir, Seq("centroids", "members"),
      onRefresh = () => IvfIndex.requireNotRetraining(indexDir))
    queries.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .foreachBatch { (df: Dataset[Row], batchId: Long) =>
        idx.refreshIfStale()
        sink(IvfIndex.queryOn(idx("centroids"), idx("members"),
          df.toDF(), nProbe, k), batchId)
        ()
      }
      .start()
  }
}
