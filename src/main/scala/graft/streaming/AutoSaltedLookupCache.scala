package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.functions.col

import graft.streaming.LookupCacheJoin.{CacheState, Enriched, Tagged}

/** Automatic plain-vs-salted selection for the TTL lookup-cache join —
  * the wiring between the LIVE hot-key monitor ([[KeySkewStream]]) and
  * the skew mitigation ([[SaltedLookupCache]]), applying the measured
  * crossover rule (BASELINE.md, key-skew regime) instead of asking the
  * operator's user to know it.
  *
  * The decision is made at QUERY-START, not per micro-batch: a streaming
  * query's plan — and with it the state layout a checkpoint records — is
  * fixed when the query starts, so switching salting mid-query would
  * replay elements into different state partitions than the checkpoint
  * holds. Streaming deployments restart routinely (deploys, rescale,
  * recovery); each restart re-reads the monitor's then-current profile
  * and re-decides. The monitor itself runs continuously, so the profile
  * the decision consumes reflects the traffic actually flowing, not an
  * offline sample.
  */
object AutoSaltedLookupCache {

  /** A query-start salting decision, with the numbers that produced it
    * kept for observability. */
  final case class Decision(
      salted: Boolean,
      salts: Int,
      topShare: Double,
      hotRowsPerBatch: Long)

  /** Measured crossover bracket (BASELINE.md key-skew table, RocksDB,
    * 99%-hot traffic): at ~59k hot-key rows per micro-batch the fixed
    * per-batch cost dominated and salting LOST 11%; at ~238k per-row
    * work dominated and salting won 1.64×. The rule salts above the
    * bracket's midpoint. */
  val crossoverHotRows: Long = 120000L

  /** The crossover rule. `topShare` is the hottest key's share of value
    * traffic (rank-1 `share` from [[KeySkewStream.profile]]);
    * `rowsPerBatch` the expected value rows per micro-batch; `slots` the
    * cluster's task slots (salt count if salted — fewer leaves cores
    * idle, more only multiplies lookup replication).
    *
    * Salt iff BOTH hold:
    *  - the top key exceeds 1/slots of traffic — below that the hash
    *    partitioner already spreads work across the slots, and the hot
    *    key cannot serialize the join;
    *  - its per-batch rows clear [[crossoverHotRows]] — below that the
    *    per-micro-batch fixed overhead dominates and salting's lookup
    *    replication + re-map is pure cost. */
  def decide(topShare: Double, rowsPerBatch: Long, slots: Int): Decision = {
    val n = math.max(1, slots)
    val hotRows = (rowsPerBatch * topShare).toLong
    Decision(
      salted = topShare > 1.0 / n && hotRows > crossoverHotRows,
      salts = n,
      topShare = topShare,
      hotRowsPerBatch = hotRows)
  }

  /** [[decide]] fed from the live monitor: `profile` is the (batch-read)
    * output of [[KeySkewStream.profile]] — e.g. the monitor query's sink
    * table at operator-start time. An empty profile (monitor not yet
    * fired) decides plain: no evidence of skew, and the next restart
    * re-reads. When the monitor ran in update/complete mode the sink may
    * hold rows from several micro-batches — the freshest global row is
    * the one with the largest `n_rows` (the monitor's exact running
    * count is monotone). */
  def decideFromProfile(profile: DataFrame, rowsPerBatch: Long, slots: Int): Decision = {
    val top = profile.where(col("rank") === 1)
      .orderBy(col("n_rows").desc)
      .select(col("share"))
      .take(1)
    decide(if (top.isEmpty) 0.0 else top.head.getDouble(0), rowsPerBatch, slots)
  }

  /** The join: plain [[LookupCacheProcessor]] or [[SaltedLookupCache]]
    * per the decision. Output is element-for-element identical either
    * way (SaltedLookupSpec / AutoSaltSpec) — the decision only moves the
    * throughput/fixed-cost trade. */
  def join[K, V, L](
      values: Dataset[(K, V, Timestamp)],
      lookups: Dataset[(K, L, Timestamp)],
      ttlMs: Long,
      decision: Decision,
      watermarkDelay: String = "0 seconds")(implicit
      kEnc: Encoder[K],
      kiEnc: Encoder[(K, Int)],
      vEnc: Encoder[V],
      svEnc: Encoder[((K, Int), V, Timestamp)],
      slEnc: Encoder[((K, Int), L, Timestamp)],
      taggedEnc: Encoder[Tagged[K, V, L]],
      taggedSaltedEnc: Encoder[Tagged[(K, Int), V, L]],
      latestEnc: Encoder[(Long, L)],
      stateEnc: Encoder[CacheState[(K, Int), V, L]],
      outSaltedEnc: Encoder[Enriched[(K, Int), V, L]],
      outEnc: Encoder[Enriched[K, V, L]]): Dataset[Enriched[K, V, L]] =
    if (decision.salted)
      SaltedLookupCache.join(values, lookups, ttlMs, decision.salts,
        useTransformWithState = true, watermarkDelay)
    else
      LookupCacheProcessor.join(values, lookups, ttlMs, watermarkDelay)
}
