package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoder}

import graft.streaming.LookupCacheJoin.{CacheState, Enriched, Tagged}

/** Key-salting wrapper for the TTL lookup-cache join — the skew
  * mitigation for the case the reference explicitly scopes OUT: its
  * cache-join section claims "unlimited scalability as long as keys are
  * distributed evenly" (`/root/reference/README.md`, lookup-cache
  * section). One hot key funnels every element through a single state
  * partition/task, so throughput degenerates to one core no matter the
  * cluster size.
  *
  * Mitigation: values scatter over `salts` sub-keys `(k, hash(v) % salts)`
  * (deterministic, so a retried task re-salts identically); lookups
  * replicate to every sub-key. Each salted group then resolves
  * latest-wins independently against the SAME lookup sequence, so the
  * enriched output is element-for-element identical to the unsalted
  * operator's — the salt only splits the buffer, never the lookup state.
  * The one observable difference: a GC flush (DLQ row) fires per salted
  * group at that group's own `maxTsSeen + ttl`, so DLQ emission
  * timestamps can differ from the unsalted operator's single timer (the
  * flushed (key, value) set is identical). Lookup replication costs
  * `salts` extra lookup rows per lookup — lookups are the rare side, so
  * this is the cheap direction to replicate.
  */
object SaltedLookupCache {

  /** The documented sizing rule (BASELINE.md, key-skew regime): the salt
    * count should match the cluster's task slots — fewer leaves cores
    * idle under one hot key, more only multiplies lookup replication. */
  def defaultSalts(spark: org.apache.spark.sql.SparkSession): Int =
    math.max(1, spark.sparkContext.defaultParallelism)

  /** [[join]] with `salts` self-sized to the session's task slots. */
  def join[K, V, L](
      values: Dataset[(K, V, Timestamp)],
      lookups: Dataset[(K, L, Timestamp)],
      ttlMs: Long)(implicit
      kiEnc: Encoder[(K, Int)],
      vEnc: Encoder[V],
      svEnc: Encoder[((K, Int), V, Timestamp)],
      slEnc: Encoder[((K, Int), L, Timestamp)],
      taggedEnc: Encoder[Tagged[(K, Int), V, L]],
      latestEnc: Encoder[(Long, L)],
      stateEnc: Encoder[CacheState[(K, Int), V, L]],
      outSaltedEnc: Encoder[Enriched[(K, Int), V, L]],
      outEnc: Encoder[Enriched[K, V, L]]): Dataset[Enriched[K, V, L]] =
    join(values, lookups, ttlMs, defaultSalts(values.sparkSession))

  /** Drop-in alternative to [[LookupCacheJoin.join]] /
    * [[LookupCacheProcessor.join]] for skewed key distributions. */
  def join[K, V, L](
      values: Dataset[(K, V, Timestamp)],
      lookups: Dataset[(K, L, Timestamp)],
      ttlMs: Long,
      salts: Int,
      useTransformWithState: Boolean = true,
      watermarkDelay: String = "0 seconds")(implicit
      kiEnc: Encoder[(K, Int)],
      vEnc: Encoder[V],
      svEnc: Encoder[((K, Int), V, Timestamp)],
      slEnc: Encoder[((K, Int), L, Timestamp)],
      taggedEnc: Encoder[Tagged[(K, Int), V, L]],
      latestEnc: Encoder[(Long, L)],
      stateEnc: Encoder[CacheState[(K, Int), V, L]],
      outSaltedEnc: Encoder[Enriched[(K, Int), V, L]],
      outEnc: Encoder[Enriched[K, V, L]]): Dataset[Enriched[K, V, L]] = {
    val n = math.max(1, salts)
    val sv = values.map { case (k, v, ts) =>
      ((k, stableSalt(v, ts, n)), v, ts)
    }
    val sl = lookups.flatMap { case (k, l, ts) =>
      (0 until n).map(s => ((k, s), l, ts))
    }
    val joined =
      if (useTransformWithState) LookupCacheProcessor.join(sv, sl, ttlMs, watermarkDelay)
      else LookupCacheJoin.join(sv, sl, ttlMs, watermarkDelay)
    joined.map(e => Enriched[K, V, L](e.key._1, e.value, e.lookup, e.emitTs))
  }

  /** Deterministic salt for a value: a retried/replayed task MUST re-salt
    * every element identically or the replay lands elements in different
    * state partitions than the checkpoint recorded. `v.hashCode` alone is
    * unsafe — for payloads without a value-based hashCode (arrays, plain
    * classes) it is the JVM identity hash, which differs per object
    * instance. Use a value-stable hash where the type guarantees one
    * (case classes, strings, numbers) or where contents can be hashed
    * directly (arrays — the common opaque payload, hashed element-wise so
    * a re-deserialized copy salts identically), and fall back to the
    * element's event timestamp (deterministic per element) for the rest.
    *
    * Documented trade on that LAST fallback: a truly opaque payload class
    * spreads by timestamp only, so a hot key whose events share one
    * coarse timestamp would collapse onto one salt — acceptable because
    * every payload this engine ships (tuples/case classes, strings,
    * numbers, arrays) hashes by content, and a caller with an exotic
    * payload type can wrap it in a case class to opt into content
    * hashing (spec-pinned in SaltedLookupSpec). */
  private[graft] def stableSalt(v: Any, ts: Timestamp, n: Int): Int = {
    val h: Long = v match {
      // productHash, NOT its caseClassHash replacement: the salt value is
      // part of the state-store key, so swapping the hash would re-route
      // in-flight keys across a checkpoint restart that spans the upgrade
      case p: Product => (scala.util.hashing.MurmurHash3.productHash(p): @scala.annotation.nowarn("cat=deprecation")).toLong
      case s: String => scala.util.hashing.MurmurHash3.stringHash(s).toLong
      case x: java.lang.Number => x.longValue()
      case a: Array[Byte] => scala.util.hashing.MurmurHash3.bytesHash(a).toLong
      case a: Array[_] => scala.util.hashing.MurmurHash3.arrayHash(a).toLong
      case _ => 0L // truly opaque payload: spread by timestamp only
    }
    val mixed = (h * 31 + ts.getTime) * 0x9E3779B97F4A7C15L
    (((mixed ^ (mixed >>> 32)).toInt) & Int.MaxValue) % n
  }
}
