package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Batch (DuckDB-oracle-checkable) analogs of the two stateful streaming
  * operators, so T1/T2 semantics sit on the driver's correctness gate too:
  *
  *  - [[asofLookupJoin]] ≙ `LookupCacheDoFn` (T2/J3, reference
  *    `windowing/LookupCacheDoFn.scala:33-211`): enrich each screen with
  *    the latest publication known at the screen's event time, within a
  *    TTL; no match → DLQ row (null version). The streaming twin is
  *    [[graft.streaming.LookupCacheJoin]].
  *  - [[repeatTicks]] ≙ `RepeatDoFn` (T1, reference
  *    `windowing/RepeatDoFn.scala:42-120`): per key, the first sighting
  *    emits immediately and then re-emits every interval until
  *    lastSeen + ttl. The streaming twin is [[graft.streaming.Repeater]];
  *    here the full tick schedule is computed declaratively.
  */
object StatefulBatch {

  /** As-of join with TTL: latest publication p with
    * `screen.ts − ttl < p.ts ≤ screen.ts`, deterministic tiebreak on
    * (ts, version).
    *
    * Scale shape: the publication side of such a join is a slowly-changing
    * dimension, orders of magnitude smaller than the event side → broadcast
    * it and reduce with a partial+final `max(struct(ts, version))`
    * aggregate keyed by the (unique) screen id. No sort, no window
    * function, one shuffle of pre-combined rows. */
  def asofLookupJoin(s: SparkSession, dir: String): DataFrame = {
    val scr = Corpus.screens(s, dir)
      .select(col("screen_id"), col("publication_id"), col("ts").as("screen_ts"))
    val pub = Corpus.publications(s, dir)
      .select(col("publication_id").as("p_pid"), col("version"), col("ts").as("p_ts"))
    scr
      .join(broadcast(pub),
        col("publication_id") === col("p_pid") &&
          col("p_ts") <= col("screen_ts") &&
          col("p_ts") > col("screen_ts") - expr("INTERVAL 1 HOUR"),
        "left")
      .groupBy(col("screen_id"), col("publication_id"), col("screen_ts"))
      .agg(max(when(col("p_ts").isNotNull,
        struct(col("p_ts"), col("version")))).as("best"))
      .select(col("screen_id"), col("publication_id"), col("screen_ts"),
        col("best.version").as("version"),
        col("best").isNotNull.as("matched"))
  }

  val asofLookupJoinSql: String =
    s"""WITH s AS (${Corpus.screensSql}),
       |p AS (${Corpus.publicationsSql}),
       |j AS (
       |  SELECT s.screen_id, s.publication_id, s.ts AS screen_ts,
       |         p.version, p.ts AS p_ts
       |  FROM s LEFT JOIN p ON s.publication_id = p.publication_id
       |    AND p.ts <= s.ts AND p.ts > s.ts - INTERVAL '1 hour'),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY screen_id
       |    ORDER BY p_ts DESC NULLS LAST, version DESC NULLS LAST) AS rn
       |  FROM j)
       |SELECT screen_id, publication_id, screen_ts, version,
       |       version IS NOT NULL AS matched
       |FROM r WHERE rn = 1""".stripMargin

  private val intervalUs = 6L * 3600 * 1000000 // 6 h
  private val ttlUs = 12L * 3600 * 1000000 // 12 h

  /** Tick schedule of the repeater per publication key over `screens`:
    * first tick at min(ts); tick i+1 = tick i + interval while
    * tick i < max(ts) + ttl (the expiry tick still fires — reference
    * `RepeatDoFn.scala:99-113`). One groupBy + a generated sequence —
    * the 100 TB shape is one pre-combined row per key into the shuffle,
    * then a cheap explode. */
  def repeatTicks(s: SparkSession, dir: String): DataFrame = {
    Corpus.screens(s, dir)
      .groupBy(col("publication_id"))
      .agg(min(unix_micros(col("ts"))).as("f"), max(unix_micros(col("ts"))).as("l"))
      .withColumn("extra",
        expr(s"(l + $ttlUs - f + ${intervalUs - 1}) div $intervalUs"))
      .select(col("publication_id"), col("f"),
        explode(sequence(lit(0L), col("extra"))).as("j"))
      .select(col("publication_id"),
        timestamp_micros(col("f") + col("j") * intervalUs).as("emit_ts"),
        (col("j") > 0L).as("repeated"))
  }

  val repeatTicksSql: String =
    s"""WITH s AS (${Corpus.screensSql}),
       |g AS (
       |  SELECT publication_id, MIN(epoch_us(ts)) AS f, MAX(epoch_us(ts)) AS l
       |  FROM s GROUP BY 1),
       |t AS (
       |  SELECT publication_id, f,
       |    UNNEST(generate_series(0, (l + $ttlUs - f + ${intervalUs - 1}) // $intervalUs)) AS j
       |  FROM g)
       |SELECT publication_id, make_timestamp(f + j * $intervalUs) AS emit_ts,
       |       j > 0 AS repeated
       |FROM t""".stripMargin
}
