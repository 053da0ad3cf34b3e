package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Batch variants of the reference's enrichment joins.
  *
  * - J1 broadcast latest-wins enrichment:
  *   `/root/reference/.../windowing/ScreenGlobalWindowWithSideInputEnricher.scala:13-89`.
  *   The reference linear-scans an iterable side input per element; here the
  *   right side is pre-reduced to latest-per-key (`max_by`) and broadcast, so
  *   the join is O(1) per row and never shuffles the fact side.
  * - K5 DLQ split: unmatched rows routed to a dead-letter output
  *   (`AdEventFixedWindowWithRepeaterEnricher.scala:56-69` et al.) — expressed
  *   as a null-filter on a shared left-outer join.
  * - J2 repeater join: `AdEventFixedWindowWithRepeaterEnricher.scala:12-71` +
  *   `RepeatDoFn.scala`. Beam re-emits the right side every window for TTL
  *   because it lacks interval joins; Spark expresses the same semantics
  *   directly as a time-bounded (as-of) join.
  * - J4 cogroup: `ScreenGlobalWindowWithLookupCacheEnricher.scala:43`.
  */
object Enrich {

  /** Right side of J1: latest publication version per publication_id
    * (TimestampCombiner.LATEST + sort-by-ts/lastOption in the reference,
    * `ScreenGlobalWindowWithSideInputEnricher.scala:65-68`). */
  private def latestPublications(s: SparkSession, dir: String): DataFrame =
    Corpus.publications(s, dir)
      .groupBy(col("publication_id"))
      .agg(max_by(col("version"), col("ts")).as("version"),
           max(col("ts")).as("pub_ts"))

  private val latestPublicationsSql: String =
    s"""SELECT publication_id, ARG_MAX(version, ts) AS version, MAX(ts) AS pub_ts
       |FROM (${Corpus.publicationsSql})
       |GROUP BY publication_id""".stripMargin

  /** J1: screens left-joined with the broadcast latest-publication dim;
    * `matched` distinguishes enriched rows from DLQ rows. */
  def broadcastEnrichLatest(s: SparkSession, dir: String): DataFrame = {
    val screens = Corpus.screens(s, dir)
    screens
      .join(broadcast(latestPublications(s, dir)), Seq("publication_id"), "left_outer")
      .select(col("screen_id"), col("publication_id"), col("ts"),
        col("version"), col("pub_ts"),
        col("version").isNotNull.as("matched"))
  }

  val broadcastEnrichLatestSql: String =
    s"""WITH latest AS ($latestPublicationsSql)
       |SELECT screen_id, sc.publication_id AS publication_id, ts, version, pub_ts,
       |  version IS NOT NULL AS matched
       |FROM (${Corpus.screensSql}) sc
       |LEFT JOIN latest USING (publication_id)""".stripMargin

  /** K5: the dead-letter side of J1 — screens with no publication. */
  def enrichDlq(s: SparkSession, dir: String): DataFrame =
    broadcastEnrichLatest(s, dir)
      .where(!col("matched"))
      .select("screen_id", "publication_id", "ts")

  val enrichDlqSql: String =
    s"""WITH latest AS ($latestPublicationsSql)
       |SELECT screen_id, sc.publication_id AS publication_id, ts
       |FROM (${Corpus.screensSql}) sc
       |LEFT JOIN latest USING (publication_id)
       |WHERE version IS NULL""".stripMargin

  /** J2 as a native as-of join: each click matched to the latest view by the
    * same user within the preceding 10 minutes; unmatched clicks keep NULLs
    * (DLQ-able downstream). Equi-key (user_id) + range predicate → Spark
    * plans a sort-merge join keyed on user_id; at scale the range filter
    * runs within each key group, never as a cross product. */
  def intervalJoinLatest(s: SparkSession, dir: String): DataFrame = {
    val ev = Corpus.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
    val views = ev.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user_id"),
        col("ts").as("view_ts"))
    clicks
      .join(views,
        col("user_id") === col("v_user_id") &&
        col("view_ts") <= col("click_ts") &&
        col("click_ts") < col("view_ts") + expr("INTERVAL 10 MINUTE"),
        "left_outer")
      .groupBy(col("click_id"), col("user_id"), col("click_ts"))
      .agg(max_by(col("view_id"), col("view_ts")).as("view_id"),
           max(col("view_ts")).as("view_ts"))
  }

  val intervalJoinLatestSql: String =
    """WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
      |           FROM events WHERE event_type = 'click'),
      |v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
      |      FROM events WHERE event_type = 'view')
      |SELECT click_id, c.user_id AS user_id, click_ts,
      |  ARG_MAX(view_id, view_ts) AS view_id, MAX(view_ts) AS view_ts
      |FROM c LEFT JOIN v
      |  ON c.user_id = v.user_id
      |  AND v.view_ts <= c.click_ts
      |  AND c.click_ts < v.view_ts + INTERVAL '10 minutes'
      |GROUP BY click_id, c.user_id, click_ts""".stripMargin

  /** J4: cogroup shape — per publication_id, how many screens vs how many
    * publication versions exist (full-outer aggregate merge; the batch
    * equivalent of CoGroupByKey's (K, (Iterable, Iterable)) output). */
  def cogroupStats(s: SparkSession, dir: String): DataFrame = {
    val sc = Corpus.screens(s, dir)
      .groupBy("publication_id").agg(count(lit(1)).as("n_screens"))
    val pub = Corpus.publications(s, dir)
      .groupBy("publication_id").agg(count(lit(1)).as("n_versions"))
    sc.join(pub, Seq("publication_id"), "full_outer")
      .select(col("publication_id"),
        coalesce(col("n_screens"), lit(0L)).as("n_screens"),
        coalesce(col("n_versions"), lit(0L)).as("n_versions"))
  }

  val cogroupStatsSql: String =
    s"""WITH sc AS (SELECT publication_id, COUNT(*) AS n_screens
       |            FROM (${Corpus.screensSql}) GROUP BY 1),
       |pub AS (SELECT publication_id, COUNT(*) AS n_versions
       |        FROM (${Corpus.publicationsSql}) GROUP BY 1)
       |SELECT COALESCE(sc.publication_id, pub.publication_id) AS publication_id,
       |  COALESCE(n_screens, 0) AS n_screens,
       |  COALESCE(n_versions, 0) AS n_versions
       |FROM sc FULL OUTER JOIN pub USING (publication_id)""".stripMargin
}
