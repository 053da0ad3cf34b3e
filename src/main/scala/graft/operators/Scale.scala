package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Skew- and shuffle-management techniques as verifiable operators (the
  * 100 TB toolbox items the builder prompt calls out: salting for skew,
  * bucketing for co-located joins).
  */
object Scale {

  /** Two-stage salted aggregation over a deliberately skewed key
    * (`event_type` has a handful of values — at 100 TB a single reducer
    * per value would strangle the job). Stage 1 groups by (key, salt) so
    * partial counts spread over `salt × |keys|` reducers; stage 2 combines
    * the per-salt partials. The result is identical to the direct GROUP BY
    * (the oracle), which is the point: salting changes the shuffle layout,
    * never the answer. */
  def saltedEventCounts(s: SparkSession, dir: String, salt: Int = 16): DataFrame =
    Corpus.events(s, dir)
      .groupBy(col("event_type"), pmod(col("event_id"), lit(salt.toLong)).as("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("event_type"))
      .agg(sum(col("partial")).as("n"))

  val saltedEventCountsSql: String =
    "SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1"

  /** Drop `name` from the catalog AND clear its warehouse directory: a
    * fresh metastore (new JVM) doesn't know tables whose data a previous
    * run left behind, and `saveAsTable` refuses a managed-table location
    * that already exists (LOCATION_ALREADY_EXISTS). */
  private def resetTable(s: SparkSession, name: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $name")
    val wh = s.conf.get("spark.sql.warehouse.dir")
    val loc = s"$wh/$name"
    if (IndexFs.exists(loc)) IndexFs.deleteTree(loc)
  }

  def bucketTables(s: SparkSession, dir: String, buckets: Int, prefix: String): Unit = {
    resetTable(s, s"${prefix}_orders")
    resetTable(s, s"${prefix}_customer")
    Corpus.orders(s, dir).write
      .bucketBy(buckets, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable(s"${prefix}_orders")
    Corpus.customer(s, dir).write
      .bucketBy(buckets, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable(s"${prefix}_customer")
  }

  /** Bucketed co-located join: write both sides bucketed by the join key,
    * then join without any shuffle — the bucket layout IS the exchange,
    * paid once at write time and amortized over every subsequent join.
    * Returns the joined frame; [[bucketTables]] materializes the layout. */
  def bucketedJoin(s: SparkSession, prefix: String): DataFrame =
    s.table(s"${prefix}_orders")
      .join(s.table(s"${prefix}_customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        // exact DECIMAL sum → DOUBLE: identical regardless of bucket layout
        // or engine summation order (oracle hash parity)
        sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("revenue"))

  /** Oracle-gated wrapper: materialize the bucket layout for `dir` ONCE,
    * then run the co-located join. The bucketed write is the pre-paid
    * exchange — at 100 TB it's paid once and amortized over every
    * subsequent join on the same key, so re-paying it on every call would
    * misrepresent the operator's steady-state cost (the bench's separate
    * `bucketed.layout_sec` entry times the layout explicitly).
    *
    * The table name derives from `dir` and done-ness is the CATALOG's
    * state, not a JVM-global flag: a per-JVM memo with a shared table name
    * would serve dir A's revenue for dir B after interleaved calls, and
    * would claim done-ness across a session restart whose fresh in-memory
    * catalog no longer has the table. The oracle is the plain join +
    * GROUP BY: bucketing changes the shuffle layout, never the answer. */
  def bucketedJoinRevenue(s: SparkSession, dir: String): DataFrame = {
    val prefix = s"graft_bjr_${(dir.hashCode & 0x7fffffff).toHexString}"
    if (!s.catalog.tableExists(s"${prefix}_orders") ||
        !s.catalog.tableExists(s"${prefix}_customer")) {
      bucketTables(s, dir, buckets = 8, prefix = prefix)
    }
    bucketedJoin(s, prefix)
  }

  val bucketedJoinRevenueSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment""".stripMargin
}
