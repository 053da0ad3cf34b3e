package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Corpus

/** Keyless point-in-range join, banded into an equi-join.
  *
  * The reference joins streams per key (J2/J3, e.g.
  * `/root/reference/.../AdEventFixedWindowWithRepeaterEnricher.scala:12-71`),
  * so Spark can always plan a keyed join for those. The missing — and at
  * 100 TB most dangerous — shape is the join with NO equi key at all: "point
  * p falls inside range [start, end)" (IP→geo lookups, time-overlap
  * analytics, price-band classification). Handed to Catalyst as a bare
  * inequality predicate it plans a BroadcastNestedLoopJoin — O(|points| ×
  * |ranges|) comparisons, the one plan shape every other operator in this
  * repo is audited NOT to produce.
  *
  * The classic fix (Databricks' range-join optimization, DuckDB's IEJoin)
  * is banding: pick a band width `w`, assign every point to band
  * floor(p/w), explode every range into the ⌈len/w⌉+1 bands it overlaps,
  * equi-join on the band id with the exact predicate as a residual join
  * condition. Each qualifying (point, range) pair survives exactly once —
  * a point lives in exactly ONE band, and a range emits each overlapped
  * band at most once (`sequence` yields distinct band ids) — so no dedup
  * pass is needed. Cost: shuffle on band id + per-band candidate pairs,
  * i.e. the same "bounded fan-out equi-join" contract as the LSH family;
  * fan-out is range_len/w + 1 rows per range, tunable against per-band
  * density.
  */
object RangeJoin {

  /** Generic banded point-in-range join.
    *
    * Bands route candidate pairs; `residual` decides them exactly. The
    * residual defaults to `start <= point && point < end` on the banding
    * columns, but callers whose banding columns are coarsened copies of
    * the real ones (e.g. epoch-seconds of a microsecond timestamp — see
    * [[concurrentViews]]) MUST pass the exact predicate on the original
    * columns instead: banding only needs to be monotone and covering,
    * the residual is the semantics.
    *
    * @param points    left side; one row per point
    * @param ranges    right side; one row per [start, end) interval
    * @param point     numeric (e.g. epoch-seconds) point column on `points`
    * @param start     numeric range start (inclusive) on `ranges`
    * @param end       numeric range end (exclusive) on `ranges`
    * @param bandWidth band size in the same unit; choose ≈ the typical
    *                  range length so fan-out stays ~2 rows per range
    * @param residual  exact join predicate; defaults to
    *                  `start <= point && point < end`
    * @param joinType  "inner" or "left_outer" (unmatched points kept with
    *                  NULL range columns — the residual sits inside the
    *                  join condition, so a point whose banded candidates
    *                  all fail it still surfaces once)
    *
    * Output: every `points` column, then every `ranges` column.
    */
  def pointInRange(
      points: DataFrame,
      ranges: DataFrame,
      point: Column,
      start: Column,
      end: Column,
      bandWidth: Long,
      residual: Option[Column] = None,
      joinType: String = "inner"): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive, got $bandWidth")
    val p = points.withColumn("graft_p_band", floor(point / bandWidth))
    // Exclusive end: a range ending exactly on a band boundary emits that
    // boundary band too; the residual discards any point in it.
    // Inverted ranges (end < start) can match nothing but would make
    // `sequence` THROW (illegal boundaries) — drop them up front, which
    // the naive join also treats as no-match. Band floors are compared
    // (not the raw bounds) so mixed-magnitude rounding can't re-invert.
    val r = ranges
      .where(floor(start / bandWidth) <= floor(end / bandWidth))
      .withColumn("graft_r_band",
        explode(sequence(floor(start / bandWidth), floor(end / bandWidth))))
    val exact = residual.getOrElse(start <= point && point < end)
    p.join(r, p("graft_p_band") === r("graft_r_band") && exact, joinType)
      .drop("graft_p_band", "graft_r_band")
  }

  /** Cost-based band width for [[graft.plans.BandedRangeJoinRule]]: derive
    * `w` from a [[Sketches.tableStats]]-shaped frame instead of guessing,
    * and SET `spark.graft.rangeJoin.bandWidth` so the optimizer rule picks
    * it up for subsequent bare-inequality joins. A manually-set conf is
    * the override and wins untouched (returned as-is).
    *
    * The heuristic: a band spans ~`valuesPerBand` distinct values of the
    * banded column — w = (max − min) / ndv × valuesPerBand. Per-band
    * candidate density is then ≈ valuesPerBand × (n_rows / ndv) rows
    * regardless of the column's absolute scale or unit (epoch seconds vs
    * micros vs prices), which is exactly the guess the manual knob asked
    * the caller to make. The ANALYZE pass that produces the stats frame
    * is the nightly `table_stats` run — one aggregation tree, already
    * amortized across every consumer of the warehouse's stats. */
  def autoBandWidth(
      s: SparkSession,
      stats: DataFrame,
      colName: String,
      valuesPerBand: Long = 64L): Long = {
    val confKey = "spark.graft.rangeJoin.bandWidth"
    // ANY explicitly-set conf is the manual override — including 0 or a
    // negative value, which is the documented way to DISABLE the rule:
    // deriving a width over an explicit disable would silently re-enable
    // the rewrite for every later join in the session
    s.conf.getOption(confKey) match {
      case Some(v) =>
        // fail loudly on an unparsable override: mapping a typo ('64k')
        // to 0 would silently disable the banded rewrite session-wide
        scala.util.Try(v.toLong).getOrElse(
          throw new IllegalArgumentException(
            s"$confKey is set to '$v', which is not a long — " +
              "set a band width in the banded column's units, or <= 0 to disable"))
      case None =>
        val rows = stats
          .where(col("col_name") === colName)
          .select(col("min_num"), col("max_num"), col("ndv_est"), col("ndv_exact"))
          .collect()
        require(rows.nonEmpty, s"$colName not present in the stats frame")
        val row = rows.head
        require(!row.isNullAt(0) && !row.isNullAt(1),
          s"$colName has no numeric min/max in the stats frame")
        val span = row.getDouble(1) - row.getDouble(0)
        val ndv =
          if (!row.isNullAt(2) && row.getDouble(2) > 0) row.getDouble(2)
          else if (!row.isNullAt(3)) row.getLong(3).toDouble
          else throw new IllegalArgumentException(
            s"$colName has no usable NDV (ndv_est null or <= 0, ndv_exact null) " +
              "in the stats frame — run the table_stats pass first or set " +
              s"$confKey manually")
        val w = math.max(1L, math.round(span / math.max(1.0, ndv) * valuesPerBand))
        s.conf.set(confKey, w.toString)
        w
    }
  }

  /** `range_join_banded` query: global concurrent-exposure analytics — for
    * each click, how many view "exposure windows" [view_ts, view_ts+10min)
    * were open ANYWHERE at click time (no user equi-key: cross-user
    * concurrency), plus the most recent such view. The keyless twin of
    * `Enrich.intervalJoinLatest`; the DuckDB oracle states the semantics as
    * the bare inequality join, the Spark side runs the banded plan
    * (plan-asserted: no BroadcastNestedLoopJoin, band equi-join present).
    *
    * Banding is on epoch-SECONDS (timestamp cast truncates) while the
    * residual compares the original microsecond timestamps — truncation is
    * monotone, so every qualifying pair still lands in a covered band and
    * the residual keeps sub-second exactness aligned with the oracle.
    */
  def concurrentViews(s: SparkSession, dir: String): DataFrame = {
    val ev = Corpus.events(s, dir)
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("ts").as("click_ts"))
      .withColumn("click_sec", col("click_ts").cast("long"))
    val views = ev.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("ts").as("view_ts"))
      .withColumn("start_sec", col("view_ts").cast("long"))
      .withColumn("end_sec", col("start_sec") + lit(600L))
    pointInRange(clicks, views,
        point = col("click_sec"), start = col("start_sec"),
        end = col("end_sec"), bandWidth = 600L,
        residual = Some(col("view_ts") <= col("click_ts") &&
          col("click_ts") < col("view_ts") + expr("INTERVAL 10 MINUTE")),
        joinType = "left_outer")
      .groupBy(col("click_id"), col("click_ts"))
      .agg(count(col("view_id")).as("n_concurrent"),
           max(col("view_ts")).as("latest_view_ts"))
  }

  val concurrentViewsSql: String =
    """WITH c AS (SELECT event_id AS click_id, ts AS click_ts
      |           FROM events WHERE event_type = 'click'),
      |v AS (SELECT event_id AS view_id, ts AS view_ts
      |      FROM events WHERE event_type = 'view')
      |SELECT click_id, click_ts,
      |  COUNT(view_id) AS n_concurrent,
      |  MAX(view_ts) AS latest_view_ts
      |FROM c LEFT JOIN v
      |  ON v.view_ts <= c.click_ts
      |  AND c.click_ts < v.view_ts + INTERVAL '10 minutes'
      |GROUP BY click_id, click_ts""".stripMargin
}
