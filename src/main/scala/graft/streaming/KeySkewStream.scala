package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of [[graft.operators.Relational.keySkewProfile]]: a
  * continuously-current hot-key monitor over an unbounded event stream,
  * so the salted-lookup crossover rule (BASELINE.md, key-skew regime) can
  * be evaluated LIVE — against the traffic actually flowing — instead of
  * from an offline profile that may be stale by the time a hot key
  * appears.
  *
  * Same state discipline as [[TopTermsStream]]: the Space-Saving buffer
  * IS the single state-store value (one global scope row: ≤ capacity
  * slots + one exact running count), so state never grows with volume.
  * Each micro-batch map-side-reduces its keys into partial sketches and
  * merges them in — the mergeable-summaries property the batch/property
  * specs pin down ([[graft.functions.SketchFunctions.spaceSaving]]).
  * Space-Saving guarantees any key with true frequency > n/capacity
  * occupies a slot, and `cnt` overestimates by at most `err` — exactly
  * the right bias for a skew ALARM (it can fire early, never miss a
  * sustained hot key).
  */
object KeySkewStream {

  /** events: streaming frame with a `keyCol` column. One updated global
    * row per micro-batch (update mode): the sketch slots + exact row
    * count the [[profile]] projection turns into ranked shares. */
  def hotKeys(events: DataFrame, keyCol: String = "user_id"): DataFrame = {
    val ss = udaf(graft.functions.SketchFunctions.spaceSaving,
      org.apache.spark.sql.Encoders.STRING)
    events.select(col(keyCol).cast("string").as("k"))
      .where(col("k").isNotNull)
      .groupBy(lit("global").as("scope"))
      .agg(ss(col("k")).as("top"), count(lit(1)).as("n_rows"))
  }

  /** Ranked hot-key shares from a [[hotKeys]] row — pure projections
    * (comparator `array_sort` + `slice` + `posexplode`), so it chains
    * onto the streaming aggregate without a second stateful op. `share`
    * is an upper bound (Space-Saving `cnt` ≤ true + `err`); `maxErr`
    * rides along so a consumer can see the bound. */
  def profile(hot: DataFrame, topK: Int = 5): DataFrame = {
    val sorted = expr(
      """array_sort(top, (l, r) ->
        |  CASE WHEN l.cnt > r.cnt THEN -1 WHEN l.cnt < r.cnt THEN 1
        |       WHEN l.token < r.token THEN -1 WHEN l.token > r.token THEN 1
        |       ELSE 0 END)""".stripMargin)
    hot.select(col("n_rows"), posexplode(slice(sorted, 1, topK)).as(Seq("i", "e")))
      .select((col("i") + 1).cast("long").as("rank"),
        col("e.token").as("key"), col("e.cnt").as("cnt"),
        col("e.err").as("max_err"), col("n_rows"),
        round(col("e.cnt").cast("double") / col("n_rows").cast("double"), 6)
          .as("share"))
  }
}
