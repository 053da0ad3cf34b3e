package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Sketches

/** At-ingestion table stats — the streaming twin of the batch
  * `stats_incremental` maintenance pass: the warehouse's ANALYZE keeps
  * up with the stream instead of waiting for the nightly merge, emitting
  * a refreshed per-column stats row every micro-batch (update mode,
  * latest-wins downstream — the optimizer consults the newest row).
  *
  * Division of labor is what makes stream ≡ batch exact: the
  * bucket/rho derivation and the NDV estimator stay in the SAME shared
  * Catalyst expressions the batch paths use
  * ([[Sketches.streamStackedOf]] before the stateful operator,
  * [[Sketches.finalizeStatsCols]] after it — zero drift by
  * construction), and the state handler folds only longs and min/max —
  * every one of which is associative and order-free, the same
  * mergeability argument `stats_incremental` rests on. State per column
  * = 256 register slots + counts + typed bounds: CORPUS-SIZE-FREE, the
  * bounded-state contract every leg in the matrix honors (and here the
  * key count is the column count — five states total).
  *
  * The one float in the pipeline (s0 = Σ 2⁻ʳʰᵒ) is summed in ascending
  * register order — deterministic under any micro-batching; the batch
  * side sums it in partition order, so the shared 1e-4 rounding on the
  * estimate absorbs the last-ulp difference (the `unigram_logprob`
  * policy, same residual documented there). */
object StreamStats {

  private val m = graft.functions.SketchFunctions.hllRegisters

  final case class ColStats(
      nRows: Long, nNulls: Long,
      maxRho: Seq[Int],
      minNum: Option[Double], maxNum: Option[Double],
      minStr: Option[String], maxStr: Option[String])

  final case class StatsRow(
      col_name: String, n_rows: Long, n_nulls: Long,
      s0: Double, nb: Long,
      min_num: Option[Double], max_num: Option[Double],
      min_str: Option[String], max_str: Option[String])

  /** li: streaming frame with the five stats columns. One refreshed
    * stats row per column per micro-batch. */
  def stats(s: SparkSession, li: DataFrame): DataFrame = {
    import s.implicits._
    val folded = Sketches.streamStackedOf(li)
      .as[(String, Option[Int], Option[Int], Option[Double], Option[String])]
      .groupByKey(_._1)
      .flatMapGroupsWithState(
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (colName: String,
         rows: Iterator[(String, Option[Int], Option[Int], Option[Double], Option[String])],
         state: GroupState[ColStats]) =>
          val st = state.getOption.getOrElse(
            ColStats(0L, 0L, Seq.fill(m)(-1), None, None, None, None))
          val rho = st.maxRho.toArray
          var (nRows, nNulls) = (st.nRows, st.nNulls)
          var (minNum, maxNum) = (st.minNum, st.maxNum)
          var (minStr, maxStr) = (st.minStr, st.maxStr)
          rows.foreach { case (_, bucket, r, numV, strV) =>
            nRows += 1
            bucket match {
              case Some(b) =>
                val rv = r.getOrElse(0)
                if (rv > rho(b)) rho(b) = rv
              case None => nNulls += 1
            }
            numV.foreach { v =>
              if (minNum.forall(v < _)) minNum = Some(v)
              if (maxNum.forall(v > _)) maxNum = Some(v)
            }
            strV.foreach { v =>
              if (minStr.forall(v < _)) minStr = Some(v)
              if (maxStr.forall(v > _)) maxStr = Some(v)
            }
          }
          state.update(
            ColStats(nRows, nNulls, rho.toSeq, minNum, maxNum, minStr, maxStr))
          // s0 in ascending register order: deterministic under any
          // batching (the batch side's partition-order sum differs at
          // most in the last ulp, absorbed by the shared rounding)
          var s0 = 0.0
          var nb = 0L
          var i = 0
          while (i < m) {
            if (rho(i) >= 0) { s0 += math.pow(2.0, -rho(i)); nb += 1 }
            i += 1
          }
          Iterator.single(StatsRow(colName, nRows, nNulls, s0, nb,
            minNum, maxNum, minStr, maxStr))
      }
    Sketches.finalizeStatsCols(folded.toDF())
  }
}
