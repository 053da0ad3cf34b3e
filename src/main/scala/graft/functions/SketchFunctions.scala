package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** The two mergeable corpus sketches as typed `Aggregator`s, so the SQL
  * surface (`GraftSession.registerSketches`) exposes them as first-class
  * aggregate functions: `graft_hll_users(CAST(user_id AS STRING))` and
  * `graft_log2_quantile(graft_log2_hist(n), 0.5)`.
  *
  * Both reproduce their relational twins in [[graft.operators.Sketches]]
  * BITWISE — same md5-pinned register ranks, same bucket = bitlength
  * binning, same interpolation and round(4) edge — which the spec suite
  * asserts. `reduce` runs map-side and `merge` combines partials after
  * the shuffle, so each group ships ≤ 256 ints (HLL) / ≤ 64 longs
  * (histogram) regardless of event volume: the same bounded-shuffle
  * contract the relational forms prove by construction.
  */
object SketchFunctions {

  /** The ONE definition of the HLL's shape, shared with the column form
    * in [[graft.operators.Sketches]] so the register count and bias
    * correction can never drift between the two surfaces (the derivation
    * itself exists in both column-DSL and scalar form by necessity; the
    * spec suite pins them bitwise-equal). */
  private[graft] val hllRegisters = 256
  private val m = hllRegisters
  private[graft] val hllAlphaM2: Double = 0.7213 / (1.0 + 1.079 / m) * m * m
  private val alphaM2 = hllAlphaM2

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  final case class HllBuf(regs: Array[Int])

  private val hexDigits = "0123456789abcdef".toCharArray

  // one digest per thread, not per row: reduce() runs in the aggregate
  // hot path and a JCA provider lookup per event would dominate it
  private val mdPool: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** (bucket, rho) of one value — identical to the column form in
    * [[graft.operators.Sketches.hllRegisters]]: first 2 md5 hex chars =
    * bucket, leading zero bits of the 120-bit remainder + 1 = rank. */
  private def bucketRho(md: MessageDigest, value: String): (Int, Int) = {
    val d = md.digest((value + "|hll").getBytes("UTF-8"))
    val hex = new Array[Char](32)
    var i = 0
    while (i < 16) {
      hex(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      hex(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    val bucket = Integer.parseInt(new String(hex, 0, 2), 16)
    var zeros = 0
    while (zeros < 30 && hex(2 + zeros) == '0') zeros += 1
    val rho =
      if (zeros == 30) 121
      else {
        val nlz = hex(2 + zeros) match {
          case '1' => 3
          case '2' | '3' => 2
          case '4' | '5' | '6' | '7' => 1
          case _ => 0
        }
        zeros * 4 + nlz + 1
      }
    (bucket, rho)
  }

  /** md5-pinned 256-register HLL over string keys; estimate identical to
    * [[graft.operators.Sketches.hllDistinctUsers]]'s `approx_users`. */
  val hllUsers: Aggregator[String, HllBuf, Double] =
    new Aggregator[String, HllBuf, Double] {
      def zero: HllBuf = HllBuf(new Array[Int](m))
      def reduce(b: HllBuf, value: String): HllBuf = {
        val (bucket, rho) = bucketRho(mdPool.get(), value)
        if (rho > b.regs(bucket)) b.regs(bucket) = rho
        b
      }
      def merge(a: HllBuf, b: HllBuf): HllBuf = {
        var i = 0
        while (i < m) { if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i); i += 1 }
        a
      }
      def finish(b: HllBuf): Double = {
        var s0 = 0.0; var nb = 0; var i = 0
        while (i < m) {
          if (b.regs(i) > 0) { s0 += math.pow(2.0, -b.regs(i)); nb += 1 }
          i += 1
        }
        val v = (m - nb).toDouble
        val raw = alphaM2 / (s0 + v)
        val est =
          if (raw <= 2.5 * m && nb < m) m.toDouble * math.log(m.toDouble / v)
          else raw
        round4(est)
      }
      def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
      def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }

  final case class HistBuf(counts: Array[Long])

  /** Mergeable log₂ histogram of non-negative longs: bucket = bitlength
    * (0 reserved for zeros), matching
    * [[graft.operators.Sketches.tokenQuantilesSketch]]'s binning. */
  val log2Hist: Aggregator[Long, HistBuf, Seq[Long]] =
    new Aggregator[Long, HistBuf, Seq[Long]] {
      def zero: HistBuf = HistBuf(new Array[Long](64))
      def reduce(b: HistBuf, n: Long): HistBuf = {
        // negatives are outside the sketch's domain (the relational twin
        // bins length-like values); silently bucketing them as zeros
        // would skew estimates with no error — reject loudly instead
        require(n >= 0L, s"graft_log2_hist: negative input $n (domain is n ≥ 0)")
        val bucket = if (n == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(n)
        b.counts(bucket) += 1L
        b
      }
      def merge(a: HistBuf, b: HistBuf): HistBuf = {
        var i = 0
        while (i < 64) { a.counts(i) += b.counts(i); i += 1 }
        a
      }
      def finish(b: HistBuf): Seq[Long] = b.counts.toSeq
      def bufferEncoder: Encoder[HistBuf] = Encoders.product[HistBuf]
      def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }

  /** Linear interpolation of quantile `q` inside a log₂ histogram's
    * matching bucket — the scalar half of the SQL surface, identical to
    * the relational interpolation (incl. the round(4) edge). NaN on an
    * empty histogram. */
  def log2Quantile(hist: Seq[Long], q: Double): Double = {
    val total = hist.sum
    if (total == 0L) return Double.NaN
    val r = q * total
    var cum = 0L
    var b = 0
    while (b < hist.length) {
      val cnt = hist(b)
      val below = cum
      cum += cnt
      if (cnt > 0 && below < r && cum >= r) {
        val lo = if (b == 0) 0.0 else math.pow(2.0, b - 1.0)
        val hi = if (b == 0) 0.0 else math.pow(2.0, b.toDouble)
        return round4(lo + (hi - lo) * (r - below) / cnt.toDouble)
      }
      b += 1
    }
    Double.NaN
  }
}
