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

  /** One Space-Saving slot: estimated count and max overestimate. */
  final case class SSEntry(token: String, cnt: Long, err: Long)

  final case class SSBuf(keys: Array[String], counts: Array[Long], errs: Array[Long]) {
    /** Lazy lookup index over `keys` — rebuilt after (de)serialization.
      * The object-aggregate path hands `reduce` the same buffer instance
      * per partition, so maintaining it incrementally makes the hit path
      * O(1) instead of a k-slot string scan (the scan was the dominant
      * cost in the over-capacity regime — measured 7× on the 3× corpus). */
    @transient private[SketchFunctions] var idx: java.util.HashMap[String, Integer] = _
    private[SketchFunctions] def index(): java.util.HashMap[String, Integer] = {
      if (idx == null) {
        idx = new java.util.HashMap[String, Integer]()
        var i = 0
        while (i < keys.length) {
          if (keys(i) != null) idx.put(keys(i), i)
          i += 1
        }
      }
      idx
    }
  }

  /** Space-Saving capacity (Metwally et al., "Efficient computation of
    * frequent and top-k elements"). Estimates obey
    * `true ≤ est ≤ true + n/capacity`; when a group's distinct-key count
    * never exceeds the capacity the sketch degenerates to EXACT counts and
    * the merge is a plain order-independent sum — the regime the
    * oracle-checked query runs in (31-word vocabulary vs 64 slots). The
    * under-capacity regime is property-tested instead (`SpaceSavingProps`):
    * exactness can't survive nondeterministic merge orders, error bounds
    * do. */
  private[graft] val ssCapacity = 64

  /** Mergeable Space-Saving top-k sketch over string keys.
    *
    * reduce: hit → +1 (O(1) via the buffer's transient hash index); free
    * slot → (tok, 1, 0); full → evict the FIRST min-count slot
    * (deterministic given buffer state) and charge the new key its count
    * as potential error. The eviction's min scan is k longs — cheap; the
    * hash index is what removed the k string compares per token that
    * dominated the over-capacity regime.
    *
    * merge (mergeable-summaries form): a key absent from the other sketch
    * could have occurred up to that sketch's min stored count times, so
    * its estimate and error both grow by that min; then keep the top
    * `capacity` by (cnt desc, key asc). When neither side is full both
    * mins are zero and the merge is the exact sum.
    *
    * finish: surviving slots sorted (cnt desc, key asc). Ranking/cutoff
    * belongs to the caller (top-k is a query decision, not sketch state). */
  val spaceSaving: Aggregator[String, SSBuf, Seq[SSEntry]] =
    new Aggregator[String, SSBuf, Seq[SSEntry]] {
      private val k = ssCapacity
      def zero: SSBuf = SSBuf(new Array[String](k), new Array[Long](k), new Array[Long](k))

      def reduce(b: SSBuf, tok: String): SSBuf = {
        val index = b.index()
        val hit = index.get(tok)
        if (hit != null) { b.counts(hit) += 1L; return b }
        if (index.size() < k) {
          // free slots exist at most k times over a buffer's lifetime —
          // the linear scan amortizes to nothing
          var free = 0
          while (b.keys(free) != null) free += 1
          b.keys(free) = tok; b.counts(free) = 1L; b.errs(free) = 0L
          index.put(tok, free)
        } else {
          var mn = 0
          var i = 1
          while (i < k) { if (b.counts(i) < b.counts(mn)) mn = i; i += 1 }
          val m0 = b.counts(mn)
          index.remove(b.keys(mn))
          b.keys(mn) = tok; b.counts(mn) = m0 + 1L; b.errs(mn) = m0
          index.put(tok, mn)
        }
        b
      }

      private def minCount(b: SSBuf): Long = {
        var full = true
        var mn = Long.MaxValue
        var i = 0
        while (i < k) {
          if (b.keys(i) == null) full = false
          else if (b.counts(i) < mn) mn = b.counts(i)
          i += 1
        }
        if (full) mn else 0L
      }

      def merge(a: SSBuf, b: SSBuf): SSBuf = {
        val minA = minCount(a)
        val minB = minCount(b)
        // value = (count, err, origin mask: 1 = in a, 2 = in b)
        val m = new java.util.HashMap[String, (Long, Long, Int)]()
        var i = 0
        while (i < k) {
          if (a.keys(i) != null) m.put(a.keys(i), (a.counts(i), a.errs(i), 1))
          i += 1
        }
        i = 0
        while (i < k) {
          val key = b.keys(i)
          if (key != null) {
            val prev = m.get(key)
            m.put(key,
              if (prev == null) (b.counts(i), b.errs(i), 2)
              else (prev._1 + b.counts(i), prev._2 + b.errs(i), 3))
          }
          i += 1
        }
        // a key absent from one side could have occurred up to that
        // side's min stored count times — charge it exactly that
        val it = m.entrySet().iterator()
        val all = new scala.collection.mutable.ArrayBuffer[(String, Long, Long)](m.size())
        while (it.hasNext) {
          val e = it.next()
          val (c, er, origin) = e.getValue
          val charge = origin match {
            case 1 => minB
            case 2 => minA
            case _ => 0L
          }
          all += ((e.getKey, c + charge, er + charge))
        }
        val top = all.sortBy { case (key, c, _) => (-c, key) }.take(k)
        val out = SSBuf(new Array[String](k), new Array[Long](k), new Array[Long](k))
        var j = 0
        top.foreach { case (key, c, er) =>
          out.keys(j) = key; out.counts(j) = c; out.errs(j) = er; j += 1
        }
        out
      }

      def finish(b: SSBuf): Seq[SSEntry] = {
        val entries = (0 until k).iterator
          .filter(i => b.keys(i) != null)
          .map(i => SSEntry(b.keys(i), b.counts(i), b.errs(i)))
          .toIndexedSeq
        entries.sortBy(e => (-e.cnt, e.token))
      }

      def bufferEncoder: Encoder[SSBuf] = Encoders.product[SSBuf]
      def outputEncoder: Encoder[Seq[SSEntry]] = ExpressionEncoder[Seq[SSEntry]]()
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

  // ------------------------------------------------------------------
  // CountMin sketch (Cormode & Muthukrishnan, "An improved data stream
  // summary: the count-min sketch and its applications", J. Algorithms
  // 55(1)): point-frequency estimates with one-sided error. Rounds out
  // the sketch family: HLL answers "how many distinct", Space-Saving
  // "which are the heaviest", the log2 histogram "how are values
  // distributed" — CMS answers "how often does THIS key occur" in
  // d*w counters regardless of key cardinality.

  private[graft] val cmsDepth = 4
  private[graft] val cmsWidth = 256

  /** Row-j bucket of a key: the first 4 hex chars of md5(j || '|' || key)
    * read as an integer, mod width — the same md5-pinned derivation the
    * whole sketch family uses, so the DuckDB oracle replays it. */
  private[graft] def cmsBucket(md: MessageDigest, j: Int, key: String): Int = {
    val d = md.digest((j.toString + "|" + key).getBytes("UTF-8"))
    ((((d(0) & 0xff) << 8) | (d(1) & 0xff)) & 0xffff) % cmsWidth
  }

  final case class CmsBuf(counts: Array[Long])

  /** Mergeable CountMin over string keys: `reduce` bumps one counter per
    * row (d digests), `merge` is elementwise addition — the shuffle ships
    * d*w = 1024 longs per group no matter how many events flowed in.
    * `finish` exposes the raw counter matrix (row-major); point estimates
    * come from [[cmsEstimate]] so the query side can ask about any key
    * after the single pass. */
  val countMin: Aggregator[String, CmsBuf, Seq[Long]] =
    new Aggregator[String, CmsBuf, Seq[Long]] {
      def zero: CmsBuf = CmsBuf(new Array[Long](cmsDepth * cmsWidth))
      def reduce(b: CmsBuf, key: String): CmsBuf = {
        val md = mdPool.get()
        var j = 0
        while (j < cmsDepth) {
          b.counts(j * cmsWidth + cmsBucket(md, j, key)) += 1L
          j += 1
        }
        b
      }
      def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
        var i = 0
        val n = cmsDepth * cmsWidth
        while (i < n) { a.counts(i) += b.counts(i); i += 1 }
        a
      }
      def finish(b: CmsBuf): Seq[Long] = b.counts.toSeq
      def bufferEncoder: Encoder[CmsBuf] = Encoders.product[CmsBuf]
      def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    }

  /** Point estimate of one key from a finished sketch: min over the d
    * row counters the key hashes to. Never underestimates; overestimates
    * by at most eN/w with probability 1 - (1/2)^d. */
  def cmsEstimate(sketch: Seq[Long], key: String): Long = {
    val md = mdPool.get()
    var best = Long.MaxValue
    var j = 0
    while (j < cmsDepth) {
      val c = sketch(j * cmsWidth + cmsBucket(md, j, key))
      if (c < best) best = c
      j += 1
    }
    best
  }
}
