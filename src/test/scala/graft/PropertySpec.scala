package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DoubleType}

import graft.functions.DotProduct
import graft.model.AdCtr

/** Property-based checks of the pure algebra: the semigroups driving the
  * CTR aggregations (the reference's `model.scala:88-110` laws) and the
  * native dot-product expression. Associativity is what licenses Spark's
  * partial+final aggregation split — if these fail, distributed results
  * would depend on partitioning. */
object SemigroupProps extends Properties("semigroups") {

  private val ctrGen: Gen[AdCtr] = for {
    id <- Gen.oneOf("ad1", "ad2")
    c <- Gen.chooseNum(0, 3)
    i <- Gen.chooseNum(0, 3)
  } yield AdCtr(id, c, i)

  property("capped is associative") = forAll(ctrGen, ctrGen, ctrGen) { (a, b, c) =>
    val l = AdCtr.plusCapped(AdCtr.plusCapped(a, b), c)
    val r = AdCtr.plusCapped(a, AdCtr.plusCapped(b, c))
    l.clicks == r.clicks && l.impressions == r.impressions
  }

  property("total is associative") = forAll(ctrGen, ctrGen, ctrGen) { (a, b, c) =>
    val l = AdCtr.plusTotal(AdCtr.plusTotal(a, b), c)
    val r = AdCtr.plusTotal(a, AdCtr.plusTotal(b, c))
    l.clicks == r.clicks && l.impressions == r.impressions
  }

  property("capped clamps into {0,1} once inputs are unit counts") =
    forAll(Gen.listOfN(5, Gen.oneOf(AdCtr("a", 1, 0), AdCtr("a", 0, 1)))) { es =>
      {
        val s = es.reduce(AdCtr.plusCapped)
        s.clicks <= 1 && s.impressions <= 1 && s.clicks >= 0 && s.impressions >= 0
      }
    }

  property("total counts exactly") =
    forAll(Gen.listOfN(6, Gen.oneOf(AdCtr("a", 1, 0), AdCtr("a", 0, 1)))) { es =>
      {
        val s = es.reduce(AdCtr.plusTotal)
        s.clicks == es.count(_.clicks == 1) && s.impressions == es.count(_.impressions == 1)
      }
    }

  property("ctr is clicks/impressions or undefined") = forAll(ctrGen) { c =>
    c.ctr match {
      case None => c.impressions == 0
      case Some(v) => c.impressions > 0 && v == c.clicks.toDouble / c.impressions
    }
  }
}

/** Interpreted-eval properties of the codegen DotProduct expression vs a
  * plain Scala fold (the oracle's left-to-right summation order). */
object DotProductProps extends Properties("graft_dot") {

  private val vecGen: Gen[Array[Double]] =
    Gen.chooseNum(0, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)).map(_.toArray))

  private def dotEval(a: Array[Double], b: Array[Double]): Any =
    DotProduct(
      Literal.create(new GenericArrayData(a), ArrayType(DoubleType)),
      Literal.create(new GenericArrayData(b), ArrayType(DoubleType))).eval(null)

  property("matches a sequential fold over the common prefix") =
    forAll(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      var expected = 0.0
      var i = 0
      while (i < n) { expected += a(i) * b(i); i += 1 }
      dotEval(a, b) == expected
    }

  property("null inputs propagate null") = Prop {
    val lit = Literal.create(new GenericArrayData(Array(1.0)), ArrayType(DoubleType))
    val nul = Literal.create(null, ArrayType(DoubleType))
    DotProduct(nul, lit).eval(null) == null && DotProduct(lit, nul).eval(null) == null
  }
}

object QSqDistProps extends Properties("graft_qsqdist") {

  import graft.functions.QuantizedSqDist

  private val vecGen: Gen[Array[Double]] =
    Gen.chooseNum(0, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-10.0, 10.0)).map(_.toArray))

  private def qEval(a: Array[Double], b: Array[Double]): Any =
    QuantizedSqDist(
      Literal.create(new GenericArrayData(a), ArrayType(DoubleType)),
      Literal.create(new GenericArrayData(b), ArrayType(DoubleType))).eval(null)

  property("matches decimal-HALF_UP per-term quantization over the common prefix") =
    forAll(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      var expected = 0L
      var i = 0
      while (i < n) {
        val d = a(i) - b(i)
        // the reference semantics: Spark/DuckDB round(t, 0) then cast long
        expected += java.math.BigDecimal.valueOf(d * d * 1e8)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue()
        i += 1
      }
      qEval(a, b) == expected
    }

  property("null inputs propagate null") = Prop {
    val lit = Literal.create(new GenericArrayData(Array(1.0)), ArrayType(DoubleType))
    val nul = Literal.create(null, ArrayType(DoubleType))
    QuantizedSqDist(nul, lit).eval(null) == null &&
      QuantizedSqDist(lit, nul).eval(null) == null
  }
}

/** The Space-Saving sketch's guarantees under arbitrary partition splits
  * and merge orders — the properties that make `graft_top_terms` safe as a
  * distributed aggregate. The oracle-checked query runs in the exact
  * (under-capacity) regime; these properties cover the 100 TB regime the
  * oracle can't: over-capacity streams where only the BOUNDS are
  * deterministic. */
object SpaceSavingProps extends Properties("space-saving") {

  private val agg = graft.functions.SketchFunctions.spaceSaving
  private val k = graft.functions.SketchFunctions.ssCapacity

  // skewed pool of 4·k possible keys so streams overflow the capacity
  private val tokGen: Gen[String] = Gen.frequency(
    (40, Gen.const("hot")),
    (15, Gen.oneOf("warm1", "warm2", "warm3")),
    (5, Gen.chooseNum(0, 4 * k - 1).map("t" + _)))

  private def sketchOf(stream: List[String], nSplits: Int) = {
    val chunkSize = math.max(1, (stream.size + nSplits - 1) / math.max(nSplits, 1))
    val bufs = stream.grouped(chunkSize)
      .map(c => c.foldLeft(agg.zero)(agg.reduce)).toList
    agg.finish(bufs.reduceOption(agg.merge).getOrElse(agg.zero))
  }

  property("estimates bracket true counts under arbitrary splits") =
    forAll(Gen.listOf(tokGen), Gen.chooseNum(1, 7)) { (stream, nSplits) =>
      val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      sketchOf(stream, nSplits).forall { e =>
        val t = truth.getOrElse(e.token, 0L)
        e.cnt >= t && e.cnt - e.err <= t
      }
    }

  property("exact and split-invariant when distinct keys fit the capacity") =
    forAll(Gen.listOf(Gen.oneOf("a", "b", "c", "d", "e")), Gen.chooseNum(1, 7)) {
      (stream, nSplits) =>
        val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val out = sketchOf(stream, nSplits)
        out.size == truth.size &&
          out.forall(e => truth.get(e.token).contains(e.cnt) && e.err == 0L)
    }
}


/** [[graft.operators.TextAnalysis.collapseWs]] must be bit-equal to the
  * `replaceAll("\\s+", " ")` it hand-compiles (the per-document regex
  * compile was the hottest scalar call under every typed text kernel --
  * round-15 optimization). The generator leans on adversarial shapes:
  * runs of mixed whitespace, edges, lone spaces, empty strings. */
object CollapseWsProps extends Properties("collapse-ws") {
  import graft.operators.TextAnalysis

  private val wsChar = Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r')
  private val piece: Gen[String] = Gen.frequency(
    (4, Gen.alphaNumStr.map(_.take(6))),
    (3, wsChar.map(_.toString)),
    (2, Gen.listOfN(3, wsChar).map(_.mkString)),
    (1, Gen.const("")),
    (1, Gen.oneOf("\u00a0", "\u2009", "\u00e9"))) // unicode ws-lookalikes: NOT \s
  private val textGen: Gen[String] =
    Gen.listOf(piece).map(_.mkString)

  property("bit-equal to replaceAll(\\s+, space)") = forAll(textGen) { s =>
    TextAnalysis.collapseWs(s) == s.replaceAll("\\s+", " ")
  }
}


/** The substring/byte-slice gram kernels (round-15 optimization) must be
  * set- and byte-equal to the `sliding(n).map(_.mkString(" "))` reference
  * they replaced: [[graft.operators.TextAnalysis.distinctGrams]] against
  * the sliding form over `normTokens`, [[graft.operators.Dedup.shinglesOf]]
  * including its whole-doc short-text fallback, and
  * [[graft.operators.Dedup.normByteBounds]]'s window byte ranges against
  * `slice(p, p+n).mkString(" ").getBytes(UTF_8)`. */
object GramSubstringProps extends Properties("gram-substrings") {
  import scala.jdk.CollectionConverters._
  import graft.operators.{Dedup, TextAnalysis}

  private val wsChar = Gen.oneOf(' ', '\t', '\n', '\u000B', '\f', '\r')
  private val piece: Gen[String] = Gen.frequency(
    (5, Gen.oneOf("a", "bb", "ccc", "Dd", "e1", "\u00e9\u4e2d")),
    (4, Gen.const(" ")),
    (2, wsChar.map(_.toString)),
    (1, Gen.listOfN(2, wsChar).map(_.mkString)))
  private val textGen: Gen[String] = Gen.listOf(piece).map(_.mkString)
  private val nGen: Gen[Int] = Gen.oneOf(2, 3, 5, 13)

  private def refGrams(text: String, n: Int): Set[String] = {
    val toks = TextAnalysis.normTokens(text)
    if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).toSet
    else null
  }

  property("distinctGrams == sliding/mkString/toSet") =
    forAll(textGen, nGen) { (s, n) =>
      val fast = TextAnalysis.distinctGrams(s, n)
      val ref = refGrams(s, n)
      if (ref == null) fast == null
      else fast != null && fast.asScala == ref
    }

  property("shinglesOf keeps the whole-doc fallback") = forAll(textGen) { s =>
    val toks = TextAnalysis.normTokens(s)
    val ref =
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet
      else Set(toks.mkString(" "))
    Dedup.shinglesOf(s) == ref
  }

  property("normByteBounds windows == slice/mkString/getBytes") =
    forAll(textGen, nGen) { (s, n) =>
      val (bytes, starts, count) = Dedup.normByteBounds(s)
      val toks = TextAnalysis.normTokens(s)
      val refCount = if (toks.length == 1 && toks(0).isEmpty) 0 else toks.length
      // counts agree except the Java ""-split special case (both < n)
      (count == refCount || (count < n && toks.length < n)) && {
        if (toks.length < n || count < n) true
        else (0 to count - n).forall { p =>
          val ref = toks.slice(p, p + n).mkString(" ")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          java.util.Arrays.equals(ref,
            java.util.Arrays.copyOfRange(bytes, starts(p), starts(p + n) - 1))
        }
      }
    }
}
