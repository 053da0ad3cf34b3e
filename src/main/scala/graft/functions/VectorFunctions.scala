package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The similarity operators (ANN top-k, embedding near-dup — SURVEY.md §7.3
  * stage 8) evaluate a dot product once per *candidate pair*; inside an
  * all-pairs or bucket join that is the innermost loop of the whole query.
  * The composable `aggregate(zip_with(...))` form is interpreted (higher-order
  * functions allocate a lambda frame per element and box every double), which
  * made the near-dup scan bottleneck ~30 s at sf0.1. This expression emits a
  * primitive `for` loop via `doGenCode` and stays inside whole-stage codegen —
  * the brief's preferred extension point (native `Expression` > UDF).
  *
  * Summation folds left-to-right, bit-identical to DuckDB's `list_sum(
  * list_transform(...))` oracle expression and to the interpreted form it
  * replaces.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be array<double>; graft's call sites cast the float
  // embeddings exactly once at the scan edge. (No ExpectsInputTypes — Spark 4
  // keeps AbstractDataType private[sql].)
  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native fused hyperplane-LSH signature: the sign bits of `v · plane_p`
  * for every hyperplane, packed little-endian into one long
  * (`bit p = 1 ⟺ dot(v, planes(p)) ≥ 0`).
  *
  * The LSH operators (`Similarity.annLshBucketed`, `embeddingNearDups`)
  * previously composed 8–16 independent `DotProduct` expressions per row —
  * 16 codegen'd loops each re-reading the same 64-element vector from
  * unsafe row storage. This expression makes one pass over the vector per
  * plane with the plane matrix held as a flat primitive `double[]` in the
  * references array: the whole signature is one fused loop nest inside
  * whole-stage codegen.
  *
  * The plane matrix is a constructor parameter, not a child expression —
  * it is always a query-compile-time constant (derived from md5 parities,
  * [[VectorFunctions.planesFor]]), so embedding it as a reference object
  * keeps the generated code free of per-row ArrayData indirection.
  */
case class HyperplaneSignature(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_hyperplane_sig"

  private lazy val nPlanes = planes.length
  private lazy val dims = if (planes.isEmpty) 0 else planes.head.length
  // row-major [plane][dim] flattened for a primitive codegen loop
  private lazy val flat: Array[Double] = planes.flatten.toArray

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val d = math.min(dims, v.numElements())
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      val off = p * dims
      var s = 0.0
      var i = 0
      while (i < d) { s += v.getDouble(i) * flat(off + i); i += 1 }
      if (s >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val pl = ctx.addReferenceObj("planes", flat, "double[]")
      val d = ctx.freshName("d")
      val sig = ctx.freshName("sig")
      val p = ctx.freshName("p")
      val off = ctx.freshName("off")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      s"""
         |int $d = java.lang.Math.min($dims, $a.numElements());
         |long $sig = 0L;
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  int $off = $p * $dims;
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $s += $a.getDouble($i) * $pl[$off + $i];
         |  }
         |  if ($s >= 0.0) $sig |= (1L << $p);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native per-term-quantized squared distance between two `array<double>`
  * columns: `Σ_i round_half_up((a_i − b_i)² · 1e8) : long`, folded
  * left-to-right.
  *
  * The k-means family evaluates this once per (vector, centroid) pair —
  * n×k per assignment pass, three passes per query. As
  * `aggregate(zip_with(round(...)))` it is CodegenFallback: an
  * interpreted lambda frame and a boxed double per element, which made
  * `kmeans_assign`/`semdedup` the two most expensive queries of the r8
  * suite once k self-sized past the literal path (sf0.1: 5.8 s / 5.0 s).
  * This is the same cure as [[DotProduct]]: a primitive loop inside
  * whole-stage codegen.
  *
  * Rounding: terms are nonnegative, so decimal HALF_UP (Spark's `round`,
  * DuckDB's `round`) coincides with `floor(t) + (t − floor(t) ≥ 0.5)`,
  * computed here without the `t + 0.5` addition whose float rounding
  * could cross an integer boundary. `t − floor(t)` is exact for the
  * magnitudes involved (Sterbenz), so the term value is bit-identical to
  * the oracle's `CAST(round(t, 0) AS BIGINT)`.
  */
case class QuantizedSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_qsqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i)
      val t = d * d * 1e8
      val f = math.floor(t)
      s += f.toLong + (if (t - f >= 0.5) 1L else 0L)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val f = ctx.freshName("f")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  double $t = $d * $d * 1e8;
         |  double $f = java.lang.Math.floor($t);
         |  $s += (long) $f + (($t - $f >= 0.5) ? 1L : 0L);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Fused nearest-centroid assignment: argmin over k centroids of the
  * [[QuantizedSqDist]] metric, ties to the SMALLER centroid index —
  * exactly `row_number() OVER (ORDER BY qd, cluster)` = 1 in the oracle.
  *
  * The k-means assignment pass is `n × k` distance evaluations. As a
  * crossJoin against a broadcast centroid frame + per-vec_id argmin
  * aggregate, Spark materializes all n×k joined rows (18.8M at sf1's
  * self-sized k = 313) just to reduce them again — measured 13 s of the
  * sf1 bench. With the centroid matrix as a flat `double[]` in the plan's
  * reference array (the [[HyperplaneSignature]] pattern), assignment is a
  * shuffle-free narrow projection at ANY k: one fused loop nest per row
  * inside whole-stage codegen, no join, no exchange, no per-pair row. One
  * code path replaces both the old literal-bake (k ≤ 16) and
  * broadcast-argmin branches.
  */
case class ArgMinQDist(child: Expression, cents: Array[Double], k: Int)
    extends UnaryExpression {

  require(k > 0 && cents.length % k == 0,
    s"centroid matrix length ${cents.length} not a multiple of k=$k")
  private val stride = cents.length / k

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_argmin_qdist"

  override def nullSafeEval(a: Any): Any = {
    // one ArrayData→double[] copy per row (k×dims getDouble calls
    // otherwise), and early exit per centroid: every quantized term is
    // ≥ 0, so the partial sum is monotone — once s ≥ bestQd this
    // centroid cannot strictly beat the incumbent (ties lose to the
    // smaller index anyway), so the argmin is bit-identical while the
    // inner loop prunes most of the n×k×d work at large k.
    val v = a.asInstanceOf[ArrayData].toDoubleArray()
    var best = 0L
    var bestQd = Long.MaxValue
    var c = 0
    while (c < k) {
      val off = c * stride
      val n = math.min(v.length, stride)
      var s = 0L
      var i = 0
      while (i < n && s < bestQd) {
        val d = v(i) - cents(off + i)
        val t = d * d * 1e8
        val f = math.floor(t)
        s += f.toLong + (if (t - f >= 0.5) 1L else 0L)
        i += 1
      }
      if (s < bestQd) { bestQd = s; best = c.toLong }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("cents", cents, "double[]")
      val best = ctx.freshName("best")
      val bestQd = ctx.freshName("bestQd")
      val c = ctx.freshName("c")
      val off = ctx.freshName("off")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val t = ctx.freshName("t")
      val f = ctx.freshName("f")
      val vv = ctx.freshName("vv")
      // same two codegen changes as nullSafeEval: one toDoubleArray copy
      // per row, and the `s < bestQd` early exit (monotone partial sums,
      // ties lose to the smaller index — argmin bit-identical)
      s"""
         |double[] $vv = $a.toDoubleArray();
         |long $best = 0L;
         |long $bestQd = Long.MAX_VALUE;
         |for (int $c = 0; $c < $k; $c++) {
         |  int $off = $c * $stride;
         |  int $n = java.lang.Math.min($vv.length, $stride);
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n && $s < $bestQd; $i++) {
         |    double $d = $vv[$i] - $m[$off + $i];
         |    double $t = $d * $d * 1e8;
         |    double $f = java.lang.Math.floor($t);
         |    $s += (long) $f + (($t - $f >= 0.5) ? 1L : 0L);
         |  }
         |  if ($s < $bestQd) { $bestQd = $s; $best = (long) $c; }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {

  /** Column-DSL entry point: `dot(a, b)` with codegen. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Column-DSL entry point: quantized squared distance with codegen. */
  def qSqDist(a: Column, b: Column): Column =
    Bridge.column(QuantizedSqDist(Bridge.expression(a), Bridge.expression(b)))

  /** Column-DSL entry point: fused nearest-centroid id (flat row-major
    * k×dims matrix) with codegen. */
  def argMinQDist(v: Column, cents: Array[Double], k: Int): Column =
    Bridge.column(ArgMinQDist(Bridge.expression(v), cents, k))

  /** Column-DSL entry point: packed hyperplane sign bits of `v`. */
  def hyperplaneSig(v: Column, planes: Seq[Seq[Double]]): Column =
    Bridge.column(HyperplaneSignature(Bridge.expression(v), planes))

  /** Deterministic ±1 hyperplane matrix shared by the LSH operators and
    * the SQL oracles: sign(p, d) from the md5 parity of "p|d" — no RNG,
    * identical on any engine, embeddable as literals in oracle SQL.
    * At most 64 planes: the signature packs one bit per plane into a long,
    * and Java's `1L << p` silently wraps mod 64 past that. */
  def planesFor(n: Int, dims: Int = 64): Seq[Seq[Double]] = {
    require(n >= 1 && n <= 64, s"plane count must be in [1, 64], got $n")
    planesRange(0, n, dims)
  }

  /** Plane indices [from, until) of the SAME deterministic matrix —
    * the widening seam past the one-long 64-plane budget: a second
    * signature column packs planes 64..127 (`planesRange(64, 128)`),
    * and because the matrix is indexed globally, plane `p` is identical
    * whether it lands in word 0 or word 1 (so a wide signature's first
    * word IS the narrow signature, and wide candidate sets are
    * supersets by construction). At most 64 planes per call — one
    * packed long's worth. */
  def planesRange(from: Int, until: Int, dims: Int = 64): Seq[Seq[Double]] = {
    require(from >= 0 && until > from && until - from <= 64,
      s"a signature word packs at most 64 planes, got [$from, $until)")
    (from until until).map { p =>
      (0 until dims).map { d =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p|$d".getBytes("UTF-8"))
        if ((hex.last & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** SQL-surface registration (idempotent): `SELECT graft_dot(a, b)`,
    * `SELECT graft_hyperplane_sig(v, 8)` (md5 planes over 64 dims). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_hyperplane_sig",
      exprs => HyperplaneSignature(exprs.head, sigPlanesFromLiteral(exprs(1))),
      "built-in")
  }

  /** Resolves the literal plane-count arg of the SQL surface
    * (int or bigint literal, validated to the packable [1, 64] range). */
  def sigPlanesFromLiteral(e: Expression): Seq[Seq[Double]] =
    e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) => planesFor(n)
      case org.apache.spark.sql.catalyst.expressions.Literal(n: Long, _) => planesFor(n.toInt)
      case other => throw new IllegalArgumentException(
        s"graft_hyperplane_sig expects a literal plane count, got $other")
    }
}
