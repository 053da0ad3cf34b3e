package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Z-order (Morton) clustering key over N long columns.
  *
  * Multi-dimensional data skipping: sorting a table by ONE column lines
  * parquet row-group min/max stats up with that column only — a predicate
  * on any other column scans everything. Interleaving the bits of
  * per-column RANKS (quantile-bucket ids, skew-proof where raw values are
  * not) yields a single sort key whose contiguous ranges are small
  * hyper-rectangles in all N dimensions at once, so range predicates on
  * ANY clustered column skip most row groups (the Delta/Iceberg OPTIMIZE
  * ZORDER layout, built here from public first principles).
  *
  * Per column: `bucket = upperBound(boundaries, v)` via binary search over
  * the column's sorted quantile cut points (any monotone mapping works for
  * clustering; exactness is irrelevant). NULL ranks as bucket 0 — clustered
  * together at the z-curve origin. Then
  * `z = Σ_d Σ_bit ((bucket_d >> bit) & 1) << (bit*dims + d)`, fully
  * unrolled inside whole-stage codegen; the boundary arrays ride in the
  * plan's reference array like [[BloomMightContain]]'s filter.
  *
  * The key exists only while laying data out (`Io.compactZ` range-partitions
  * and sorts on it, then writes the ORIGINAL schema) — it is never stored.
  */
case class ZOrderKey(children: Seq[Expression], boundaries: Seq[Array[Long]])
    extends Expression {

  require(children.nonEmpty && children.size == boundaries.size,
    s"one boundary array per column (${children.size} cols, ${boundaries.size} arrays)")
  require(boundaries.forall(_.length == boundaries.head.length),
    "all boundary arrays must have equal length (same bits per dimension)")

  private val dims = children.size
  // bits per dimension: boundaries carve the domain into length+1 buckets
  private val bits: Int = {
    val buckets = boundaries.head.length + 1
    val b = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1, buckets - 1).toLong)
    math.max(1, b.toInt)
  }
  require(bits * dims <= 63, s"z-value overflow: $dims dims × $bits bits > 63")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_zorder_key"

  private def bucketOf(bnd: Array[Long], v: Long): Int = {
    val i = java.util.Arrays.binarySearch(bnd, v)
    if (i >= 0) i + 1 else -(i + 1)
  }

  override def eval(input: InternalRow): Any = {
    var z = 0L
    var d = 0
    while (d < dims) {
      val raw = children(d).eval(input)
      val bucket = if (raw == null) 0 else bucketOf(boundaries(d), raw.asInstanceOf[Long])
      var bit = 0
      while (bit < bits) {
        z |= ((bucket.toLong >> bit) & 1L) << (bit * dims + d)
        bit += 1
      }
      d += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childCodes = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val perDim = childCodes.zipWithIndex.map { case (c, d) =>
      val bnd = ctx.addReferenceObj(s"zbnd$d", boundaries(d).toArray, "long[]")
      val idx = ctx.freshName("idx")
      val bucket = ctx.freshName("bucket")
      val interleave = (0 until bits).map { bit =>
        s"$z |= (((long) $bucket >> $bit) & 1L) << ${bit * dims + d};"
      }.mkString("\n")
      code"""
${c.code}
int $bucket = 0;
if (!${c.isNull}) {
  int $idx = java.util.Arrays.binarySearch($bnd, ${c.value});
  $bucket = $idx >= 0 ? $idx + 1 : -($idx + 1);
}
$interleave
"""
    }
    val body = perDim.foldLeft(code"long $z = 0L;")((acc, b) => acc + b)
    ev.copy(code = body, isNull = FalseLiteral,
      value = JavaCode.variable(z, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderFunctions {

  /** Column-DSL entry point: z-value of `cols` (cast to long by the
    * caller) under per-column sorted quantile boundaries. */
  def zkey(cols: Seq[Column], boundaries: Seq[Array[Long]]): Column =
    Bridge.column(ZOrderKey(cols.map(Bridge.expression), boundaries))
}
