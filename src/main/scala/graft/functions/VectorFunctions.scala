package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

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

object VectorFunctions {

  /** Column-DSL entry point: `dot(a, b)` with codegen. */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** SQL-surface registration (idempotent): `SELECT graft_dot(a, b)`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
}
