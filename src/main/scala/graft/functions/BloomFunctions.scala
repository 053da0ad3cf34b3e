package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst Bloom-filter membership probe over a string column.
  *
  * [[graft.operators.Dedup.contaminationBloom]]'s prefilter was a Scala
  * UDF (`udf(bf.mightContainString _)`) — Spark exposes no public
  * might-contain expression; its internal one serves the runtime-filter
  * rewrite only. A `ScalaUDF` in that spot costs a
  * `UTF8String → java.lang.String` conversion plus a boxed call per
  * probed gram, and it opens a codegen boundary in what is otherwise the
  * operator's single fused scan-project-filter span. This expression
  * probes the filter's bit array directly from the UTF8 bytes inside
  * whole-stage codegen — the same hash (`mightContainBinary` over UTF-8
  * bytes) Spark's own `mightContainString` delegates to, so the verdicts
  * are identical to the UDF it replaces.
  *
  * The filter rides in the plan's reference array (`addReferenceObj`),
  * shipped once per task exactly like the broadcast the UDF closed over.
  */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(g: Any): Any =
    filter.mightContainBinary(g.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloom", filter, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, g =>
      s"${ev.value} = $bf.mightContainBinary($g.getBytes());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFunctions {

  /** Column-DSL entry point: `mightContain(bf, gramHash)` with codegen. */
  def mightContain(filter: BloomFilter, c: Column): Column =
    Bridge.column(BloomMightContain(Bridge.expression(c), filter))
}
