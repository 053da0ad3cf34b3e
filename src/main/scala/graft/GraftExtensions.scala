package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProduct, HyperplaneSignature, VectorFunctions}

/** Catalyst extension entry point: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` — or
  * `spark.sql.extensions=graft.GraftExtensions` — injects graft's native
  * expressions into the SQL function registry (so `SELECT graft_dot(a, b)`
  * works from pure SQL with full whole-stage codegen) and the one
  * optimizer rule the surface turned out to need:
  * [[graft.plans.BandedRangeJoinRule]], which rewrites keyless
  * point-in-range joins into banded equi-joins when
  * `spark.graft.rangeJoin.bandWidth` is set (opt-in; unset = Catalyst
  * untouched). Every other optimization the reference obtains remains a
  * Catalyst/AQE built-in (SURVEY.md §4) — graft's custom code stays
  * concentrated in expressions and state operators.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => new graft.plans.BandedRangeJoinRule)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "graft_hyperplane_sig"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HyperplaneSignature(exprs.head, VectorFunctions.sigPlanesFromLiteral(exprs(1)))))
  }
}
