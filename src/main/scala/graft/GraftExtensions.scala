package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProduct, HyperplaneSignature, VectorFunctions}

/** Catalyst extension entry point: `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` — or
  * `spark.sql.extensions=graft.GraftExtensions` — injects graft's native
  * expressions into the SQL function registry, so `SELECT graft_dot(a, b)`
  * works from pure SQL with full whole-stage codegen.
  *
  * No custom optimizer rules or strategies are registered: SURVEY.md §4's
  * conclusion holds — every optimization the reference obtains is a
  * Catalyst/AQE built-in; graft's custom code concentrates in expressions
  * and state operators. This class is the seam where rules/strategies
  * would plug in if the surface ever needs them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
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
