package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.GoQuoteExpr

/** Engine extensions, injected via `spark.sql.extensions` (wired in
  * [[GraftSession.builder]]): exposes the native expressions to SQL —
  * `SELECT go_quote(payload) ...`, `ORDER BY zorder16(x, y)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("go_quote"),
      new ExpressionInfo(classOf[GoQuoteExpr].getName, "go_quote"),
      (children: Seq[Expression]) => {
        if (children.length != 1)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "go_quote", "expectedNum" -> "1",
              "actualNum" -> children.length.toString, "docroot" -> ""))
        GoQuoteExpr(children.head)
      }))
    // zorder16(x, y): the Morton clustering key as a SQL function. The
    // builder composes built-in codegen arithmetic expression nodes
    // (same semantics as Layout.zvalue16's Column tree), so SQL users
    // get whole-stage-codegen interleaving with no new Expression class.
    ext.injectFunction((
      new FunctionIdentifier("zorder16"),
      new ExpressionInfo(graft.operators.Layout.getClass.getName, "zorder16"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "zorder16", "expectedNum" -> "2",
              "actualNum" -> children.length.toString, "docroot" -> ""))
        graft.operators.Layout.zvalue16Expr(children(0), children(1))
      }))
    // hilbert16(x, y): the Hilbert clustering key as a SQL function —
    // backed by the codegen'd HilbertExpr kernel (the rotation loop
    // can't be a flat built-in-node tree; see graft.functions.Hilbert).
    ext.injectFunction((
      new FunctionIdentifier("hilbert16"),
      new ExpressionInfo(classOf[graft.functions.HilbertExpr].getName, "hilbert16"),
      (children: Seq[Expression]) => {
        if (children.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map(
              "functionName" -> "hilbert16", "expectedNum" -> "2",
              "actualNum" -> children.length.toString, "docroot" -> ""))
        graft.functions.Hilbert.hvalue16Expr(children(0), children(1))
      }))
  }
}
