package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.GoQuoteExpr

/** Engine extensions, injected via `spark.sql.extensions` (wired in
  * [[GraftSession.builder]]): exposes the native expressions to SQL —
  * `SELECT go_quote(payload) ...`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("go_quote"),
      new ExpressionInfo(classOf[GoQuoteExpr].getName, "go_quote"),
      (children: Seq[Expression]) => GoQuoteExpr(children.head)))
  }
}
