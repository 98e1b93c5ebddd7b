package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve clustering key (Hilbert 1891; the d2xy/xy2d iterative
  * form is the public-domain algorithm in Warren, Hacker's Delight §16 /
  * Wikipedia "Hilbert curve"): maps the low 16 bits of (x, y) to the
  * point's index along the order-16 Hilbert space-filling curve.
  *
  * Why alongside Z-order ([[graft.operators.Layout.zvalue16]]): both
  * give every file a bounding BOX over two keyed dims, but the Hilbert
  * curve has strictly better locality — consecutive curve positions are
  * always grid NEIGHBORS (Z-order jumps at power-of-two seams, e.g.
  * z=2⁣→3 spans the whole quadrant diagonal), so equal-size key ranges
  * cut tighter boxes and range predicates prune more files. Iceberg and
  * ClickHouse ship Hilbert next to Z-order for exactly this trade
  * (costlier key, tighter boxes).
  *
  * The 16-round rotation loop cannot be a flat arithmetic Column tree
  * (each round's (x, y) feeds the next — inlining doubles the tree per
  * round, 2¹⁶ nodes), so unlike `zorder16`'s built-in-node tree this is
  * a custom codegen'd [[HilbertExpr]] calling the primitive-loop kernel
  * — the (b) tier of the extension ladder (custom Expression before
  * custom physical operator), same as [[GoQuoteExpr]].
  */
object Hilbert {

  /** Index of (x₁₆, y₁₆) along the order-16 Hilbert curve, in
    * [0, 2³²). Inputs are masked to 16 bits. Pure long arithmetic —
    * deterministic on any JVM. */
  def d16(x0: Long, y0: Long): Long = {
    var x = x0 & 0xFFFFL
    var y = y0 & 0xFFFFL
    var d = 0L
    var s = 1L << 15
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // rotate the quadrant so the sub-curve orients
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Column form over two integral columns (cast to long, masked). */
  def hvalue16(x: Column, y: Column): Column =
    ColumnBridge.column(hvalue16Expr(
      ColumnBridge.expression(x), ColumnBridge.expression(y)))

  /** Expression form — what the SQL function registry needs. */
  def hvalue16Expr(x: Expression, y: Expression): Expression =
    HilbertExpr(Cast(x, LongType), Cast(y, LongType))
}

/** [[Hilbert.d16]] as a codegen'd binary expression: whole-stage
  * codegen emits a static call to the primitive-loop kernel — the
  * 16-round data-dependent loop stays a loop instead of a 2¹⁶-node
  * expression tree, and the projection stays inside the generated
  * stage (no UDF closure dispatch, no encoder round-trip). */
case class HilbertExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert16 requires integral inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert16"

  override protected def nullSafeEval(x: Any, y: Any): Any =
    Hilbert.d16(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Hilbert.d16($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertExpr =
    copy(left = newLeft, right = newRight)
}
