package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType}

/** Native codegen'd Hilbert-curve index of a 2-d point — the custom-
  * Expression tier of the layout surface ([[graft.analytics.Layout]]): the
  * column-arithmetic form needs 9 named intermediate columns per bit level
  * to keep the Catalyst tree linear, where this expression is ONE plan
  * node whose generated code is the plain xy2d quadrant-rotation loop —
  * smaller plans, and the loop JITs exactly like hand-written Java.
  * `bits` is a compile-time constant (it sizes the loop), so it is a
  * constructor parameter extracted from a foldable literal at build time.
  *
  * Registered as SQL `hilbert_index(a, b, bits)` by [[GraftExtensions]];
  * result is identical to `Layout.withHilbert` (spec-asserted
  * exhaustively).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hilbert_index expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType

  override def nullSafeEval(av: Any, bv: Any): Any = {
    var x = av.asInstanceOf[Long]
    var y = bv.asInstanceOf[Long]
    var d = 0L
    var i = bits - 1
    while (i >= 0) {
      val s = 1L << i
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = s - 1L - x; y = s - 1L - y }
        val t = x; x = y; y = t
      }
      i -= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a; long $y = $b; long $d = 0L;
         |for (int $i = $bits - 1; $i >= 0; $i--) {
         |  long $s = 1L << $i;
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = $s - 1L - $x; $y = $s - 1L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex {

  /** Column API: `hilbertIndex($"a", $"b", 16)`. */
  def hilbertIndex(a: Column, b: Column, bits: Int): Column =
    ColumnShim.column(build(Seq(
      ColumnShim.expression(a), ColumnShim.expression(b),
      Literal(bits))))

  /** Builder (SQL registration path): third argument must be a foldable
    * integer literal — it sizes the generated loop.
    */
  def build(exprs: Seq[Expression]): HilbertIndex = {
    require(exprs.length == 3,
      s"hilbert_index takes exactly 3 arguments, got ${exprs.length}")
    val bits = exprs(2) match {
      case Literal(v: Int, _) => v
      case Literal(v: Long, _) => v.toInt
      case other => throw new IllegalArgumentException(
        s"hilbert_index bits must be an integer literal, got $other")
    }
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    HilbertIndex(Cast(exprs(0), LongType), Cast(exprs(1), LongType), bits)
  }
}
