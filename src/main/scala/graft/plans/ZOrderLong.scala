package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleave, shared by the interpreted and
  * codegen'd paths of [[ZOrderLong]]. The spread uses the standard
  * binary-magic-numbers doubling scheme (Warren, "Hacker's Delight"
  * §7-2 / the public Stanford Bit Twiddling Hacks page): four
  * shift-or-mask steps instead of a 16-iteration bit loop.
  */
object ZOrder {

  /** Spread the low 16 bits of `v` to the even bit positions of a
    * 32-bit result: bit i of (v & 0xFFFF) moves to bit 2i. */
  def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** 32-bit Morton code of two 16-bit coordinates: x's bits land on
    * even positions, y's on odd. Inputs are masked to 16 bits. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)
}

/** `zorder_long(x BIGINT, y BIGINT): BIGINT` — the 32-bit Morton code
  * of the two low-16-bit coordinates (bit i of x at position 2i, bit i
  * of y at 2i+1; higher input bits are masked off). Sorting or
  * range-partitioning on the code places rows close in BOTH dimensions
  * into the same file/row group, so min/max footer pruning can skip
  * files for predicates on EITHER column — the multi-dimensional
  * data-skipping layout (see operators/Layout.zorderedWrite).
  *
  * A native expression (not a UDF) so the interleave stays inside
  * whole-stage codegen; the bit math is a static call into [[ZOrder]],
  * shared verbatim with the interpreted path. The DuckDB oracle
  * replays the same code as a 32-term shift-and-mask arithmetic sum
  * (see RelationalQueries.zorderSql).
  */
case class ZOrderLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"zorder_long needs (BIGINT, BIGINT) inputs, got ($l, $r)")
    }

  override def nullSafeEval(x: Any, y: Any): Any =
    ZOrder.interleave16(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      s"${ev.value} = graft.plans.ZOrder.interleave16($x, $y);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
