package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Z-order (Morton) interleave: `graft_zvalue(x, y)` packs the
  * low 16 bits of each key into a 32-bit curve position — x on the even
  * bits, y on the odd bits. Sorting or range-partitioning a table by
  * this value clusters BOTH dimensions at once, so parquet row-group
  * min/max statistics prune 2-D range predicates — the data-skipping
  * layout a 100 TB store wants when queries filter on two independent
  * keys and a single-column sort order can only serve one of them.
  *
  * The kernel spreads each 16-bit key with the classic shift-or-mask
  * sequence (4 steps, branch-free) instead of a 16-iteration bit loop;
  * shared by eval and codegen. Inputs are masked to 16 bits, so any
  * key space up to 65536 per dimension maps losslessly; wider keys
  * alias (callers bucket first — see ZOrderOps).
  */
final case class ZValue(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zvalue expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zvalue"

  override def nullSafeEval(x: Any, y: Any): Any =
    ZValue.compute(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.ZValue.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

object ZValue {
  /** Spread the low 16 bits of v to the even bit positions of a 32-bit
    * lane: ...abcd -> ...0a0b0c0d. */
  private def spread16(v: Long): Long = {
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  /** Shared kernel for eval and codegen. */
  def compute(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)
}
