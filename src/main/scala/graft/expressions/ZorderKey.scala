package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Z-order (Morton) curve key: interleaves the low 16 bits of two long
  * keys into a 32-bit curve position, the multi-dimensional clustering
  * key used for data LAYOUT at scale — write a 100 TB table sorted by
  * `zorder_key(a, b)` and range pruning works on BOTH dimensions from
  * one sort order (the same idea as Delta/Iceberg Z-ordering; see
  * Morton 1966 and the DataBricks/Iceberg public docs).
  *
  * The interleave is the classic magic-number bit spread — O(1), no
  * loop, fully inside whole-stage codegen via a static call.
  */
case class ZorderKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"zorder_key expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZorderKey.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.ZorderKey.interleave16($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZorderKey =
    copy(left = newLeft, right = newRight)
}

object ZorderKey {

  /** Spread the low 16 bits of v to even bit positions 0,2,…,30. */
  def spread16(v0: Long): Long = {
    var v = v0 & 0xFFFFL
    v = (v | (v << 8)) & 0x00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0FL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** x in even bits, y in odd bits. */
  def interleave16(x: Long, y: Long): Long =
    spread16(x) | (spread16(y) << 1)
}
