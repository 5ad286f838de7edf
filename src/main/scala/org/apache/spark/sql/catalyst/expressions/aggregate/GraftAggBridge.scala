package org.apache.spark.sql.catalyst.expressions.aggregate

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.DataType

/** Access bridge for Spark's `private` bounded-heap top-k collector.
  *
  * [[CollectTopK]] is the engine's own partial-merging top-k aggregate
  * (a size-k heap per group on both the map and reduce side — the
  * algebraic form of ORDER BY + LIMIT k per group). It is not exposed
  * in the public function surface, so graft forwards its constructor
  * from inside the package, exactly like [[org.apache.spark.sql.GraftSqlBridge]]
  * forwards `Dataset.ofRows`. Everything downstream of this call is
  * public aggregate machinery.
  */
object GraftAggBridge {
  /** k extreme values of `child` per group. `reverse = false` keeps the
    * k LARGEST (result sorted descending); `reverse = true` keeps the k
    * SMALLEST (result sorted ascending) — pinned by ExpressionSpec. */
  def collectTopK(child: Expression, k: Int, reverse: Boolean): CollectTopK =
    CollectTopK(child, k, reverse)
}

/** [[CollectTopK]] over DISTINCT values: a size-k ordered SET per group
  * instead of a size-k heap — `collect_topk_distinct(x, k, rev)` ≡
  * `collect_topk(DISTINCT x, k, rev)`.
  *
  * Why it exists (the 100 TB reason): every NN-descent round scores an
  * n·R² candidate fanout in which the same (src, nb) pair arrives from
  * several directions, and the pairs must be DEDUPED before the top-k
  * cut or duplicates occupy heap slots. Expressing that as
  * `.distinct()` + `collect_topk` costs TWO full exchanges of the
  * fanout — the dedup shuffle, then the groupBy shuffle — and at sf100
  * (2 M vectors, und-cap 30) the ~1.8 G-row triple fanout made each
  * exchange a ~40 GB spill, which is what actually killed the first
  * sf100 probe on this box (ENOSPC). Folding the dedup INTO the
  * bounded buffer restores the aggregate's partial-merge shape: each
  * map partition emits at most k distinct rows per group, the fanout
  * is never exchanged at all, and the only shuffle is the partial
  * aggregates themselves.
  *
  * The buffer is a [[mutable.TreeSet]] capped at `num`: a tree insert
  * is the dedup check, the cap eviction, and the order maintenance in
  * one O(log k); `eval` reads the set off in its maintained order,
  * which matches [[CollectTopK]]'s output order for the same
  * `reverse` (pinned equal on duplicate-free input, and equal to
  * distinct-then-collect_topk on duplicated input, by ExpressionSpec).
  */
case class CollectTopKDistinct(
    child: Expression, num: Int, reverse: Boolean = false,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends Collect[mutable.TreeSet[Any]] with UnaryLike[Expression] {
  assert(num > 0)

  override protected lazy val bufferElementType: DataType = child.dataType

  // keep-priority order: the buffer's first `num` elements are the kept
  // set AND the output order — reverse=true keeps the k smallest
  // (ascending), reverse=false the k largest (descending)
  private lazy val keepOrd: Ordering[Any] = {
    val ord = TypeUtils.getInterpretedOrdering(child.dataType)
    if (reverse) ord else ord.reverse
  }

  override def createAggregationBuffer(): mutable.TreeSet[Any] =
    mutable.TreeSet.empty[Any](keepOrd)

  override protected def convertToBufferElement(value: Any): Any =
    InternalRow.copyValue(value)

  override def update(buffer: mutable.TreeSet[Any],
                      input: InternalRow): mutable.TreeSet[Any] = {
    val value = child.eval(input)
    if (value != null) {
      buffer += convertToBufferElement(value)
      if (buffer.size > num) buffer -= buffer.last
    }
    buffer
  }

  override def merge(buffer: mutable.TreeSet[Any],
                     other: mutable.TreeSet[Any]): mutable.TreeSet[Any] = {
    buffer ++= other
    while (buffer.size > num) buffer -= buffer.last
    buffer
  }

  override def eval(buffer: mutable.TreeSet[Any]): Any =
    new GenericArrayData(buffer.toArray)

  override def prettyName: String = "collect_topk_distinct"

  override protected def withNewChildInternal(newChild: Expression): CollectTopKDistinct =
    copy(child = newChild)
  override def withNewMutableAggBufferOffset(newOffset: Int): CollectTopKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectTopKDistinct =
    copy(inputAggBufferOffset = newOffset)
}
