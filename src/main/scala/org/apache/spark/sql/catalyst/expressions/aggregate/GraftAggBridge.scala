package org.apache.spark.sql.catalyst.expressions.aggregate

import org.apache.spark.sql.catalyst.expressions.Expression

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
