package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hot-key fanout (Beam `CombinePerKey.with_hot_key_fanout`
  * [BEAM apache_beam/transforms/core.py]): two-phase salted aggregation.
  *
  * A skewed key concentrates its whole group on one reducer; salting
  * spreads it over `fanout` partial groups first, then merges the
  * partials per key — the partial shuffle carries (key, salt) and the
  * merge shuffle carries only |keys| * fanout pre-aggregated rows.
  * Correct for any aggregate whose merge is itself expressible as an
  * aggregate over partials (sum/count/min/max here; count merges by
  * summing partial counts).
  *
  * Note Spark's hash aggregation already does map-side partials, which
  * covers most skew; explicit fanout still wins when the per-key state
  * is large (big decimal sums, sketches) or when AQE skew handling is
  * unavailable (first-stage aggregations, not joins).
  */
object Skew {

  /** One aggregate of the two-phase plan: `partial` runs per
    * (key, salt); `merge(alias)` combines the partial column per key. */
  final case class SplitAgg(alias: String, partial: Column, merge: String => Column)

  def sumOf(c: Column, alias: String): SplitAgg =
    SplitAgg(alias, sum(c), a => sum(col(a)))
  def countOf(alias: String): SplitAgg =
    SplitAgg(alias, count(lit(1)), a => sum(col(a)))
  def minOf(c: Column, alias: String): SplitAgg =
    SplitAgg(alias, min(c), a => min(col(a)))
  def maxOf(c: Column, alias: String): SplitAgg =
    SplitAgg(alias, max(c), a => max(col(a)))

  /** Two-phase aggregation of `df` by `keys` with hot keys fanned out
    * over `fanout` salts. Result schema: keys ++ agg aliases. */
  def saltedAgg(df: DataFrame, keys: Seq[String], fanout: Int,
                aggs: Seq[SplitAgg]): DataFrame = {
    require(fanout > 0 && aggs.nonEmpty)
    require(!df.columns.contains("__salt"),
      "saltedAgg reserves the __salt column name")
    require(aggs.map(_.alias).distinct.size == aggs.size &&
      aggs.map(_.alias).forall(a => !keys.contains(a)),
      "agg aliases must be distinct and disjoint from the grouping keys")
    // the salt only has to spread rows evenly; it is stripped before the
    // merge, so the result is salt-independent
    val salted = df.withColumn("__salt",
      pmod(hash(monotonically_increasing_id()), lit(fanout)))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.partial.as(aggs.head.alias),
        aggs.tail.map(a => a.partial.as(a.alias)): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head.merge(aggs.head.alias).as(aggs.head.alias),
        aggs.tail.map(a => a.merge(a.alias).as(a.alias)): _*)
  }
}
