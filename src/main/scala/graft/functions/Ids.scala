package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dense 0-based global row ids in total key order — the distributed
  * replacement for `row_number() OVER (ORDER BY key)`, whose plan is a
  * single-partition WindowExec: every row of a 100 TB table funnels
  * through ONE task (Spark itself warns "No Partition Defined ...
  * serious performance degradation"). Beam has no primitive for this
  * either; RDD users reach for `zipWithIndex`, which also runs an
  * extra sequential pass and leaves the DataFrame world.
  *
  * Shape here (the same two-job driver-artifact pattern as q75's
  * histogram boundaries and q69's bloom filter):
  *
  *  1. one aggregation computes `buckets-1` approximate percentile
  *     cuts of the key — a driver artifact of O(buckets) doubles;
  *  2. each row gets its bucket by counting cuts ≤ key (an O(buckets)
  *     loop over a literal array — no shuffle, stays in codegen);
  *  3. one count per bucket (≤ `buckets` rows to the driver) turns
  *     into cumulative offsets, injected back as a literal map;
  *  4. rid = row_number within bucket + bucket offset: the window
  *     partitions on bucket, so the sort parallelizes across buckets
  *     and no task ever sees more than one bucket's rows.
  *
  * The cuts only balance load — ids depend solely on the total key
  * order, so approximate (or even adversarially bad) cuts can never
  * change the output, only skew bucket sizes. The key must be
  * duplicate-free: rows tying ON a cut value all land in one bucket,
  * but ties within a bucket would make row_number arbitrary — same
  * contract as any total order.
  *
  * Cost at scale: three passes over the key column (cuts, counts,
  * assignment). A persist() of the keyed projection would trade
  * memory for the re-scans; left to the caller, since at corpus scale
  * the projection is usually a narrow two-column slice and the scans
  * are cheaper than caching 100 TB.
  */
object Ids {

  /** Append `idCol` (0-based dense BIGINT ids in ascending `key`
    * order) to `df`. `key` values must be unique. */
  def denseIds(df: DataFrame, key: Column, idCol: String, buckets: Int = 32): DataFrame = {
    require(buckets > 0, "denseIds: buckets must be positive")
    val pcts = (1 until buckets).map(_.toDouble / buckets).toArray
    // driver artifact 1: bucket cuts (null row on empty input)
    val cutRow = df.agg(
      approx_percentile(key.cast("double"), lit(pcts), lit(10000)).as("cuts"))
      .collect()(0)
    val cuts: Seq[Double] =
      if (cutRow.isNullAt(0)) Seq.empty else cutRow.getSeq[Double](0)
    val bucket =
      if (cuts.isEmpty) lit(0)
      else size(filter(lit(cuts.toArray), c => c <= key.cast("double")))
    val bucketed = df.withColumn("__bucket", bucket)
    // driver artifact 2: per-bucket counts -> cumulative offsets
    val counts = bucketed.groupBy(col("__bucket")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets: Map[Int, Long] =
      counts.map { case (b, c) => val o = acc; acc += c; b -> o }.toMap
    val offExpr =
      if (offsets.isEmpty) lit(0L)
      else element_at(
        map(offsets.toSeq.sortBy(_._1).flatMap {
          case (b, o) => Seq(lit(b), lit(o))
        }: _*), col("__bucket"))
    val w = Window.partitionBy(col("__bucket")).orderBy(key)
    bucketed
      .withColumn(idCol, row_number().over(w).cast("long") - 1L + offExpr)
      .drop("__bucket")
  }
}
