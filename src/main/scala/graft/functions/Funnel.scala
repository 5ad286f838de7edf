package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Ordered-funnel analytics in ONE shuffle.
  *
  * The naive funnel (q97's oracle twin) scans the event table once per
  * step and chains keyed joins — N passes over the biggest table in the
  * warehouse. This operator instead hash-partitions events by user and
  * sorts within partitions by (user, ts); one streaming sweep then
  * advances an O(steps) state machine per user run, so a 100 TB event
  * table is read once, shuffled once, and never buffered per user
  * (graft.functions.Batching's discipline).
  *
  * Step semantics match the join form exactly: a user reaches step i at
  * the EARLIEST event of type steps(i) with ts strictly greater than the
  * ts at which step i-1 was reached. Strictness makes tie order
  * irrelevant: an event can only qualify if its ts is strictly past the
  * previous step's, hence strictly later in the (user, ts) sort however
  * equal-ts rows interleave.
  *
  * Emission is two-level aggregation: each task emits one partial count
  * vector (steps longs), and a final tiny aggregate sums them — the
  * shuffle after the sweep moves `partitions × steps` longs, nothing
  * proportional to users or events.
  */
object Funnel {

  /** (step BIGINT, n_users BIGINT) for 1-based step prefixes of `steps`,
    * ordered by step. `tsCol` must be an integral event-time column
    * (epoch micros by house convention). */
  def funnelCounts(events: DataFrame, userCol: String, typeCol: String,
                   tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      s"steps must be non-empty and distinct: $steps")
    val spark = events.sparkSession
    import spark.implicits._
    val k = steps.length
    val stepIdx = steps.zipWithIndex.toMap
    val parted: Dataset[(Long, String, Long)] = events
      .select(col(userCol).cast("long"), col(typeCol).cast("string"),
        col(tsCol).cast("long"))
      .repartition(col(userCol))
      .sortWithinPartitions(col(userCol), col(tsCol))
      .as[(Long, String, Long)]
    val partials = parted.mapPartitions { it =>
      val counts = new Array[Long](k)
      val reached = new Array[Long](k)
      java.util.Arrays.fill(reached, -1L)
      var curUser = 0L
      var haveUser = false
      def flush(): Unit = if (haveUser) {
        var i = 0
        while (i < k && reached(i) >= 0) { counts(i) += 1; i += 1 }
        java.util.Arrays.fill(reached, -1L)
      }
      it.foreach { case (u, et, ts) =>
        if (!haveUser || u != curUser) { flush(); curUser = u; haveUser = true }
        stepIdx.get(et) match {
          case Some(i) if reached(i) < 0 &&
            (i == 0 || (reached(i - 1) >= 0 && ts > reached(i - 1))) =>
            reached(i) = ts
          case _ => ()
        }
      }
      flush()
      Iterator.single(counts.toSeq)
    }
    partials.select(posexplode(col("value")).as(Seq("pos", "c")))
      .groupBy(col("pos"))
      .agg(sum(col("c")).as("n_users"))
      .select((col("pos") + 1).cast("long").as("step"), col("n_users"))
      .orderBy(col("step"))
  }
}
