package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation with
  * pointer jumping — the clustering step that turns near-dup PAIRS into
  * dedup GROUPS (pick one representative per component, drop the rest).
  *
  * Each round does two things:
  *  1. propagation: every node adopts the minimum label among itself
  *     and its neighbors (keyed join + aggregation);
  *  2. pointer jumping / path compression: every node then adopts its
  *     LABEL's label (self-join of the label table), halving the
  *     distance to the component minimum.
  * Plain propagation moves the minimum one hop per round — O(diameter)
  * rounds, hopeless for a 100 TB graph with long chains; the jump step
  * makes it O(log n) (the same doubling idea as Kiveris et al.'s
  * large-star/small-star, "Connected Components in MapReduce and
  * Beyond", but expressed as two keyed joins Catalyst plans natively).
  *
  * Labels only decrease, so the total-label sum is a monotone
  * convergence measure; the loop stops at a fixpoint (or `maxIter`).
  * Every step is a keyed join + aggregation — no driver-side graph
  * state, only the scalar convergence check leaves the cluster. Each
  * round ends in `localCheckpoint` (plan-lineage truncation): without
  * it, round i re-analyzes a plan of depth i and iteration cost grows
  * superlinearly — the standard Spark iterative-algorithm discipline.
  */
object Graph {

  /** Components of the undirected graph given by `edges` (two numeric
    * columns: src, dst). Returns (id, label) with label = min node id
    * reachable; only nodes appearing in an edge are returned. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val src = edges.columns(0)
    val dst = edges.columns(1)
    val sym = edges.select(col(src).as("u"), col(dst).as("v"))
      .union(edges.select(col(dst).as("u"), col(src).as("v")))
      .localCheckpoint(false)
    var labels = sym.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
    // sum() over zero rows is NULL — an empty edge set must yield an
    // empty (already-converged) result, not a null-read crash
    var lastSum = labels.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // 1. neighbor minimum per node, keep the smaller of own/neighbor
      val nbrMin = sym.join(labels, sym("v") === labels("id"))
        .groupBy(col("u").as("id2"))
        .agg(min(col("label")).as("nl"))
      val prop = labels.join(nbrMin, labels("id") === nbrMin("id2"), "left")
        .select(col("id"), least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      // 2. pointer jump: follow own label to ITS label (path halving)
      val jumped = prop.as("x")
        .join(prop.select(col("id").as("lid"), col("label").as("ll")),
          col("x.label") === col("lid"), "left")
        .select(col("x.id").as("id"),
          least(col("x.label"), coalesce(col("ll"), col("x.label"))).as("label"))
        // lazy: materialized by the convergence aggregate below, so each
        // round runs ONE job (eager would schedule a separate one)
        .localCheckpoint(false)
      val s = jumped.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
      labels = jumped
      converged = s == lastSum
      lastSum = s
      it += 1
    }
    labels
  }
}
