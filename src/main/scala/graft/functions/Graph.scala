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
  * Labels only decrease, so counting rows whose label changed this
  * round is an exact convergence test (changed == 0 ⇔ fixpoint) — a
  * per-row flag, immune to the 64-bit-wraparound aliasing a
  * label-SUM fixpoint test admits in principle on huge graphs. The
  * loop stops at the fixpoint (or `maxIter`). Every step is a keyed
  * join + aggregation — no driver-side graph state, only the scalar
  * convergence check leaves the cluster. Each round ends in
  * `localCheckpoint` (plan-lineage truncation): without it, round i
  * re-analyzes a plan of depth i and iteration cost grows
  * superlinearly — the standard Spark iterative-algorithm discipline.
  * Each round's blocks are dropped as soon as the next round's
  * checkpoint is materialized, so a k-round run holds at most two
  * label tables in block storage; only the FINAL label table stays
  * cached (it backs the returned DataFrame).
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
    // prevCk = the checkpointed frame backing the CURRENT labels —
    // unpersisted as soon as its successor round is materialized
    var prevCk = sym.select(col("u").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(false)
    var labels = prevCk
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      // 1. neighbor minimum per node, keep the smaller of own/neighbor
      val nbrMin = sym.join(labels, sym("v") === labels("id"))
        .groupBy(col("u").as("id2"))
        .agg(min(col("label")).as("nl"))
      val prop = labels.join(nbrMin, labels("id") === nbrMin("id2"), "left")
        .select(col("id"), col("label").as("old"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      // 2. pointer jump: follow own label to ITS label (path halving);
      // the pre-round label rides along so the convergence count below
      // is part of the same checkpointed frame
      val jumped = prop.as("x")
        .join(prop.select(col("id").as("lid"), col("label").as("ll")),
          col("x.label") === col("lid"), "left")
        .select(col("x.id").as("id"), col("x.old").as("old"),
          least(col("x.label"), coalesce(col("ll"), col("x.label"))).as("label"))
        // lazy: materialized by the convergence aggregate below, so each
        // round runs ONE job (eager would schedule a separate one)
        .localCheckpoint(false)
      // coalesce: sum() over zero rows is NULL — an empty edge set must
      // yield an empty (already-converged) result, not a null-read crash
      val changed = jumped
        .agg(coalesce(sum((col("old") =!= col("label")).cast("long")), lit(0L)))
        .head().getLong(0)
      // jumped's blocks now exist — the previous round's can go
      prevCk.unpersist()
      prevCk = jumped
      labels = jumped.select(col("id"), col("label"))
      converged = changed == 0L
      it += 1
    }
    sym.unpersist()
    labels
  }
}
