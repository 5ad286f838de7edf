package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Input row for greedy packing (top-level: Catalyst encoders cannot
  * reach nested/private case classes). */
final case class PackIn(source: String, doc_id: Long, n_tokens: Long)

/** A packed document: `bin_id` is 0-based within its source. */
final case class PackOut(source: String, bin_id: Long, doc_id: Long, n_tokens: Long)

/** Greedy sequence packing — the batch-assembly step of a training
  * pipeline: concatenate documents (in a deterministic order) into
  * fixed-token-budget bins, opening a new bin when the next document
  * would overflow the budget. A document larger than the budget sits
  * alone in its own bin.
  *
  * Scale shape: one hash shuffle on the group key co-locates each
  * group, `sortWithinPartitions` gives the deterministic order WITHOUT
  * a global sort, and the scan is a streaming mapPartitions carrying
  * O(1) state (current group, running token count, bin counter) — no
  * per-group buffering, so a giant source cannot OOM a task (same
  * discipline as Batching.batchIterator). Bin numbering restarts per
  * group, so the result is independent of which partition a group
  * landed on. */
object Packing {

  /** Pack `docs(source, doc_id, n_tokens)` into bins of ≤ `budget`
    * tokens per source, docs taken in doc_id order. */
  def packBySource(docs: DataFrame, budget: Long): Dataset[PackOut] = {
    val s = docs.sparkSession
    import s.implicits._
    docs.select(col("source"), col("doc_id"), col("n_tokens"))
      .as[PackIn]
      .repartition(col("source"))
      .sortWithinPartitions(col("source"), col("doc_id"))
      .mapPartitions { it =>
        var cur: String = null
        var acc = 0L
        var bin = -1L
        it.map { r =>
          if (r.source != cur || bin < 0 || acc + r.n_tokens > budget) {
            bin = if (r.source == cur) bin + 1 else 0L
            cur = r.source
            acc = r.n_tokens
          } else acc += r.n_tokens
          PackOut(r.source, bin, r.doc_id, r.n_tokens)
        }
      }
  }
}
