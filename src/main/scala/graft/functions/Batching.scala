package graft.functions

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col

/** Beam GroupIntoBatches, the scale-safe way.
  *
  * The obvious `groupByKey.flatMapGroups { it.toSeq.sorted.grouped(b) }`
  * materializes one key's ENTIRE event list in task memory — a single
  * hot key (a bot user with 10^8 events) OOMs the executor. Instead:
  * shuffle once on the key, sort within partitions by (key, order), and
  * emit batch sizes from a streaming iterator whose state is three
  * longs — memory is O(1) per task regardless of key skew.
  */
object Batching {

  /** Per-key batch sizes over (key, order) pairs: emits one row
    * (key, batch_idx, n) per filled-or-final batch of `batchSize`,
    * batches ordered by `order` within each key. */
  def groupIntoBatchSizes(kv: Dataset[(Long, Long)], batchSize: Int): Dataset[(Long, Long, Long)] = {
    import kv.sparkSession.implicits._
    // toDF fixes the column names: a Dataset[(Long, Long)] built via
    // select(...).as[...] keeps its ORIGINAL column names, so col("_1")
    // would not resolve on it
    kv.toDF("k", "o").as[(Long, Long)]
      .repartition(col("k"))
      .sortWithinPartitions(col("k"), col("o"))
      .mapPartitions(rows => batchIterator(rows.map(_._1), batchSize))
  }

  /** The pure kernel: stream (key, batch_idx, size) triples over a
    * key-sorted key iterator with three longs of state. Law-tested in
    * LawsProps against the materializing reference. */
  def batchIterator(keys: Iterator[Long], batchSize: Int): Iterator[(Long, Long, Long)] =
    new Iterator[(Long, Long, Long)] {
      private var out: Option[(Long, Long, Long)] = None
      private var open = false            // a batch is accumulating
      private var key = 0L
      private var idx = 0L
      private var cnt = 0L

      private def advance(): Unit = {
        while (out.isEmpty && keys.hasNext) {
          val k = keys.next()
          if (!open) { open = true; key = k; idx = 0L; cnt = 1L }
          else if (k == key && cnt < batchSize) cnt += 1
          else {
            out = Some((key, idx, cnt))   // close the filled/ended batch
            if (k == key) idx += 1 else { key = k; idx = 0L }
            cnt = 1L
          }
        }
        if (out.isEmpty && open) { out = Some((key, idx, cnt)); open = false }
      }

      def hasNext: Boolean = { if (out.isEmpty) advance(); out.isDefined }
      def next(): (Long, Long, Long) = {
        if (!hasNext) Iterator.empty.next()
        val r = out.get; out = None; r
      }
    }
}
