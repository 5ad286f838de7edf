package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom Aggregators — the Spark form of Beam's CombineFn lifecycle
  * (create_accumulator / add_input / merge_accumulators / extract_output
  * = zero / reduce / merge / finish). Spark runs these with map-side
  * partial aggregation automatically, i.e. Beam's combiner lifting is
  * free; the buffer types are Encoder-backed so they travel through
  * Tungsten rows, not Java serialization.
  */
object Aggs {

  /** arg-max: keeps the (value, id) pair with the largest value, ties
    * broken by larger id — a total order, so the result is deterministic
    * under any merge order. Beam equivalent: combiners.Top.Of(1). */
  class ArgMaxByValue extends Aggregator[(Double, Long), (Double, Long), Long] {
    def zero: (Double, Long) = (Double.NegativeInfinity, Long.MinValue)
    private def pick(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      if (b._1 > a._1 || (b._1 == a._1 && b._2 > a._2)) b else a
    def reduce(buf: (Double, Long), in: (Double, Long)): (Double, Long) = pick(buf, in)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) = pick(a, b)
    def finish(buf: (Double, Long)): Long = buf._2
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.product[(Double, Long)]
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  // ---- Count-Min Sketch -------------------------------------------------

  val CmsDepth = 4
  val CmsWidth = 64

  private val localMd = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))
  // natural-language token streams are Zipfian: the same words repeat, so
  // a bounded per-thread memo makes the hash cost ~once per vocab word
  private val localMemo = ThreadLocal.withInitial[java.util.HashMap[String, Array[Int]]](() =>
    new java.util.HashMap[String, Array[Int]]())

  /** Buckets of `word` across all sketch rows: row d uses 6 md5 hex
    * chars of "d#word" mod width — byte-identical to the SQL twin
    * `CAST(('0x' || substr(md5(d || '#' || w), 1, 6)) AS BIGINT) % 64`. */
  def cmsBuckets(word: String): Array[Int] = {
    val memo = localMemo.get()
    val hit = memo.get(word)
    if (hit != null) return hit
    val md = localMd.get()
    val out = new Array[Int](CmsDepth)
    var d = 0
    while (d < CmsDepth) {
      md.reset()
      val hex = md.digest(s"$d#$word".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 6)
      out(d) = (java.lang.Long.parseLong(hex, 16) % CmsWidth).toInt
      d += 1
    }
    if (memo.size() > 65536) memo.clear()
    memo.put(word, out)
    out
  }

  /** Single-row form of [[cmsBuckets]]. */
  def cmsBucket(d: Int, word: String): Int = cmsBuckets(word)(d)

  /** Count-Min Sketch as a mergeable CombineFn: one pass over the
    * tokens, a flat depth x width counter buffer, elementwise-add merge
    * — the sketch shape that aggregates 100 TB in a single shuffle of
    * 2 KiB buffers. Estimates (min over rows at the word's buckets) are
    * deterministic given the md5 bucketing, so unlike most sketches this
    * one is oracle-checkable exactly. */
  class CountMinAgg extends Aggregator[String, Array[Long], Seq[Long]] {
    def zero: Array[Long] = new Array[Long](CmsDepth * CmsWidth)
    def reduce(buf: Array[Long], word: String): Array[Long] = {
      val bs = cmsBuckets(word)
      var d = 0
      while (d < CmsDepth) {
        buf(d * CmsWidth + bs(d)) += 1
        d += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  case class Moments(n: Long, mean: Double, variance: Double)

  /** (count, sum, sum-of-squares) moments with exact decimal accumulation:
    * inputs carry exactly 2 decimals, so scale-2/scale-4 BigDecimal sums
    * are exact and merge-order-independent; only the final mean/variance
    * divide in double (emitted raw — same formula, same order, bit-equal
    * in the oracle). Beam equivalent: a CombineFn with a (sum, count)
    * accumulator. */
  class MomentsAgg extends Aggregator[Double, (Long, BigDecimal, BigDecimal), Moments] {
    private def d2(x: Double): BigDecimal =
      BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    def zero: (Long, BigDecimal, BigDecimal) = (0L, BigDecimal(0), BigDecimal(0))
    def reduce(b: (Long, BigDecimal, BigDecimal), x: Double): (Long, BigDecimal, BigDecimal) = {
      val v = d2(x); (b._1 + 1, b._2 + v, b._3 + v * v)
    }
    def merge(a: (Long, BigDecimal, BigDecimal), b: (Long, BigDecimal, BigDecimal)): (Long, BigDecimal, BigDecimal) =
      (a._1 + b._1, a._2 + b._2, a._3 + b._3)
    def finish(b: (Long, BigDecimal, BigDecimal)): Moments = {
      val n = b._1
      if (n == 0) Moments(0, 0.0, 0.0)
      else {
        // emit RAW doubles: the inputs are exact decimals, so the same
        // formula evaluated in the same order is bit-identical in DuckDB;
        // rounding would reintroduce cross-engine round-half divergence
        val sum = b._2.toDouble; val sumsq = b._3.toDouble
        Moments(n, sum / n, (sumsq - sum * sum / n) / n)
      }
    }
    def bufferEncoder: Encoder[(Long, BigDecimal, BigDecimal)] =
      Encoders.product[(Long, BigDecimal, BigDecimal)]
    def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }
}
