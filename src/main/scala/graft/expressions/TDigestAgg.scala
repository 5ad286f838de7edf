package graft.expressions

import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Mergeable t-digest buffer (Dunning's merging variant with the k0
  * scale function: uniform per-centroid weight cap ⌈W/δ⌉, hence a
  * worst-case rank error of one centroid ≈ 1/δ of the mass — δ = 400
  * gives ≤ 0.25 % + interpolation slack; SketchSpec pins ≤ 1 % on real
  * data). Points stage in a flat buffer and fold into centroids in
  * sorted batches, so update cost is O(log staging) amortized and the
  * buffer never exceeds δ + staging entries — the whole sketch is a
  * few KB at any input size, the property that makes it a shuffle-safe
  * partial aggregate at 100 TB where exact percentile needs a global
  * sort.
  */
final class TDigestBuf(val delta: Int) {
  var means: Array[Double] = Array.emptyDoubleArray
  var weights: Array[Long] = Array.emptyLongArray
  var total: Long = 0L
  val staging = new ArrayBuffer[Double](256)

  def add(x: Double): Unit = {
    staging += x
    if (staging.length >= 4096) flush()
  }

  /** Fold staged raw points into the centroid list. */
  def flush(): Unit = {
    if (staging.isEmpty) return
    val pts = staging.toArray
    java.util.Arrays.sort(pts)
    staging.clear()
    mergeSorted(pts, Array.fill(pts.length)(1L))
  }

  /** Merge a sorted (means, weights) run with the existing centroids,
    * then compress to the weight cap in one pass. */
  private def mergeSorted(ms: Array[Double], ws: Array[Long]): Unit = {
    val n = means.length + ms.length
    val am = new Array[Double](n)
    val aw = new Array[Long](n)
    var i = 0; var j = 0; var k = 0
    while (i < means.length || j < ms.length) {
      val takeOld = j >= ms.length || (i < means.length && means(i) <= ms(j))
      if (takeOld) { am(k) = means(i); aw(k) = weights(i); i += 1 }
      else { am(k) = ms(j); aw(k) = ws(j); j += 1 }
      k += 1
    }
    var newTotal = total
    var t = 0
    while (t < ms.length) { newTotal += ws(t); t += 1 }
    total = newTotal
    val cap = math.max(1L, (total + delta - 1) / delta)
    val om = new ArrayBuffer[Double](delta + 8)
    val ow = new ArrayBuffer[Long](delta + 8)
    var curSum = 0.0; var curW = 0L
    var p = 0
    while (p < n) {
      if (curW > 0 && curW + aw(p) > cap) {
        om += curSum / curW; ow += curW; curSum = 0.0; curW = 0L
      }
      curSum += am(p) * aw(p); curW += aw(p); p += 1
    }
    if (curW > 0) { om += curSum / curW; ow += curW }
    means = om.toArray; weights = ow.toArray
  }

  def mergeWith(o: TDigestBuf): Unit = {
    o.flush(); flush()
    if (o.means.nonEmpty) mergeSorted(o.means, o.weights)
  }

  /** Interpolated quantile: centroid i's center sits at rank
    * cum(i−1) + w(i)/2; clamp outside the first/last centers. */
  def quantile(p: Double): Double = {
    flush()
    if (total == 0L) return Double.NaN
    if (means.length == 1) return means(0)
    val target = p * total
    var cum = 0.0
    var i = 0
    var prevCenter = 0.0
    var prevMean = means(0)
    while (i < means.length) {
      val center = cum + weights(i) / 2.0
      if (target < center || i == means.length - 1) {
        if (i == 0 || target >= center) return means(i)
        val f = (target - prevCenter) / (center - prevCenter)
        return prevMean + f * (means(i) - prevMean)
      }
      prevCenter = center; prevMean = means(i)
      cum += weights(i); i += 1
    }
    means(means.length - 1)
  }

  def serialized: Array[Byte] = {
    flush()
    val bb = ByteBuffer.allocate(12 + means.length * 16)
    bb.putLong(total)
    bb.putInt(means.length)
    var i = 0
    while (i < means.length) { bb.putDouble(means(i)); bb.putLong(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigestBuf {
  def deserialize(bytes: Array[Byte], delta: Int): TDigestBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val d = new TDigestBuf(delta)
    d.total = bb.getLong
    val n = bb.getInt
    d.means = new Array[Double](n)
    d.weights = new Array[Long](n)
    var i = 0
    while (i < n) { d.means(i) = bb.getDouble; d.weights(i) = bb.getLong; i += 1 }
    d
  }
}

/** `tdigest_quantiles(x, array(p1, p2, …))` — approximate quantiles of
  * a numeric column from one mergeable pass. The sketch family member
  * the suite lacked next to CMS/Bloom/HLL: rank-space compression with
  * bounded memory and lossless-enough merges (SketchSpec pins ≤ 1 %
  * rank error against exact `percentile` on fixture data, and
  * merge-order invariance within the same bound). Estimates are
  * order-sensitive at the last decimal — declared rows-only for the
  * oracle, exactly the q47/q48 contract.
  */
case class TDigestAgg(
    child: Expression,
    probabilities: Seq[Double],
    compression: Int = 400,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestBuf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"tdigest_quantiles expects a numeric column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): TDigestBuf = new TDigestBuf(compression)

  override def update(buf: TDigestBuf, input: InternalRow): TDigestBuf = {
    child.eval(input) match {
      case null =>
      // Decimal is NOT a java.lang.Number — without this arm a DECIMAL
      // column type-checks (NumericType) then CCEs at runtime.
      case d: org.apache.spark.sql.types.Decimal => buf.add(d.toDouble)
      case n: Number => buf.add(n.doubleValue())
      case other => throw new IllegalStateException(
        s"tdigest_quantiles: unsupported runtime value ${other.getClass}")
    }
    buf
  }

  override def merge(a: TDigestBuf, b: TDigestBuf): TDigestBuf = {
    a.mergeWith(b); a
  }

  override def eval(buf: TDigestBuf): Any =
    new GenericArrayData(probabilities.map(buf.quantile).toArray)

  override def serialize(buf: TDigestBuf): Array[Byte] = buf.serialized

  override def deserialize(bytes: Array[Byte]): TDigestBuf =
    TDigestBuf.deserialize(bytes, compression)

  override def withNewMutableAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TDigestAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TDigestAgg =
    copy(child = newChildren.head)
}
