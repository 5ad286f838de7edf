package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Bloom-filter runtime join prefilter — the pattern behind every
  * large-scale semi join: aggregate the SMALL side's keys into a few-KiB
  * bit set, broadcast it, and drop non-matching fact rows BEFORE they
  * reach the join shuffle. False positives only cost a row surviving to
  * the exact join that then discards it, so composing
  * `bloom_might_contain` with the real join is exact — the filter buys
  * shuffle reduction, never correctness risk.
  *
  * Layout: `NumBits`-bit array (byte-packed), `NumHashes` probes by
  * double hashing h_i = h1 + i·h2 with two splitmix64-style finalizers.
  * The aggregate buffer is the byte array itself — `update` flips bits
  * in place, `merge` ORs byte-wise, and serialization is the identity,
  * so shuffle boundaries move exactly `NumBits / 8` bytes per partial.
  */
object BloomOps {
  /** 32 KiBit = 4 KiB: keeps the broadcast trivial while holding the
    * false-positive rate under ~1% for ~3k build keys (k=6). */
  val NumBits = 1 << 15
  val NumHashes = 6

  // splitmix64 finalizer and a variant; constants mirrored in the
  // generated Java of BloomMightContain.doGenCode — keep in sync
  // (ExpressionSpec asserts eval == codegen paths agree).
  def mix1(v0: Long): Long = {
    var v = v0 + 0x9e3779b97f4a7c15L
    v = (v ^ (v >>> 30)) * 0xbf58476d1ce4e5b9L
    v = (v ^ (v >>> 27)) * 0x94d049bb133111ebL
    v ^ (v >>> 31)
  }
  def mix2(v0: Long): Long = {
    var v = v0 ^ 0xff51afd7ed558ccdL
    v = (v ^ (v >>> 33)) * 0xc4ceb9fe1a85ec53L
    v ^ (v >>> 33)
  }

  def bitOf(h1: Long, h2: Long, i: Int): Int =
    (((h1 + i * h2) & Long.MaxValue) % NumBits).toInt

  def add(buf: Array[Byte], v: Long): Unit = {
    val h1 = mix1(v); val h2 = mix2(v)
    var i = 0
    while (i < NumHashes) {
      val b = bitOf(h1, h2, i)
      buf(b >>> 3) = (buf(b >>> 3) | (1 << (b & 7))).toByte
      i += 1
    }
  }

  def mightContain(buf: Array[Byte], v: Long): Boolean = {
    val h1 = mix1(v); val h2 = mix2(v)
    var i = 0
    while (i < NumHashes) {
      val b = bitOf(h1, h2, i)
      if ((buf(b >>> 3) & (1 << (b & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** `bloom_agg(keyCol)` → BINARY: the small side's key set as a bloom
  * bit array (see [[BloomOps]]). */
case class BloomFilterAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def prettyName: String = "bloom_agg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects an integral key column, got ${t.simpleString}")
  }

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](BloomOps.NumBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomOps.add(buf, v match {
      case l: Long => l
      case i: Int  => i.toLong
      case other   => other.asInstanceOf[Number].longValue()
    })
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BloomFilterAgg =
    copy(child = newChildren.head)
}

/** `bloom_might_contain(bloomBinary, keyCol)` → BOOLEAN, codegen'd so
  * the prefilter stays inside the fact scan's whole-stage pipeline. */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "bloom_might_contain"
  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType | IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects (binary, integral), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(bloom: Any, key: Any): Any = {
    val k = key match { case l: Long => l; case i: Int => i.toLong }
    BloomOps.mightContain(bloom.asInstanceOf[Array[Byte]], k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, key) => {
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val v = ctx.freshName("v")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val ok = ctx.freshName("ok")
      val nBits = BloomOps.NumBits
      val nHashes = BloomOps.NumHashes
      // same splitmix64 finalizers as BloomOps.mix1/mix2
      s"""
        long $v = (long) $key;
        long $h1 = $v + 0x9e3779b97f4a7c15L;
        $h1 = ($h1 ^ ($h1 >>> 30)) * 0xbf58476d1ce4e5b9L;
        $h1 = ($h1 ^ ($h1 >>> 27)) * 0x94d049bb133111ebL;
        $h1 = $h1 ^ ($h1 >>> 31);
        long $h2 = $v ^ 0xff51afd7ed558ccdL;
        $h2 = ($h2 ^ ($h2 >>> 33)) * 0xc4ceb9fe1a85ec53L;
        $h2 = $h2 ^ ($h2 >>> 33);
        boolean $ok = true;
        for (int $i = 0; $i < $nHashes && $ok; $i++) {
          int $b = (int) ((($h1 + $i * $h2) & Long.MAX_VALUE) % $nBits);
          $ok = ($bloom[$b >>> 3] & (1 << ($b & 7))) != 0;
        }
        ${ev.value} = $ok;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
