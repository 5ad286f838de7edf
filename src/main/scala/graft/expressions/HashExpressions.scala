package graft.expressions

import java.security.MessageDigest
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5 plumbing for the portable-hash expressions.
  *
  * These are CodegenFallback by choice: the cost is the digest itself,
  * not row-loop dispatch, and a hand-written JVM loop already removes
  * the per-element Catalyst interpretation (md5 -> substring -> conv
  * -> cast tree per array element) that makes the HOF formulations the
  * benchmark hot spots. Results are bit/byte-identical to the HOF forms
  * and to DuckDB's md5 — the oracle contract.
  */
trait Md5Helper {
  // ThreadLocal, not a per-instance lazy val: a shared plan fragment can
  // be evaluated from multiple threads (e.g. driver-side constant
  // folding + executor tasks), and MessageDigest is stateful.
  @transient private lazy val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  protected def toHex(d: Array[Byte]): String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  protected def md5Raw(bytes: Array[Byte]): Array[Byte] =
    mdLocal.get().digest(bytes)

  protected def md5Hex(bytes: Array[Byte]): String =
    toHex(md5Raw(bytes))

  /** Digest of prefix ++ body without concatenating the arrays. */
  protected def md5Parts(prefix: Array[Byte], body: Array[Byte]): Array[Byte] = {
    val md = mdLocal.get()
    md.reset()
    md.update(prefix)
    md.update(body)
    md.digest()
  }

  /** Unsigned lexicographic compare — the same order as comparing the
    * hex encodings (hex is big-endian per nibble). */
  protected def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }
}

/** Word 3-gram shingles over a string array — the native form of
  * TextOps.shingles3 (same output: windows joined by single spaces,
  * empty below 3 words). One UTF8String.concatWs per window replaces an
  * interpreted transform+slice+concat_ws tree per window.
  */
case class Shingles3(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingles3 expects array<string>, got ${t.simpleString}")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 2)
    var i = 0
    while (i < n - 2) {
      out(i) = UTF8String.concatWs(space,
        arr.getUTF8String(i), arr.getUTF8String(i + 1), arr.getUTF8String(i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Shingles3 =
    copy(child = newChild)
}

/** 16-bit SimHash over a word array — the native form of
  * TextOps.simhash16 (bit b set iff the sum over words of +1/-1 by
  * md5-derived hash-bit b is positive). The per-word 16-bit hash is the
  * first two digest bytes — exactly `conv(substring(md5(w),1,4),16,10)`.
  */
case class Simhash16(child: Expression)
    extends UnaryExpression with CodegenFallback with Md5Helper {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash16 expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val bitSums = new Array[Int](16)
    var i = 0
    while (i < n) {
      // a null word contributes -1 to every bit — the HOF form's
      // when(null > 0).otherwise(-1) behavior, same as h == 0
      val h =
        if (arr.isNullAt(i)) 0
        else {
          val d = md5Raw(arr.getUTF8String(i).getBytes)
          ((d(0) & 0xff) << 8) | (d(1) & 0xff)
        }
      var b = 0
      while (b < 16) {
        if (((h >> b) & 1) == 1) bitSums(b) += 1 else bitSums(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0
    var b = 0
    while (b < 16) {
      if (bitSums(b) > 0) out |= 1 << b
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash16 =
    copy(child = newChild)
}

/** Position-weighted rolling fingerprint mod 1e9+7 over a string array —
  * the native form of TextOps.fingerprint (same fold, same constants).
  */
case class WordFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback with Md5Helper {

  private val P = 1000000007L

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_fingerprint expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      // first 7 hex chars == top 28 digest bits, read straight off the
      // bytes (no hex-string round trip): n0..n6 big-endian nibbles
      val d = md5Raw(arr.getUTF8String(i).getBytes)
      val h = (((d(0) & 0xffL) << 20) | ((d(1) & 0xff) << 12) |
        ((d(2) & 0xff) << 4) | ((d(3) & 0xff) >> 4)) % P
      acc = (acc + (i + 1) * h % P) % P
      i += 1
    }
    acc
  }

  override protected def withNewChildInternal(newChild: Expression): WordFingerprint =
    copy(child = newChild)
}

/** The 4-seed MinHash signature over a shingle array in one pass — the
  * native form of TextOps.minhash(shs, k) for k in 0..3. Element k of
  * the result equals array_min(transform(shs, sh -> md5('k|' || sh))).
  */
case class MinHashSigs(child: Expression)
    extends UnaryExpression with CodegenFallback with Md5Helper {

  val Seeds = 4

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs expects array<string>, got ${t.simpleString}")
  }

  // "0|".."3|" as bytes: the seed prefix is fed to the digest separately
  // from the shingle bytes, so the hot loop allocates no strings at all
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(Seeds)(k => s"$k|".getBytes("UTF-8"))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[Array[Byte]](Seeds)
    var i = 0
    while (i < n) {
      val shB = arr.getUTF8String(i).getBytes
      var k = 0
      while (k < Seeds) {
        val d = md5Parts(prefixes(k), shB)
        if (mins(k) == null || unsignedLess(d, mins(k))) mins(k) = d
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m =>
      if (m == null) null else UTF8String.fromString(toHex(m))))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}
