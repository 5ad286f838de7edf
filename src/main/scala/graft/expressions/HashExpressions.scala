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

  protected def md5Hex(bytes: Array[Byte]): String = {
    val d = mdLocal.get().digest(bytes)
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
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
      val w = arr.getUTF8String(i)
      val h = java.lang.Long.parseLong(md5Hex(w.getBytes).substring(0, 7), 16) % P
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

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = new Array[String](Seeds)
    var i = 0
    while (i < n) {
      val sh = arr.getUTF8String(i).toString
      var k = 0
      while (k < Seeds) {
        val h = md5Hex((k.toString + "|" + sh).getBytes("UTF-8"))
        if (mins(k) == null || h.compareTo(mins(k)) < 0) mins(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(m => if (m == null) null else UTF8String.fromString(m)))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}
