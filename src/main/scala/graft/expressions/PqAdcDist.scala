package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** PQ asymmetric-distance computation fused into one JVM loop —
  * the native form of q119/q124's per-subspace column tree
  * `Σ_j l2sq(slice(qv, j·ds+1, ds), cents_j[codes[j]])`, which
  * evaluates an interpreted zip_with+aggregate lambda pair per dot
  * product: 3 dots × m subspaces per CANDIDATE ROW of the query×corpus
  * fanout (~24M interpreted lambda evals per sf0.1 ADC pass — the q133
  * lesson applied to the ANN scan path).
  *
  * Bit-identical to the column form by construction: each dot is the
  * same sequential left fold from 0.0 in element order, each subspace
  * term is ((a·a − (2·a·b)) + b·b), and subspace terms accumulate in
  * ascending-j order — the exact IEEE sequence the HOF tree and the
  * DuckDB oracle's `list_sum(list(dist ORDER BY j))` evaluate.
  * ExpressionSpec pins equality against the HOF formulation.
  *
  * The codebook rides as a constructor literal (a bounded trained
  * artifact, same as the column form's foldable centroid arrays), so
  * candidate rows carry only their m code bytes — the 100 TB ADC
  * economics PQ exists for.
  */
case class PqAdcDist(qv: Expression, codes: Expression,
    cb: IndexedSeq[IndexedSeq[Double]], ds: Int)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = qv
  override def right: Expression = codes

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (qv.dataType, codes.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) if ds > 0 && cb.nonEmpty =>
      TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc_dist expects (array<double> query, array<int> codes, " +
      s"array<array<double>> literal codebook, int literal ds), got " +
      s"${a.simpleString}, ${b.simpleString}")
  }

  // flat row-major copy for cache-friendly access: cbFlat(c*dim + i)
  @transient private lazy val dim = cb.head.length
  @transient private lazy val cbFlat: Array[Double] = {
    val out = new Array[Double](cb.length * dim)
    var c = 0
    while (c < cb.length) {
      var i = 0
      while (i < dim) { out(c * dim + i) = cb(c)(i); i += 1 }
      c += 1
    }
    out
  }

  override def nullSafeEval(q: Any, cd: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val ca = cd.asInstanceOf[ArrayData]
    val m = ca.numElements()
    var sum = 0.0
    var j = 0
    while (j < m) {
      val c = ca.getInt(j)
      val base = j * ds
      val cbase = c * dim + base
      var aa = 0.0; var ab = 0.0; var bb = 0.0
      var i = 0
      while (i < ds) {
        val a = qa.getDouble(base + i)
        val b = cbFlat(cbase + i)
        aa += a * a; ab += a * b; bb += b * b
        i += 1
      }
      sum += (aa - 2.0 * ab) + bb
      j += 1
    }
    sum
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDist =
    copy(qv = newLeft, codes = newRight)
}
