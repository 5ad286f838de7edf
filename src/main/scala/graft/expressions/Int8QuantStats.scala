package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Native codegen int8 max-abs quantization stats over a float vector:
  * one fused Java loop computing `[scale, Σq, Σq², Σ(i+1)·q, #|q|=127]`
  * where q_i = floor(x_i·127/scale + 0.5) — q151's HOF pipeline
  * (transform + three `aggregate` folds + zip_with) evaluates every
  * lambda interpreted per element, which is the wrong shape for a
  * map-only pass over billions of vectors; this expression keeps the
  * whole computation inside whole-stage codegen (house precedent:
  * native loops measured 2–10× over interpreted HOFs at sf1).
  *
  * Determinism contract (oracle unchanged): abs/compare of floats is
  * exact in double, so the double max-abs pass equals float-max-then-
  * widen bit-for-bit; the quantization expression is the identical
  * IEEE sequence the DuckDB oracle evaluates; the four checksums are
  * exact 64-bit integers returned as doubles (all < 2^53). A
  * zero/empty vector yields NULL (q151 filters it, matching the
  * oracle's WHERE scale > 0). A vector containing a NULL element also
  * yields NULL — embeddings are dense by contract, but parquet reads
  * them as containsNull=true, so a sparse vintage must fail visibly
  * (filtered alongside zero vectors) instead of silently quantizing
  * the null as 0.0 while the oracle propagates NULL.
  */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"int8_quant_stats expects array<float>, got ${t.simpleString}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    var scale = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val v = math.abs(a.getFloat(i).toDouble)
      if (v > scale) scale = v
      i += 1
    }
    if (scale == 0.0) return null
    var qsum = 0L; var qdot = 0L; var wsum = 0L; var nsat = 0L
    i = 0
    while (i < n) {
      val q = math.floor(a.getFloat(i).toDouble * 127.0 / scale + 0.5).toLong
      qsum += q; qdot += q * q; wsum += (i + 1) * q
      if (q == 127L || q == -127L) nsat += 1
      i += 1
    }
    new GenericArrayData(Array(scale, qsum.toDouble, qdot.toDouble, wsum.toDouble, nsat.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val scale = ctx.freshName("scale")
      val v = ctx.freshName("v")
      val q = ctx.freshName("q")
      val qsum = ctx.freshName("qsum")
      val qdot = ctx.freshName("qdot")
      val wsum = ctx.freshName("wsum")
      val nsat = ctx.freshName("nsat")
      val out = ctx.freshName("out")
      val hasNullElem = ctx.freshName("hasNullElem")
      s"""
        int $n = $a.numElements();
        double $scale = 0.0;
        boolean $hasNullElem = false;
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i)) { $hasNullElem = true; break; }
          double $v = java.lang.Math.abs((double) $a.getFloat($i));
          if ($v > $scale) $scale = $v;
        }
        if ($hasNullElem || $scale == 0.0) {
          ${ev.isNull} = true;
        } else {
          long $qsum = 0L, $qdot = 0L, $wsum = 0L, $nsat = 0L;
          for (int $i = 0; $i < $n; $i++) {
            long $q = (long) java.lang.Math.floor(
              (double) $a.getFloat($i) * 127.0 / $scale + 0.5);
            $qsum += $q; $qdot += $q * $q; $wsum += ($i + 1) * $q;
            if ($q == 127L || $q == -127L) $nsat++;
          }
          double[] $out = new double[]{$scale, (double) $qsum, (double) $qdot,
            (double) $wsum, (double) $nsat};
          ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}
