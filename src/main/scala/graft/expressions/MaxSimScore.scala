package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Late-interaction MaxSim score fused into one codegen loop — the
  * native form of q164's 64-term column tree
  * `Σ_i greatest_j FLOOR(cosine_sim(slice(qv, i·ds+1, ds),
  * slice(v, j·ds+1, ds)) · 10⁴)`, which allocates 2·m array slices and
  * evaluates m² separate cosine calls per CANDIDATE ROW of the
  * query×corpus fanout (measured 23.7 s at sf10 — the q133/q119 lesson
  * applied to the multi-vector scan).
  *
  * Bit-identical to the column form by construction: each sub-cosine
  * is CosineSimilarity's one-pass three-accumulator sequential fold
  * over the same elements (slice offsets replaced by index arithmetic,
  * no copies), quantized exactly like Spark's FLOOR(double→long) via
  * `(long) Math.floor(c · 10000.0)`; the per-i max over j and the
  * ascending-i sum are integer ops with no ordering sensitivity.
  * ExpressionSpec pins equality against the column formulation.
  *
  * The candidate's m² sub-cosines share one row read: document
  * sub-vector norms are computed once per j and reused across all i —
  * an optimization the column tree cannot express (it recomputes each
  * |d_j|² m times) that is invisible to results because |d_j|² is the
  * identical left fold either way.
  */
case class MaxSimScore(qv: Expression, v: Expression, m: Int, ds: Int)
    extends BinaryExpression {

  override def left: Expression = qv
  override def right: Expression = v

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (qv.dataType, v.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) if m > 0 && ds > 0 =>
      TypeCheckResult.TypeCheckSuccess
    case (a, b) => TypeCheckResult.TypeCheckFailure(
      s"maxsim_score expects (array<double>, array<double>, int literal m, " +
      s"int literal ds), got (${a.simpleString}, ${b.simpleString})")
  }

  override def nullSafeEval(qa: Any, va: Any): Any = {
    val q = qa.asInstanceOf[ArrayData]
    val d = va.asInstanceOf[ArrayData]
    // ArrayData.getDouble on UnsafeArrayData is an unchecked offset
    // read — a short array would silently score adjacent memory.
    if (q.numElements() < m * ds || d.numElements() < m * ds)
      throw new IllegalArgumentException(
        s"maxsim_score: inputs must have at least ${m * ds} elements " +
        s"(m=$m, ds=$ds), got ${q.numElements()} and ${d.numElements()}")
    // per-sub-vector norms, each the same sequential fold as the
    // column form's cosine_sim over slice(x, k*ds+1, ds)
    val qn = new Array[Double](m)
    val dn = new Array[Double](m)
    var k = 0
    while (k < m) {
      var sq = 0.0; var sd = 0.0
      var i = 0
      while (i < ds) {
        val x = q.getDouble(k * ds + i); sq += x * x
        val y = d.getDouble(k * ds + i); sd += y * y
        i += 1
      }
      qn(k) = math.sqrt(sq); dn(k) = math.sqrt(sd)
      k += 1
    }
    var total = 0L
    var i = 0
    while (i < m) {
      var best = Long.MinValue
      var j = 0
      while (j < m) {
        var dot = 0.0
        var t = 0
        while (t < ds) {
          dot += q.getDouble(i * ds + t) * d.getDouble(j * ds + t)
          t += 1
        }
        val bp = math.floor(dot / (qn(i) * dn(j)) * 10000.0).toLong
        if (bp > best) best = bp
        j += 1
      }
      total += best
      i += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, d) => {
      val qn = ctx.freshName("qn"); val dn = ctx.freshName("dn")
      val k = ctx.freshName("k"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val t = ctx.freshName("t")
      val sq = ctx.freshName("sq"); val sd = ctx.freshName("sd")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val dot = ctx.freshName("dot"); val bp = ctx.freshName("bp")
      val best = ctx.freshName("best"); val total = ctx.freshName("total")
      s"""
        if ($q.numElements() < ${m * ds} || $d.numElements() < ${m * ds}) {
          throw new IllegalArgumentException(
            "maxsim_score: inputs must have at least ${m * ds} elements (m=$m, ds=$ds), got "
            + $q.numElements() + " and " + $d.numElements());
        }
        double[] $qn = new double[$m];
        double[] $dn = new double[$m];
        for (int $k = 0; $k < $m; $k++) {
          double $sq = 0.0, $sd = 0.0;
          for (int $t = 0; $t < $ds; $t++) {
            double $x = $q.getDouble($k * $ds + $t); $sq += $x * $x;
            double $y = $d.getDouble($k * $ds + $t); $sd += $y * $y;
          }
          $qn[$k] = java.lang.Math.sqrt($sq);
          $dn[$k] = java.lang.Math.sqrt($sd);
        }
        long $total = 0L;
        for (int $i = 0; $i < $m; $i++) {
          long $best = java.lang.Long.MIN_VALUE;
          for (int $j = 0; $j < $m; $j++) {
            double $dot = 0.0;
            for (int $t = 0; $t < $ds; $t++) {
              $dot += $q.getDouble($i * $ds + $t) * $d.getDouble($j * $ds + $t);
            }
            long $bp = (long) java.lang.Math.floor($dot / ($qn[$i] * $dn[$j]) * 10000.0);
            if ($bp > $best) $best = $bp;
          }
          $total += $best;
        }
        ${ev.value} = $total;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MaxSimScore =
    copy(qv = newLeft, v = newRight)
}
