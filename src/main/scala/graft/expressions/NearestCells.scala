package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._

/** Coarse-quantizer cell ranking for IVF ANN: given a vector and a
  * LITERAL centroid matrix (second child must be a foldable
  * array<array<double>> — the driver-known trained model), returns the
  * centroid indices ordered by ascending L2 distance, ties on the lower
  * index. An optional third argument `m` (foldable int) bounds the
  * ranking to the top-m indices: assignment needs m=1, an nprobe search
  * needs m=nprobe, and the partial selection keeps per-row cost at
  * O(cells·(dim+m)) instead of the O(cells²) full sort — the difference
  * between a 4096-cell quantizer being usable and not.
  *
  * Semantics contract (must stay bit-identical to the HOF/oracle form):
  * dist_c = (dot(v,v) - 2*dot(v,c)) + dot(c,c), every dot a sequential
  * left fold in element order; the m-bounded result is a PREFIX of the
  * full ranking (ExpressionSpec pins this). CodegenFallback by the same
  * argument as [[Md5Helper]]'s expressions: the cost is the
  * O(cells*dim) arithmetic, which runs here as primitive JVM loops over
  * a pre-extracted double[][] instead of cells*dim interpreted Catalyst
  * HOF steps per row (measured ~25x on the sf1 bench).
  */
case class NearestCells(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression with CodegenFallback {

  def this(left: Expression, right: Expression) =
    this(left, right, Literal(Int.MaxValue))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(ArrayType(DoubleType, _), _), IntegerType)
          if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "nearest_cells expects (array<double>, foldable array<array<double>>[, foldable int])")
    }

  // centroid matrix and its norms, extracted from the literal once per
  // task (not per row)
  @transient private lazy val cents: Array[Array[Double]] = {
    val arr = second.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i =>
      arr.getArray(i).toDoubleArray())
  }
  @transient private lazy val centNorms: Array[Double] =
    cents.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }
  @transient private lazy val topM: Int = third.eval(null).asInstanceOf[Int]

  override def nullSafeEval(v: Any, ignoredCents: Any, ignoredM: Any): Any = {
    val vec = v.asInstanceOf[ArrayData].toDoubleArray()
    val n = vec.length
    var vv = 0.0
    var i = 0
    while (i < n) { vv += vec(i) * vec(i); i += 1 }
    val k = cents.length
    val dist = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cent = cents(c)
      // fail loudly on a malformed vector: a silent truncated distance
      // would diverge from the HOF/oracle forms with no hint why
      if (cent.length != n) throw new IllegalArgumentException(
        s"nearest_cells: vector dim $n != centroid dim ${cent.length}")
      var dp = 0.0
      i = 0
      while (i < n) { dp += vec(i) * cent(i); i += 1 }
      dist(c) = (vv - 2.0 * dp) + centNorms(c)
      c += 1
    }
    // partial selection sort by (dist, index): after `out` outer
    // rounds the first `out` slots hold the ranking prefix — O(k·m),
    // which for the common m ∈ {1, nprobe} is linear in the cell count
    val out = math.min(k, topM)
    val idx = Array.tabulate(k)(identity)
    var a = 0
    val limit = math.min(out, k - 1)
    while (a < limit) {
      var best = a
      var b = a + 1
      while (b < k) {
        if (dist(idx(b)) < dist(idx(best)) ||
          (dist(idx(b)) == dist(idx(best)) && idx(b) < idx(best))) best = b
        b += 1
      }
      val t = idx(a); idx(a) = idx(best); idx(best) = t
      a += 1
    }
    new GenericArrayData(Array.tabulate(out)(j => idx(j).toLong))
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): NearestCells =
    copy(first = newFirst, second = newSecond, third = newThird)
}
