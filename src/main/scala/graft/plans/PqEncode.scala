package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native product-quantization encoder: `pq_encode(vec, codebook, nSub)`
  * returns the vector's `nSub` per-subspace nearest-centroid codes as
  * array<int> — the hot path of PQ index builds, where the higher-order
  * `aggregate`/`transform` formulation ([[graft.operators.Pq.encode]])
  * runs interpreted (HigherOrderFunction is CodegenFallback) and
  * allocates closures per element. This expression generates ONE fused
  * triple loop (subspace × centroid × element) inside whole-stage
  * codegen, reads float arrays without an up-front cast pass, and bakes
  * the codebook into the plan as a reference object.
  *
  * Arithmetic contract: squared distances accumulate in DOUBLE (IEEE,
  * sequential element order — deterministic and oracle-replayable as a
  * pinned expression when the subspace width is small), argmin ties
  * break to the LOWER code (strict `<` update over ascending j). The
  * decimal-exact [[graft.operators.Pq.encode]] path remains the
  * portable reference; PqSpec pins native == decimal codes.
  *
  * `codebook` must be a foldable array<array<double>> (a `typedLit`);
  * `nSub` a foldable int dividing the vector dimension.
  */
case class PqEncode(vec: Expression, cbExpr: Expression, nSubExpr: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(vec, cbExpr, nSubExpr)
  override def nullable: Boolean = vec.nullable
  override def foldable: Boolean = children.forall(_.foldable)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    val cbOk = cbExpr.foldable && (cbExpr.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    })
    if (vecOk && cbOk && nSubExpr.foldable && nSubExpr.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, foldable array<array<double>>, " +
        s"foldable int), got (${vec.dataType.sql}, ${cbExpr.dataType.sql}, " +
        s"${nSubExpr.dataType.sql})")
  }

  private def isFloat: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == FloatType

  private lazy val nSub: Int = nSubExpr.eval().asInstanceOf[Number].intValue()
  private lazy val cb: Array[Array[Double]] = {
    val ad = cbExpr.eval().asInstanceOf[ArrayData]
    Array.tabulate(ad.numElements())(j => ad.getArray(j).toDoubleArray())
  }

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val x = v.asInstanceOf[ArrayData]
    val dim = cb(0).length
    val sub = dim / nSub
    val codes = new Array[Int](nSub)
    var m = 0
    while (m < nSub) {
      var bestJ = 0
      var bestD = Double.PositiveInfinity
      var j = 0
      while (j < cb.length) {
        val cent = cb(j)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val idx = m * sub + i
          val xv = if (isFloat) x.getFloat(idx).toDouble else x.getDouble(idx)
          val diff = xv - cent(idx)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; bestJ = j }
        j += 1
      }
      codes(m) = bestJ
      m += 1
    }
    ArrayData.toArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecCode = vec.genCode(ctx)
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    val sub = cb(0).length / nSub
    val (m, j, i, d, diff, bestJ, bestD, codes, idx) = (
      ctx.freshName("m"), ctx.freshName("j"), ctx.freshName("i"),
      ctx.freshName("d"), ctx.freshName("diff"), ctx.freshName("bestJ"),
      ctx.freshName("bestD"), ctx.freshName("codes"), ctx.freshName("idx"))
    ev.copy(code = code"""
      ${vecCode.code}
      boolean ${ev.isNull} = ${vecCode.isNull};
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${ev.isNull}) {
        int[] $codes = new int[$nSub];
        for (int $m = 0; $m < $nSub; $m++) {
          int $bestJ = 0;
          double $bestD = Double.POSITIVE_INFINITY;
          for (int $j = 0; $j < ${cb.length}; $j++) {
            double $d = 0.0;
            for (int $i = 0; $i < $sub; $i++) {
              int $idx = $m * $sub + $i;
              double $diff = (double) ${vecCode.value}.$get($idx) - $cbRef[$j][$idx];
              $d += $diff * $diff;
            }
            if ($d < $bestD) { $bestD = $d; $bestJ = $j; }
          }
          $codes[$m] = $bestJ;
        }
        ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
      }
    """)
  }

  override def prettyName: String = "pq_encode"

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), cbExpr = newChildren(1), nSubExpr = newChildren(2))
}
