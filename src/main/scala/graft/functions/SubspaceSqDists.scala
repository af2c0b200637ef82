package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native per-subspace squared-L2 distances over two `array<double>`
  * columns cut into `subDim`-wide subspaces — the PQ hot loop
  * ([[graft.operators.Similarity]]: every (vector, codeword) pair
  * computes [[graft.operators.Similarity.PqSubspaces]] of these).
  *
  * Replaces the interpreted
  * `aggregate(zip_with(slice(v,…), slice(cv,…), (x,y) ⇒ (x−y)²), 0.0, _+_)`
  * per subspace: higher-order functions are CodegenFallback (allocating
  * two slices plus a zipped array per subspace per pair), while this
  * expression participates in whole-stage codegen as one tight loop.
  *
  * Semantics match the higher-order formulation bit-for-bit: element m of
  * the result is the strict left-to-right IEEE fold of (x−y)·(x−y) over
  * elements [m·subDim, (m+1)·subDim) — the order the DuckDB oracle's
  * mirrored fold uses. Assumes non-null elements; subspace count =
  * min(len(a), len(b)) / subDim (equal 64-dim inputs in practice).
  */
case class SubspaceSqDists(left: Expression, right: Expression, subDim: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) if subDim > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>) and subDim > 0, " +
          s"got ($l, $r), subDim=$subDim")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_subspace_sq_dists"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nSub = math.min(x.numElements(), y.numElements()) / subDim
    val out = new Array[Double](nSub)
    var m = 0
    while (m < nSub) {
      var s = 0.0
      var i = m * subDim
      val end = i + subDim
      while (i < end) {
        val d = x.getDouble(i) - y.getDouble(i)
        s += d * d
        i += 1
      }
      out(m) = s
      m += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("nSub")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements()) / $subDim;
         |double[] $out = new double[$n];
         |for (int $m = 0; $m < $n; $m++) {
         |  double $s = 0.0;
         |  int $i = $m * $subDim;
         |  int $end = $i + $subDim;
         |  for (; $i < $end; $i++) {
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $s += $d * $d;
         |  }
         |  $out[$m] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubspaceSqDists =
    copy(left = newLeft, right = newRight)
}

object SubspaceSqDists {
  /** Column-DSL entry point. */
  def of(a: Column, b: Column, subDim: Int): Column =
    bridge.column(SubspaceSqDists(bridge.expression(a), bridge.expression(b),
      subDim))
}
