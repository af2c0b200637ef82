package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native prefix dot products over two `array<double>` columns: element j
  * of the result is the dot product of the first `cuts(j)` elements —
  * ONE left-to-right pass emitting the running sum at each cut point.
  *
  * A left fold's prefix IS its partial sum, so `out(j)` is bit-identical
  * to an independent [[DotProduct]] (or `list_dot_product`) over
  * `slice(a, 1, cuts(j))` — the matryoshka sweep's per-width cosines all
  * come out of one pass instead of one sliced sub-plan per width.
  * Cut points must be ascending; positions past min(len(a), len(b))
  * emit the full-length running sum (inputs are fixed-width embedding
  * columns in practice).
  */
case class PrefixDots(left: Expression, right: Expression, cuts: Seq[Int])
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _))
        if cuts.nonEmpty && cuts == cuts.sorted && cuts.head > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, array<double>) and ascending " +
          s"positive cuts, got ($l, $r), cuts=$cuts")
    }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "graft_prefix_dots"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val out = new Array[Double](cuts.length)
    var s = 0.0
    var i = 0
    var j = 0
    while (j < cuts.length) {
      val end = math.min(cuts(j), n)
      while (i < end) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      out(j) = s
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val end = ctx.freshName("end")
      val cutsArr = ctx.freshName("cuts")
      val cutsInit = cuts.mkString(", ")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int[] $cutsArr = new int[]{$cutsInit};
         |double[] $out = new double[${cuts.length}];
         |double $s = 0.0;
         |int $i = 0;
         |for (int $j = 0; $j < ${cuts.length}; $j++) {
         |  int $end = java.lang.Math.min($cutsArr[$j], $n);
         |  for (; $i < $end; $i++) { $s += $a.getDouble($i) * $b.getDouble($i); }
         |  $out[$j] = $s;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PrefixDots =
    copy(left = newLeft, right = newRight)
}

object PrefixDots {
  /** Column-DSL entry point. */
  def of(a: Column, b: Column, cuts: Seq[Int]): Column =
    bridge.column(PrefixDots(bridge.expression(a), bridge.expression(b), cuts))
}
