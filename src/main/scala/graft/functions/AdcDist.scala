package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native ADC distance: a stored PQ code array `codes` (array<int>,
  * codes[m] = nearest codeword of subspace m) against a query's FLATTENED
  * distance table `qtab` (array<double>, qtab[m·K + c] = the query's
  * squared distance to codeword c of subspace m) → the asymmetric
  * distance Σ_m qtab[m·K + codes[m]], folded in subspace order.
  *
  * Why an Expression: this fold runs once per (query, corpus vector) pair
  * — the innermost loop of the whole PQ search path. The declarative form
  * `aggregate(sequence(0, nSub-1), 0.0, (acc, m) -> acc +
  * element_at(qtab, m*K + element_at(codes, m+1) + 1))` is an interpreted
  * higher-order fold: per pair it allocates the sequence array and a
  * lambda frame per element, and boxes every accumulator step. Identical
  * strict left-to-right IEEE addition in subspace order, so the values
  * (and the oracle's sorted-fold mirror) are bit-for-bit unchanged.
  */
case class AdcDist(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) if k > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<double>) and k > 0, " +
          s"got ($l, $r), k=$k")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_adc_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val qtab = b.asInstanceOf[ArrayData]
    var acc = 0.0
    var m = 0
    val nSub = codes.numElements()
    while (m < nSub) {
      acc += qtab.getDouble(m * k + codes.getInt(m))
      m += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val m = ctx.freshName("m")
      val nSub = ctx.freshName("nSub")
      s"""
         |double $acc = 0.0;
         |int $nSub = $a.numElements();
         |for (int $m = 0; $m < $nSub; $m++) {
         |  $acc += $b.getDouble($m * $k + $a.getInt($m));
         |}
         |${ev.value} = $acc;
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcDist =
    copy(left = newLeft, right = newRight)
}

object AdcDist {
  /** Column-DSL entry point. */
  def of(codes: Column, qtab: Column, k: Int): Column =
    bridge.column(AdcDist(bridge.expression(codes), bridge.expression(qtab), k))
}
