package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native DEFLATE length: string → compressed byte count at a fixed
  * level (raw deflate, BEST_COMPRESSION, no zlib header so the constant
  * overhead is minimal on short documents). `deflate_len / raw_len` is
  * the classic compression-ratio quality signal (C4/Gopher lineage):
  * far below the corpus norm → boilerplate/repetition the token-level
  * repetition gate can miss (DEFLATE sees ANY byte-level redundancy, not
  * just token n-grams); near/above 1 → already-compressed or binary
  * junk masquerading as text.
  *
  * Why an Expression and not a UDF: same contract as the other sketches
  * — a per-row pure function planned as a map-only projection (no
  * exchange at any scale), null-safe, and visible to SQL users as
  * `graft_deflate_len` via [[graft.GraftExtensions]]. The body is a JNI
  * zlib call, so codegen wraps the same static helper the interpreted
  * path uses (the loop below is not the hot part — zlib is).
  *
  * NOT oracle-checked: DuckDB ships no compression scalar, so the
  * consumer query ([[graft.operators.TextAnalysis.compressionRatio]])
  * stays an unregistered spec-pinned twin (the `valueQuantilesApprox`
  * convention) rather than weakening the registry's 100% hash-check
  * record. */
case class DeflateLength(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_deflate_len"

  override def nullSafeEval(v: Any): Any =
    DeflateLength.of(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateLength.of($a);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}

object DeflateLength {

  /** Deflated byte count (static so generated code can call it). A fresh
    * Deflater per call: the object is cheap next to the compression
    * itself, and sharing one across rows would need thread confinement
    * codegen cannot promise. */
  def of(s: UTF8String): Long = {
    val in = s.getBytes
    val d = new Deflater(Deflater.BEST_COMPRESSION, /* nowrap = */ true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Column-DSL entry point. */
  def of(text: Column): Column =
    bridge.column(DeflateLength(bridge.expression(text)))
}
