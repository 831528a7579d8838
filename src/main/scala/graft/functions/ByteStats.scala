package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Shared byte-loop helpers (called from generated code via static
  * forwarders, same pattern as [[HashUtils]]).
  */
object ByteUtils {
  /** Sum of unsigned byte values — one primitive loop, no per-byte
    * boxing or array allocation.
    */
  def byteSum(b: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < b.length) { acc += (b(i) & 0xffL); i += 1 }
    acc
  }

  /** Every `stride`-th byte (indices 0, stride, 2·stride, …) as a new
    * byte array — one allocation sized exactly to the sample.
    */
  def byteSample(b: Array[Byte], stride: Int): Array[Byte] = {
    if (b.length == 0) return Array.emptyByteArray
    val n = (b.length - 1) / stride + 1
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) { out(i) = b(i * stride); i += 1 }
    out
  }
}

/** Sum of unsigned byte values of a binary column — the payload-stats
  * kernel for multimodal feature extraction. The composed form it
  * replaces (`aggregate(transform(split(decode(payload)), c ->
  * ascii(c)), ...)`) allocated a per-character string array and ran
  * BOTH lambdas interpreted per element — the repo's documented
  * interpreted-lambda pitfall, on the hot path of every payload byte.
  * (For ASCII payloads the two agree; for a real media payload a
  * byte-level sum is the meaningful statistic anyway.)
  */
case class ByteSum(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "byte_sum"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary input, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    ByteUtils.byteSum(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteUtils.byteSum($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteSum {
  def apply(c: Column): Column =
    GraftColumnBridge.column(ByteSum(GraftColumnBridge.expression(c)))
}

/** Every `stride`-th byte of a binary column — the frame-sampling
  * kernel (every-k-th-video-frame shape). Replaces a
  * transform-over-sequence lambda that built one single-char string
  * per frame interpreted; this is one primitive loop and one
  * allocation. Empty input samples to empty (0 frames).
  */
case class ByteSample(child: Expression, stride: Int) extends UnaryExpression {
  require(stride > 0, s"stride must be positive, got $stride")
  override def dataType: DataType = BinaryType
  override def prettyName: String = "byte_sample"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires binary input, got ${t.sql}")
    }

  override def nullSafeEval(v: Any): Any =
    ByteUtils.byteSample(v.asInstanceOf[Array[Byte]], stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ByteUtils.byteSample($c, $stride)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteSample {
  def apply(c: Column, stride: Int): Column =
    GraftColumnBridge.column(
      ByteSample(GraftColumnBridge.expression(c), stride))
}
