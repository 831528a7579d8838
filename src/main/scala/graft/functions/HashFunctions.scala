package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Allocation-light hashing helpers shared by interpreted eval and
  * generated code (the generated java calls these via the static
  * forwarders on the companion class).
  */
object HashUtils {
  private val digests: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The leading 60 bits of md5(bytes) as a non-negative long —
    * numerically identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)` (first 15 hex digits =
    * first 7 bytes plus the high nibble of the 8th), but with no hex
    * string, no substring, and no decimal parse on the way.
    */
  def md5Prefix60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }
}

/** 60-bit md5 prefix of a string column — the minhash term kernel.
  * The composed `conv(substring(md5(...)))` form allocates a 32-char
  * hex string, a 15-char substring, and a decimal string per call;
  * at minhash volume (12 hashes x shingles x corpus) that garbage
  * dominated young-gen GC. This emits one static call.
  */
case class Md5Prefix60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(v: Any): Any =
    HashUtils.md5Prefix60(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashUtils.md5Prefix60($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Prefix60 {
  def apply(c: Column): Column =
    GraftColumnBridge.column(Md5Prefix60(GraftColumnBridge.expression(c)))
}
