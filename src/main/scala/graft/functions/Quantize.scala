package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Int8 scalar quantization (the FAISS `SQ8` idea): per-dimension
  * affine map of floats onto [0, 255], one byte per dimension. At
  * 100 TB the corpus scan is bandwidth-bound, so 4× smaller vectors
  * are ~4× faster brute force; precision comes back from an exact
  * float rerank over the shortlist (see graft.operators.Quant).
  *
  * The train step's (min, max) per dimension are driver-held literals
  * embedded in the expressions — request-sized, like IVF centroids
  * and LSH hyperplanes.
  */
object QuantUtils {
  /** code[d] = round((x[d]-min[d]) / (max[d]-min[d]) * 255), clamped.
    * A zero-width dimension (min == max) encodes to 0.
    */
  def encode(x: Double, min: Double, max: Double): Byte = {
    val w = max - min
    if (w <= 0) 0.toByte
    else {
      val c = Math.round((x - min) / w * 255.0)
      (if (c < 0) 0L else if (c > 255) 255L else c).toByte
    }
  }
}

/** Encode a float/double array into one byte per dimension. */
case class VecQuantize(child: Expression, mins: Array[Double],
                       maxs: Array[Double]) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "vec_quantize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${t.sql}")
  }

  private def elem(a: ArrayData, i: Int): Double = child.dataType match {
    case ArrayType(FloatType, _) => a.getFloat(i).toDouble
    case _                       => a.getDouble(i)
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), mins.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      out(i) = QuantUtils.encode(elem(a, i), mins(i), maxs(i)); i += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val maxsRef = ctx.addReferenceObj("maxs", maxs, "double[]")
    val get = child.dataType match {
      case ArrayType(FloatType, _) => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case _                       => (a: String, i: String) => s"$a.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $minsRef.length);
         |final byte[] $out = new byte[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.QuantUtils.encode(
         |    ${get(a, i)}, $minsRef[$i], $maxsRef[$i]);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** L2 distance between two SQ8 codes, decoded on the fly:
  * diff_d = (a_d - b_d) · (max_d - min_d)/255 — one fused byte loop,
  * no float vectors materialized. Reports the root, matching VecL2.
  * NULL on code-length mismatch (same contract as the float kernels).
  */
case class VecL2Q8(left: Expression, right: Expression,
                   mins: Array[Double], maxs: Array[Double])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2_q8"
  override def nullable: Boolean = true

  private lazy val scales: Array[Double] =
    mins.indices.map(i => (maxs(i) - mins(i)) / 255.0).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary inputs, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[Array[Byte]]
    val b = bv.asInstanceOf[Array[Byte]]
    if (a.length != b.length) null
    else {
      var acc = 0.0
      var i = 0
      val n = math.min(a.length, scales.length)
      while (i < n) {
        val d = ((a(i) & 0xff) - (b(i) & 0xff)) * scales(i)
        acc += d * d; i += 1
      }
      math.sqrt(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val scalesRef = ctx.addReferenceObj("scales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  final int $n = java.lang.Math.min($a.length, $scalesRef.length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $d = (($a[$i] & 0xff) - ($b[$i] & 0xff)) * $scalesRef[$i];
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = java.lang.Math.sqrt($acc);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity between two SQ8 codes, decoded on the fly
  * (x_d = min_d + code_d·scale_d): one fused byte loop accumulating
  * dot and both norms. NULL on code-length mismatch or zero norm —
  * the same contract as the float [[VecCosine]] — so a code-space
  * shortlist under a cosine search ranks by (an 8-bit approximation
  * of) the SAME metric the exact rerank uses; shortlisting by L2
  * instead would cut small-norm but direction-aligned vectors that
  * cosine ranks near.
  */
case class VecCosineQ8(left: Expression, right: Expression,
                       mins: Array[Double], maxs: Array[Double])
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine_q8"
  override def nullable: Boolean = true

  private lazy val scales: Array[Double] =
    mins.indices.map(i => (maxs(i) - mins(i)) / 255.0).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary inputs, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[Array[Byte]]
    val b = bv.asInstanceOf[Array[Byte]]
    if (a.length != b.length) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, scales.length)
      while (i < n) {
        val x = mins(i) + (a(i) & 0xff) * scales(i)
        val y = mins(i) + (b(i) & 0xff) * scales(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("scales", scales, "double[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      s"""
         |if ($a.length != $b.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  final int $n = java.lang.Math.min($a.length, $scalesRef.length);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = $minsRef[$i] + ($a[$i] & 0xff) * $scalesRef[$i];
         |    final double $y = $minsRef[$i] + ($b[$i] & 0xff) * $scalesRef[$i];
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  final double $denom =
         |    java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Quantize {
  def encode(c: Column, mins: Array[Double], maxs: Array[Double]): Column =
    GraftColumnBridge.column(
      VecQuantize(GraftColumnBridge.expression(c), mins, maxs))

  def l2(a: Column, b: Column, mins: Array[Double], maxs: Array[Double]): Column =
    GraftColumnBridge.column(VecL2Q8(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      mins, maxs))

  def cosine(a: Column, b: Column, mins: Array[Double],
             maxs: Array[Double]): Column =
    GraftColumnBridge.column(VecCosineQ8(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      mins, maxs))
}
