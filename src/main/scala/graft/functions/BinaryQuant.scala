package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 1-bit binary quantization (the FAISS binary-index rung below SQ8
  * and PQ): bit d = (x_d > mean_d), packed 32 bits per word. A
  * 64-dim float vector becomes two longs — 32× less scan bandwidth
  * than the floats — and the code-space comparison is Hamming
  * distance (one xor + popcount per word), which for mean-centered
  * sign codes approximates angular (cosine) order. Precision comes
  * back from an exact float rerank over the shortlist, exactly like
  * the SQ8/PQ paths (reference's FAISS FLAT role, faiss_index.cc:40).
  *
  * Words hold 32 bits (not 64) so every packed word is non-negative:
  * the DuckDB oracle mirrors the pack as a sum of `1::BIGINT << j`
  * terms, which at bit 63 would overflow signed 64-bit — 32-bit words
  * keep both engines in well-defined integer arithmetic.
  *
  * Training (per-dimension corpus means, 6dp-rounded like the IVF
  * Lloyd means) is driver-held literals embedded in the expression —
  * request-sized, like centroids and LSH hyperplanes.
  */
object BinaryQuantUtils {
  val WordBits = 32
}

/** Pack a float/double array into sign bits vs per-dim thresholds:
  * word w bit j set iff x[w*32+j] > means[w*32+j]. Output has
  * ceil(n/32) words; dimensions beyond `means.length` are ignored
  * (same trailing-dim contract as [[VecQuantize]]).
  */
case class VecBinPack(child: Expression, means: Array[Double])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "vec_bin_pack"

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
    val n = math.min(a.numElements(), means.length)
    val out = new Array[Long]((n + 31) / 32)
    var i = 0
    while (i < n) {
      if (elem(a, i) > means(i)) out(i >> 5) |= (1L << (i & 31))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val meansRef = ctx.addReferenceObj("means", means, "double[]")
    val get = child.dataType match {
      case ArrayType(FloatType, _) => (a: String, i: String) => s"(double) $a.getFloat($i)"
      case _                       => (a: String, i: String) => s"$a.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $meansRef.length);
         |final long[] $out = new long[($n + 31) / 32];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (${get(a, i)} > $meansRef[$i]) {
         |    $out[$i >> 5] |= (1L << ($i & 31));
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Hamming distance between two packed codes: Σ popcount(a_w ^ b_w),
  * one fused word loop. NULL on word-count mismatch — the same
  * malformed-input contract as the float and SQ8 kernels.
  */
case class BinHamming(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bin_hamming"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val a = av.asInstanceOf[ArrayData]
    val b = bv.asInstanceOf[ArrayData]
    if (a.numElements() != b.numElements()) null
    else {
      var acc = 0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        acc += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i)); i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $acc = 0;
         |  final int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += java.lang.Long.bitCount($a.getLong($i) ^ $b.getLong($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BinaryQuant {
  def pack(c: Column, means: Array[Double]): Column =
    GraftColumnBridge.column(
      VecBinPack(GraftColumnBridge.expression(c), means))

  def hamming(a: Column, b: Column): Column =
    GraftColumnBridge.column(BinHamming(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
