package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._

/** Native codegen'd distance kernels over `array<float|double>`.
  *
  * The composed `zip_with`+`aggregate` form (VectorFunctions) is
  * correct but allocates an intermediate array and boxes every lambda
  * step — at Q×N pair volume that dominated the bench
  * (vdb_batch_knn). These expressions emit a single fused primitive
  * loop into whole-stage codegen: no allocation, no boxing, one pass.
  *
  * Numerics are IDENTICAL to the composed form (and to the DuckDB
  * oracle's `list_*(a::DOUBLE[], b)`): each element widened to double,
  * strict left-to-right summation.
  *
  * Reference analog: the FAISS distance kernels behind
  * `FaissIndex::search_vectors` (reference faiss_index.cc:40, metric
  * from index_factory.cc).
  */
sealed abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** All kernels yield NULL on a dimension mismatch (and cosine also
    * on zero norm): the DuckDB oracle's `list_distance` RAISES on
    * unequal lengths, so silently truncating to the shorter vector
    * would produce a plausible-but-wrong score that diverges from the
    * oracle. NULL keys are dropped before top-k on both engines
    * identically (callers filter `isNotNull`).
    */
  override def nullable: Boolean = true

  /** Codegen wrapper: NULL out on length mismatch, else run `body`
    * (the equal-length fast path is unchanged — one fused loop).
    */
  protected def dimGuard(ev: ExprCode, a: String, b: String,
                         body: String): String =
    s"""
       |if ($a.numElements() != $b.numElements()) {
       |  ${ev.isNull} = true;
       |} else {
       |  $body
       |}
     """.stripMargin

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<float|double> inputs, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  /** Java source reading element `i` of `arr` widened to double. */
  protected def elemGet(child: Expression, arr: String, i: String): String =
    child.dataType match {
      case ArrayType(FloatType, _)  => s"(double) $arr.getFloat($i)"
      case _                        => s"$arr.getDouble($i)"
    }

  /** Interpreted-path element read widened to double. */
  protected def elem(child: Expression, a: ArrayData, i: Int): Double =
    child.dataType match {
      case ArrayType(FloatType, _) => a.getFloat(i).toDouble
      case _                       => a.getDouble(i)
    }

  protected def pairLoop(ctx: CodegenContext, a: String, b: String,
                         body: (String, String) => String): (String, String) = {
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val x = ctx.freshName("x")
    val y = ctx.freshName("y")
    val code =
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = ${elemGet(left, a, i)};
         |  final double $y = ${elemGet(right, b, i)};
         |  ${body(x, y)}
         |}
       """.stripMargin
    (code, n)
  }
}

/** <a,b> — reference MetricType::IP. */
case class VecDot(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val (a, b) = (av.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += elem(left, a, i) * elem(right, b, i); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val (loop, _) = pairLoop(ctx, a, b, (x, y) => s"$acc += $x * $y;")
      dimGuard(ev, a, b,
        s"""
           |double $acc = 0.0;
           |$loop
           |${ev.value} = $acc;
         """.stripMargin)
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Euclidean distance — reference MetricType::L2 (FAISS reports
  * squared L2; like the round-1 composed form and the DuckDB oracle's
  * `list_distance`, this reports the root).
  */
case class VecL2(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_l2"

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val (a, b) = (av.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = elem(left, a, i) - elem(right, b, i); acc += d * d; i += 1
      }
      math.sqrt(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val (loop, _) = pairLoop(ctx, a, b,
        (x, y) => s"final double $d = $x - $y; $acc += $d * $d;")
      dimGuard(ev, a, b,
        s"""
           |double $acc = 0.0;
           |$loop
           |${ev.value} = java.lang.Math.sqrt($acc);
         """.stripMargin)
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Σ|aᵢ−bᵢ| — Manhattan / city-block distance (faiss METRIC_L1, the
  * robust-to-outlier-coordinates alternative to L2). Same strict
  * left-to-right summation contract as every kernel here; the DuckDB
  * mirror folds |a[i]−b[i]| over an index range in the same order.
  */
case class VecL1(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_l1"

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val (a, b) = (av.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += math.abs(elem(left, a, i) - elem(right, b, i)); i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val (loop, _) = pairLoop(ctx, a, b,
        (x, y) => s"$acc += java.lang.Math.abs($x - $y);")
      dimGuard(ev, a, b,
        s"""
           |double $acc = 0.0;
           |$loop
           |${ev.value} = $acc;
         """.stripMargin)
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** max|aᵢ−bᵢ| — Chebyshev / L∞ distance (faiss METRIC_Linf, the
  * bound-any-coordinate metric used for quantization-error audits).
  * max() is order-free over doubles, so this kernel is exact on both
  * engines with no summation-order contract needed at all.
  */
case class VecLinf(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_linf"

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val (a, b) = (av.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val d = math.abs(elem(left, a, i) - elem(right, b, i))
        if (d > acc) acc = d
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      val (loop, _) = pairLoop(ctx, a, b,
        (x, y) => s"final double $d = java.lang.Math.abs($x - $y); " +
          s"if ($d > $acc) $acc = $d;")
      dimGuard(ev, a, b,
        s"""
           |double $acc = 0.0;
           |$loop
           |${ev.value} = $acc;
         """.stripMargin)
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity; NULL (not NaN) on a zero-norm input so ordering
  * matches the oracle on degenerate vectors (see
  * VectorFunctions.cosineSimilarity).
  */
case class VecCosine(left: Expression, right: Expression)
    extends VectorBinaryExpression {
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val (a, b) = (av.asInstanceOf[ArrayData], bv.asInstanceOf[ArrayData])
    val n = a.numElements()
    if (n != b.numElements()) null
    else {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = elem(left, a, i); val y = elem(right, b, i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val denom = ctx.freshName("denom")
      val (loop, _) = pairLoop(ctx, a, b,
        (x, y) => s"$dot += $x * $y; $na += $x * $x; $nb += $y * $y;")
      dimGuard(ev, a, b,
        s"""
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |$loop
           |final double $denom =
           |  java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
           |if ($denom == 0.0) { ${ev.isNull} = true; }
           |else { ${ev.value} = $dot / $denom; }
         """.stripMargin)
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API handles for the native kernels. */
object VectorDistance {
  private def c(e: Expression): Column = GraftColumnBridge.column(e)
  private def e(col: Column): Expression = GraftColumnBridge.expression(col)

  def dot(a: Column, b: Column): Column = c(VecDot(e(a), e(b)))
  def l2(a: Column, b: Column): Column = c(VecL2(e(a), e(b)))
  def l1(a: Column, b: Column): Column = c(VecL1(e(a), e(b)))
  def linf(a: Column, b: Column): Column = c(VecLinf(e(a), e(b)))
  def cosine(a: Column, b: Column): Column = c(VecCosine(e(a), e(b)))
}
