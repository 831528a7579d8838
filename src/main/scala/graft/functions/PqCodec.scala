package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product quantization (the FAISS `PQ` idea): split a dim-D vector
  * into `m` subspaces of `dsub` dims, quantize each subspace against
  * its own `ksub`-codeword codebook, store one small code per
  * subspace — m·log2(ksub) bits per vector instead of 32·D. At
  * 100 TB the corpus scan is bandwidth-bound, so a 32× smaller code
  * column is ~32× less scan for the shortlist pass; precision comes
  * back from an exact float rerank (see graft.operators.Pq).
  *
  * The trained codebook is a driver-held flat double[] literal
  * (m·ksub·dsub entries — request-sized, like IVF centroids and SQ8
  * grids), embedded in the expressions via `addReferenceObj`.
  * Codebook layout: entry (s, c, j) at index (s·ksub + c)·dsub + j.
  *
  * Distance is ADC (asymmetric distance computation): the query stays
  * float, each corpus row is reconstructed from its code inside one
  * fused loop — never materializing the reconstruction as an array.
  * All arithmetic is strict left-to-right double accumulation, so a
  * DuckDB mirror (list_inner_product over the same diff lists)
  * reproduces every distance bit-for-bit.
  */
object PqUtils {
  /** Nearest codeword per subspace (squared-L2 argmin, ties to the
    * lowest code — the same (dist, cid) tiebreak the IVF assignment
    * uses). Shared by interpreted eval and codegen so the two paths
    * cannot drift. Returns null-marker -1 length contract handled by
    * callers: input must have >= m*dsub elements.
    */
  def encode(get: Int => Double, cb: Array[Double], m: Int, dsub: Int,
             ksub: Int): Array[Int] = {
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = Double.MaxValue
      var bestC = 0
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          val d = get(s * dsub + j) - cb(base + j)
          acc += d * d
          j += 1
        }
        if (acc < best) { best = acc; bestC = c }
        c += 1
      }
      out(s) = bestC
      s += 1
    }
    out
  }

  /** Codegen entrypoints: one per input element type (no boxing). */
  def encodeF(a: ArrayData, cb: Array[Double], m: Int, dsub: Int,
              ksub: Int): ArrayData =
    new GenericArrayData(encode(i => a.getFloat(i).toDouble, cb, m, dsub, ksub))

  def encodeD(a: ArrayData, cb: Array[Double], m: Int, dsub: Int,
              ksub: Int): ArrayData =
    new GenericArrayData(encode(i => a.getDouble(i), cb, m, dsub, ksub))

  /** Permutation entrypoints (VecPermute): null on any out-of-range
    * index, exact element reordering otherwise.
    */
  def permuteF(a: ArrayData, perm: Array[Int]): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](perm.length)
    var i = 0
    while (i < perm.length) {
      val p = perm(i)
      if (p < 0 || p >= n) return null
      out(i) = if (a.isNullAt(p)) null else a.getFloat(p)
      i += 1
    }
    new GenericArrayData(out)
  }

  def permuteD(a: ArrayData, perm: Array[Int]): ArrayData = {
    val n = a.numElements()
    val out = new Array[Any](perm.length)
    var i = 0
    while (i < perm.length) {
      val p = perm(i)
      if (p < 0 || p >= n) return null
      out(i) = if (a.isNullAt(p)) null else a.getDouble(p)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** PQ-encode a float/double vector into an array<int> of m codes.
  * NULL when the vector is shorter than m·dsub (the dim-mismatch
  * contract of the float kernels).
  */
case class VecPqEncode(child: Expression, codebook: Array[Double],
                       m: Int, dsub: Int, ksub: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "vec_pq_encode"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${t.sql}")
  }

  private def isFloat: Boolean =
    child.dataType == ArrayType(FloatType, true) ||
      child.dataType == ArrayType(FloatType, false)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() < m * dsub) null
    else if (isFloat) PqUtils.encodeF(a, codebook, m, dsub, ksub)
    else PqUtils.encodeD(a, codebook, m, dsub, ksub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", codebook, "double[]")
    val fn = if (isFloat) "encodeF" else "encodeD"
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |if ($a.numElements() < ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.PqUtils.$fn($a, $cbRef, $m, $dsub, $ksub);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC L2 distance: exact L2 between the float/double query (right)
  * and the reconstruction of the coded row (left) — one fused loop,
  * the reconstruction never materialized. Reports the root, matching
  * VecL2. NULL on code-length mismatch, short query, or a code value
  * outside [0, ksub).
  */
case class VecL2PqAdc(left: Expression, right: Expression,
                      codebook: Array[Double], m: Int, dsub: Int, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2_pq_adc"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _),
            ArrayType(FloatType, _) | ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<float|double>), " +
          s"got ${l.sql} and ${r.sql}")
    }

  private def qIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(cv: Any, qv: Any): Any = {
    val code = cv.asInstanceOf[ArrayData]
    val q = qv.asInstanceOf[ArrayData]
    if (code.numElements() != m || q.numElements() < m * dsub) null
    else {
      var acc = 0.0
      var s = 0
      while (s < m) {
        val c = code.getInt(s)
        if (c < 0 || c >= ksub) return null
        val base = (s * ksub + c) * dsub
        var j = 0
        while (j < dsub) {
          val x = if (qIsFloat) q.getFloat(s * dsub + j).toDouble
                  else q.getDouble(s * dsub + j)
          val d = x - codebook(base + j)
          acc += d * d
          j += 1
        }
        s += 1
      }
      math.sqrt(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", codebook, "double[]")
    val get = if (qIsFloat) (q: String, i: String) => s"(double) $q.getFloat($i)"
              else (q: String, i: String) => s"$q.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (code, q) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val base = ctx.freshName("base")
      val d = ctx.freshName("d")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |if ($code.numElements() != $m || $q.numElements() < ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m && !$bad; $s++) {
         |    final int $c = $code.getInt($s);
         |    if ($c < 0 || $c >= $ksub) { $bad = true; break; }
         |    final int $base = ($s * $ksub + $c) * $dsub;
         |    for (int $j = 0; $j < $dsub; $j++) {
         |      final double $d = ${get(q, s"$s * $dsub + $j")} - $cbRef[$base + $j];
         |      $acc += $d * $d;
         |    }
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else { ${ev.value} = java.lang.Math.sqrt($acc); }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** LUT-form ADC L2: the query's per-(subspace, codeword) squared
  * partial distances are PRECOMPUTED into a flat m·ksub lookup table
  * (the standard FAISS ADC optimization), so the per-row work drops
  * from m·dsub fused multiply-adds to m table lookups + adds — ~8×
  * less scan-side arithmetic at dsub=8, which is what the
  * bandwidth-bound 100 TB shortlist pass feels. The LUT rides as a
  * broadcast-side column (built once per query), not a captured
  * literal, so one generated class serves every query.
  *
  * NOTE the fold order differs from [[VecL2PqAdc]] (per-subspace
  * partial sums, then summed across subspaces) — last-ulp results
  * may differ from the flat fold; the DuckDB oracle mirrors THIS
  * order (list_sum over per-subspace list_inner_products).
  */
case class VecL2PqLut(left: Expression, right: Expression,
                      m: Int, ksub: Int) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_l2_pq_lut"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<double>), " +
          s"got ${l.sql} and ${r.sql}")
    }

  override def nullSafeEval(cv: Any, lv: Any): Any = {
    val code = cv.asInstanceOf[ArrayData]
    val lut = lv.asInstanceOf[ArrayData]
    if (code.numElements() != m || lut.numElements() != m * ksub) null
    else {
      var acc = 0.0
      var s = 0
      while (s < m) {
        val c = code.getInt(s)
        if (c < 0 || c >= ksub) return null
        acc += lut.getDouble(s * ksub + c)
        s += 1
      }
      math.sqrt(acc)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (code, lut) => {
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val bad = ctx.freshName("bad")
      s"""
         |if ($code.numElements() != $m || $lut.numElements() != ${m * ksub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m; $s++) {
         |    final int $c = $code.getInt($s);
         |    if ($c < 0 || $c >= $ksub) { $bad = true; break; }
         |    $acc += $lut.getDouble($s * $ksub + $c);
         |  }
         |  if ($bad) { ${ev.isNull} = true; }
         |  else { ${ev.value} = java.lang.Math.sqrt($acc); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** ADC cosine similarity: cosine between the float/double query
  * (right) and the reconstruction of the coded row (left), one fused
  * loop accumulating dot and both norms — the same contract as
  * VecCosine (NULL on mismatch or zero norm), so a code-space
  * shortlist under a cosine search ranks by (a PQ approximation of)
  * the SAME metric the exact rerank uses.
  */
case class VecCosinePqAdc(left: Expression, right: Expression,
                          codebook: Array[Double], m: Int, dsub: Int, ksub: Int)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_cosine_pq_adc"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _),
            ArrayType(FloatType, _) | ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<int>, array<float|double>), " +
          s"got ${l.sql} and ${r.sql}")
    }

  private def qIsFloat: Boolean = right.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(cv: Any, qv: Any): Any = {
    val code = cv.asInstanceOf[ArrayData]
    val q = qv.asInstanceOf[ArrayData]
    if (code.numElements() != m || q.numElements() < m * dsub) null
    else {
      var dot = 0.0; var nq = 0.0; var nr = 0.0
      var s = 0
      while (s < m) {
        val c = code.getInt(s)
        if (c < 0 || c >= ksub) return null
        val base = (s * ksub + c) * dsub
        var j = 0
        while (j < dsub) {
          val x = if (qIsFloat) q.getFloat(s * dsub + j).toDouble
                  else q.getDouble(s * dsub + j)
          val y = codebook(base + j)
          dot += x * y; nq += x * x; nr += y * y
          j += 1
        }
        s += 1
      }
      val denom = math.sqrt(nq) * math.sqrt(nr)
      if (denom == 0.0) null else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", codebook, "double[]")
    val get = if (qIsFloat) (q: String, i: String) => s"(double) $q.getFloat($i)"
              else (q: String, i: String) => s"$q.getDouble($i)"
    nullSafeCodeGen(ctx, ev, (code, q) => {
      val s = ctx.freshName("s")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val base = ctx.freshName("base")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val dot = ctx.freshName("dot")
      val nq = ctx.freshName("nq")
      val nr = ctx.freshName("nr")
      val bad = ctx.freshName("bad")
      val denom = ctx.freshName("denom")
      s"""
         |if ($code.numElements() != $m || $q.numElements() < ${m * dsub}) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nq = 0.0; double $nr = 0.0;
         |  boolean $bad = false;
         |  for (int $s = 0; $s < $m && !$bad; $s++) {
         |    final int $c = $code.getInt($s);
         |    if ($c < 0 || $c >= $ksub) { $bad = true; break; }
         |    final int $base = ($s * $ksub + $c) * $dsub;
         |    for (int $j = 0; $j < $dsub; $j++) {
         |      final double $x = ${get(q, s"$s * $dsub + $j")};
         |      final double $y = $cbRef[$base + $j];
         |      $dot += $x * $y; $nq += $x * $x; $nr += $y * $y;
         |    }
         |  }
         |  final double $denom =
         |    java.lang.Math.sqrt($nq) * java.lang.Math.sqrt($nr);
         |  if ($bad || $denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Array permutation as a constant-code-size kernel:
  * `out[i] = in[perm[i]]`, the OPQ rotation applied to a vector
  * column. The composed form — `array(element_at(v, p₁), …,
  * element_at(v, p₆₄))` — unrolls one bounds-checked branch per
  * dimension, and stacked in one projection with the (constant-size
  * but non-trivial) CentroidTopM kernel the generated method crossed
  * Janino's limit and the WHOLE stage fell back to interpreted
  * evaluation — silently, at INFO log level: measured on the x16
  * scale replica, assignment+rotation ran 34.6s where assignment
  * alone is 0.94s and rotation+encode alone is 0.56s (OpqDiag). Same
  * code-size bug class as the §4 centroid-kernel cliff, one hop
  * downstream. Here the permutation rides as a reference int[] and
  * the generated code is one loop — constant size for any dim.
  *
  * NULL when any permuted index falls outside the input (the
  * dim-mismatch contract of the float kernels); on valid inputs the
  * output is an exact element reordering, so every downstream
  * distance is bit-identical to the composed form.
  */
case class VecPermute(child: Expression, perm: Seq[Int])
    extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def prettyName: String = "vec_permute"
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${t.sql}")
  }

  @transient private lazy val permArr: Array[Int] = perm.toArray
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (isFloat) PqUtils.permuteF(a, permArr)
    else PqUtils.permuteD(a, permArr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("perm", permArr, "int[]")
    val fn = if (isFloat) "permuteF" else "permuteD"
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.PqUtils.$fn($a, $pRef);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqCodec {
  def encode(c: Column, cb: Array[Double], m: Int, dsub: Int,
             ksub: Int): Column =
    GraftColumnBridge.column(
      VecPqEncode(GraftColumnBridge.expression(c), cb, m, dsub, ksub))

  def permute(c: Column, perm: Seq[Int]): Column =
    GraftColumnBridge.column(VecPermute(GraftColumnBridge.expression(c), perm))

  def l2Adc(code: Column, q: Column, cb: Array[Double], m: Int, dsub: Int,
            ksub: Int): Column =
    GraftColumnBridge.column(VecL2PqAdc(
      GraftColumnBridge.expression(code), GraftColumnBridge.expression(q),
      cb, m, dsub, ksub))

  def cosineAdc(code: Column, q: Column, cb: Array[Double], m: Int,
                dsub: Int, ksub: Int): Column =
    GraftColumnBridge.column(VecCosinePqAdc(
      GraftColumnBridge.expression(code), GraftColumnBridge.expression(q),
      cb, m, dsub, ksub))

  def l2Lut(code: Column, lut: Column, m: Int, ksub: Int): Column =
    GraftColumnBridge.column(VecL2PqLut(
      GraftColumnBridge.expression(code), GraftColumnBridge.expression(lut),
      m, ksub))

  /** Driver-side ADC lookup table for one query: lut[s·ksub + c] =
    * Σ_j (q[s·dsub+j] − cb[s,c,j])², the same j-order fold the encode
    * kernel runs. m·ksub doubles — query-sized, built once per query
    * and amortized over every scanned row.
    */
  def l2LutFor(q: Array[Float], cb: Array[Double], m: Int, dsub: Int,
               ksub: Int): Array[Double] = {
    val lut = new Array[Double](m * ksub)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < ksub) {
        val base = (s * ksub + c) * dsub
        var acc = 0.0
        var j = 0
        while (j < dsub) {
          val d = q(s * dsub + j).toDouble - cb(base + j)
          acc += d * d
          j += 1
        }
        lut(s * ksub + c) = acc
        c += 1
      }
      s += 1
    }
    lut
  }
}
