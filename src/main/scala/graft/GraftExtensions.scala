package graft

import graft.functions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.types.IntegerType

/** Registers the native kernels in the SQL function registry, so the
  * engine's surface is reachable from `spark.sql(...)` (and JDBC/
  * thrift users) exactly as from the Column API — the
  * `SparkSessionExtensions` injection point is how a Spark-native
  * library ships operators, not a fork of the analyzer.
  *
  * Activate with `.withExtensions(new GraftExtensions)` (done by
  * [[GraftSession.builder]]) or externally via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", name, usage)

  private def binary(name: String, usage: String,
                     make: (Expression, Expression) => Expression) =
    (FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name expects 2 arguments")
        make(args(0), args(1))
      })

  private def unary(name: String, usage: String,
                    make: Expression => Expression) =
    (FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name expects 1 argument")
        make(args(0))
      })

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("vec_dot",
      "vec_dot(a, b) - inner product of two float/double arrays", VecDot))
    ext.injectFunction(binary("vec_l2",
      "vec_l2(a, b) - euclidean distance of two float/double arrays", VecL2))
    ext.injectFunction(binary("vec_l1",
      "vec_l1(a, b) - Manhattan distance of two float/double arrays",
      VecL1))
    ext.injectFunction(binary("vec_linf",
      "vec_linf(a, b) - Chebyshev (max per-dim) distance of two " +
        "float/double arrays",
      VecLinf))
    ext.injectFunction(binary("vec_cosine",
      "vec_cosine(a, b) - cosine similarity; NULL on zero norm or dim mismatch",
      VecCosine))
    ext.injectFunction(unary("md5_prefix60",
      "md5_prefix60(s) - leading 60 bits of md5(s) as a non-negative BIGINT",
      Md5Prefix60.apply(_: Expression)))
    ext.injectFunction(unary("byte_sum",
      "byte_sum(b) - sum of unsigned byte values of a binary column",
      ByteSum.apply(_: Expression)))
    ext.injectFunction(unary("nfc_normalize",
      "nfc_normalize(s) - Unicode NFC canonical composition (DuckDB-" +
        "compatible; see TextOps.normalize for the full fold stage)",
      NfcNormalize.apply(_: Expression)))
    ext.injectFunction((FunctionIdentifier("byte_sample"),
      info("byte_sample",
        "byte_sample(b, stride) - every stride-th byte of a binary column"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "byte_sample expects 2 arguments")
        // the builder runs BEFORE constant folding, so accept any
        // foldable int expression (2+2, CAST(4 AS INT)), not only a
        // pre-folded Literal
        args(1) match {
          case e if e.foldable && e.dataType == IntegerType =>
            // match, don't unbox: a foldable NULL would unbox to 0 and
            // surface as a misleading "stride must be positive, got 0"
            e.eval() match {
              case i: java.lang.Integer => ByteSample(args(0), i.intValue())
              case _ => throw new IllegalArgumentException(
                "byte_sample stride must be a non-NULL constant integer")
            }
          case other => throw new IllegalArgumentException(
            s"byte_sample stride must be a constant integer, got $other")
        }
      }))
  }
}
