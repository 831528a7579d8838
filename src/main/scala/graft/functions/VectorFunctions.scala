package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector distance/similarity as composed codegen'd built-ins.
  *
  * Re-expresses the distance kernels the reference delegates to FAISS
  * (reference faiss_index.cc:40 search_vectors, metric L2/IP from
  * index_factory.cc) as Catalyst expressions over `array<float>`
  * columns: `zip_with` + `aggregate` stay inside whole-stage codegen,
  * no UDF/serialization boundary.
  *
  * All math in double precision (elements cast first) with strict
  * left-to-right summation, so results are bit-comparable with the
  * DuckDB oracle's `list_distance(a::DOUBLE[], b::DOUBLE[])`.
  */
object VectorFunctions {

  /** array<float|double> -> array<double> */
  def vecD(c: Column): Column = transform(c, _.cast("double"))

  private def sum(c: Column): Column =
    aggregate(c, lit(0.0), (acc, x) => acc + x)

  /** Inner product <a,b>. Reference: MetricType::IP. */
  def dotProduct(a: Column, b: Column): Column =
    sum(zip_with(a, b, (x, y) => x * y))

  def squaredL2(a: Column, b: Column): Column =
    sum(zip_with(a, b, (x, y) => (x - y) * (x - y)))

  /** Euclidean distance. Reference: MetricType::L2. */
  def l2Distance(a: Column, b: Column): Column = sqrt(squaredL2(a, b))

  def l2Norm(a: Column): Column = sqrt(sum(transform(a, x => x * x)))

  /** Cosine similarity (normalized IP — the standard embedding metric).
    * Zero-norm inputs yield NULL (not NaN): NaN ordering differs
    * between Spark and DuckDB, so a degenerate all-zero vector would
    * silently diverge from the oracle; NULL drops it from top-k on
    * both sides identically.
    */
  def cosineSimilarity(a: Column, b: Column): Column =
    dotProduct(a, b) / nullif(l2Norm(a) * l2Norm(b), lit(0.0))
}
