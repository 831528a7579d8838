package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Preflight: surface testdata schema drift as ONE clear message
    // instead of N scattered per-query analysis failures (round 7:
    // regenerated events.parquet broke 26 queries with no single
    // diagnostic). Non-fatal — tables that still match keep running.
    SchemaCanary.drift(spark, sfDir).foreach { d =>
      System.err.println(s"[verify] SCHEMA DRIFT: $d")
    }
    // optional subset for local iteration: SPARK_GRAFT_ONLY=q1,q2
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // DuckDB (1.0) INLINES every CTE reference: the unrolled beam /
    // descent mirrors reference each round's CTE twice, so the chain
    // re-evaluates exponentially — ann_hnsw's oracle alone ran 146 s
    // at sf0.01 and the whole registry ~19 min, which can blow the
    // driver's compare budget (the round-9 record came back empty).
    // AS MATERIALIZED evaluates each CTE once: same results (verified
    // value-identical across the registry), 16 s total. The rewrite
    // is anchored to CTE-name POSITIONS — line start (the builder
    // authors every CTE header at column 0 of its stripMargin line)
    // or directly after `WITH ` — so `WINDOW w AS (...)` bindings
    // (always after the uppercase WINDOW keyword) and any ` AS (`
    // text inside string literals are never touched. The previous
    // whole-string rewrite with a `contains("WINDOW ")` opt-out
    // silently disabled materialization for 6 window queries.
    def materialize(sql: String): String =
      sql.replaceAll("(?m)(^|\\bWITH (?:RECURSIVE )?)([a-z0-9_]+) AS \\(",
        "$1$2 AS MATERIALIZED (")
    // DuckDB's list_cosine_similarity(zero-norm, ·) returns −1.0 where
    // the Spark kernel's contract is NULL (degenerate vectors DROP
    // from cosine rankings — KnnSpec pins it; surfaced by the r12
    // fuzz's planted zero vector, which DuckDB ranked LAST at −1.0
    // instead of excluding). Rewrite every call into a null-safe CASE
    // at this single emission point so all ~90 cosine sites share the
    // kernel's semantics. Paren-aware: arguments nest calls and span
    // lines.
    // Hardened r13 (ADVICE r12): the scanner walks the SQL once
    // tracking '…' literals and -- comments, so a call-name mention
    // inside either is copied verbatim instead of rewritten; the
    // paren walk is bounds-checked and FAILS LOUDLY on an unbalanced
    // fragment (a silent mis-rewrite would surface as an opaque
    // DuckDB error — or worse, a wrong oracle — at compare time).
    def nullSafeCosine(sql: String): String = {
      val name = "list_cosine_similarity("
      val sb = new StringBuilder
      var i = 0
      while (i < sql.length) {
        val c = sql.charAt(i)
        if (c == '\'') { // copy the quoted literal whole ('' escapes)
          val end = {
            var j = i + 1
            while (j < sql.length && sql.charAt(j) != '\'') j += 1
            j
          }
          sb.append(sql.substring(i, math.min(end + 1, sql.length)))
          i = end + 1
        } else if (c == '-' && i + 1 < sql.length &&
            sql.charAt(i + 1) == '-') { // copy the -- comment whole
          val nl = sql.indexOf('\n', i)
          val end = if (nl < 0) sql.length else nl + 1
          sb.append(sql.substring(i, end)); i = end
        } else if (sql.startsWith(name, i)) {
          var depth = 1
          var j = i + name.length
          var comma = -1
          while (depth > 0) {
            require(j < sql.length,
              s"nullSafeCosine: unbalanced parens after offset $i in " +
                s"oracle SQL: …${sql.substring(i, math.min(i + 80, sql.length))}")
            val ch = sql.charAt(j)
            if (ch == '\'') { // literal inside the argument list
              j += 1
              while (j < sql.length && sql.charAt(j) != '\'') j += 1
            }
            else if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            else if (ch == ',' && depth == 1 && comma < 0) comma = j
            j += 1
          }
          require(comma > 0,
            s"nullSafeCosine: no top-level comma in call at offset $i")
          val a = nullSafeCosine(sql.substring(i + name.length, comma).trim)
          val b = nullSafeCosine(sql.substring(comma + 1, j - 1).trim)
          sb.append(s"(CASE WHEN list_inner_product($a, $a) " +
            s"* list_inner_product($b, $b) = 0 THEN NULL " +
            s"ELSE list_cosine_similarity($a, $b) END)")
          i = j
        } else { sb.append(c); i += 1 }
      }
      sb.toString
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(materialize(nullSafeCosine(v)))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
