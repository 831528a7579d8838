package graft

import graft.functions.VectorDistance
import org.apache.spark.sql.functions._

/** Pins the fused centroid kernels (r16, VERDICT r15 #1) to the
  * composed form they replaced: `CentroidTopM(m)` must equal
  * `slice(array_sort(CentroidDistances(…)), 1, m)` row-for-row and
  * bit-for-bit — the oracle-hash contract that let the swap ship
  * with zero hash changes — including the degenerate rows (NULL
  * vector, dim mismatch, zero norm → cd 2.0; NaN coordinates →
  * NaN-greatest ordering) and the equal-distance tiebreak (lowest
  * cell id). Also pins interpreted `eval` ≡ whole-stage codegen,
  * which the oracle suite alone cannot distinguish (it only ever
  * exercises whichever path the planner picks).
  */
class CentroidKernelSpec extends SparkSuite {
  import spark.implicits._

  // deterministic pseudo-random corpus: 60 rows × dim 8, plus the
  // degenerate rows the kernels special-case
  private val dim = 8
  private def vec(seed: Int): Array[Float] =
    Array.tabulate(dim) { j =>
      val h = ((seed * 2654435761L + j * 40503L) & 0xffff).toFloat
      (h / 32768.0f) - 1.0f
    }
  private val rows: Seq[(Long, Array[Float])] =
    (0 until 60).map(i => (i.toLong, vec(i))) ++ Seq(
      (60L, null),
      (61L, Array.fill(dim)(0.0f)),          // zero norm
      (62L, vec(7) :+ 1.0f),                 // dim mismatch (dim+1)
      (63L, { val v = vec(9); v(3) = Float.NaN; v }) // NaN coord
    )
  // 13 centroids; cells ascending (the caller precondition
  // collectCentroids guarantees); cell 7 duplicates cell 3's vector
  // so equal distances exercise the cell-id tiebreak on every row
  private val cents: Seq[(Long, Array[Float])] =
    (0 until 13).map(i => (i.toLong, if (i == 7) vec(103) else vec(100 + i)))

  private val cells = cents.map(_._1)
  private val cvecs: Seq[Seq[Float]] = cents.map(_._2.toSeq)

  private def df = rows.toDF("id", "v")

  private def composed(m: Int) =
    slice(array_sort(VectorDistance.centroidDists($"v", cells, cvecs)), 1, m)

  private def fused(m: Int) =
    VectorDistance.centroidTopM($"v", cells, cvecs, m)

  private def collectBoth(m: Int) = {
    val got = df.select($"id", fused(m).as("t")).orderBy("id").collect()
    val want = df.select($"id", composed(m).as("t")).orderBy("id").collect()
    (got, want)
  }

  private def assertSame(m: Int): Unit = {
    val (got, want) = collectBoth(m)
    assert(got.length == want.length)
    got.zip(want).foreach { case (g, w) =>
      // Row equality on array<struct<double,long>> compares doubles
      // via == (NaN != NaN), so render to bit-exact strings instead
      def render(r: org.apache.spark.sql.Row) =
        r.getSeq[org.apache.spark.sql.Row](1).map { s =>
          s"${java.lang.Double.doubleToRawLongBits(s.getDouble(0))}:${s.getLong(1)}"
        }.mkString(",")
      assert(render(g) == render(w), s"id=${g.getLong(0)} m=$m")
    }
  }

  test("topM equals sliced sort of the full distance array (m=1,2,5,13,20)") {
    Seq(1, 2, 5, 13, 20).foreach(assertSame)
  }

  test("degenerate rows yield cd=2.0 prefixes in ascending cell order") {
    val r = df.where($"id" >= 60 && $"id" =!= 63)
      .select($"id", fused(3).as("t")).collect()
    assert(r.length == 3)
    r.foreach { row =>
      val t = row.getSeq[org.apache.spark.sql.Row](1)
      assert(t.map(_.getDouble(0)) == Seq(2.0, 2.0, 2.0))
      assert(t.map(_.getLong(1)) == Seq(0L, 1L, 2L), s"id=${row.getLong(0)}")
    }
  }

  test("NaN coordinates rank last, real distances first") {
    // every centroid dot a NaN-coordinate vector is NaN; NaN sorts
    // greatest in the SQL total order, so the full prefix is NaN
    // rows in ascending cell order — same as the composed sort
    assertSame(13)
    val t = df.where($"id" === 63).select(fused(13).as("t"))
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(t.forall(s => s.getDouble(0).isNaN))
    assert(t.map(_.getLong(1)) == (0L until 13L))
  }

  test("equal-distance tiebreak picks the lower cell id") {
    // cells 3 and 7 share a centroid vector → identical cd on every
    // row; whenever both appear in the prefix, 3 precedes 7
    val prefixes = df.where($"id" < 60).select(fused(13).as("t")).collect()
    prefixes.foreach { row =>
      val ids = row.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(1))
      assert(ids.indexOf(3L) < ids.indexOf(7L))
    }
  }

  test("interpreted eval matches codegen bit-for-bit") {
    val key = "spark.sql.codegen.factoryMode"
    val ws = "spark.sql.codegen.wholeStage"
    val prev = (spark.conf.get(key), spark.conf.get(ws))
    val fromCodegen = df.select($"id", fused(2).as("t"), composed(2).as("c"))
      .orderBy("id").collect()
    try {
      spark.conf.set(key, "NO_CODEGEN"); spark.conf.set(ws, "false")
      val interp = df.select($"id", fused(2).as("t"), composed(2).as("c"))
        .orderBy("id").collect()
      def render(rs: Array[org.apache.spark.sql.Row]) = rs.map { r =>
        (1 to 2).map(c => r.getSeq[org.apache.spark.sql.Row](c).map { s =>
          s"${java.lang.Double.doubleToRawLongBits(s.getDouble(0))}:${s.getLong(1)}"
        }.mkString(",")).mkString("|")
      }.mkString("\n")
      assert(render(interp) == render(fromCodegen))
    } finally {
      spark.conf.set(key, prev._1); spark.conf.set(ws, prev._2)
    }
  }
}
