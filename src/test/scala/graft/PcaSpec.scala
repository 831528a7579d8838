package graft

import graft.operators.Pca

/** The power-iteration eigensolve over exact integer moments: the
  * driver-side math the `embed_pca_project` mirror replicates fold
  * for fold.
  */
class PcaSpec extends SparkSuite {

  private val Dim = 64

  /** Exact moments of a synthetic micro-matrix (rows already in
    * micro units — the same integers the operator's one pass sums).
    */
  private def momentsOf(rows: Seq[Array[Long]])
      : (Array[Long], Array[Array[Long]], Long) = {
    val s = Array.ofDim[Long](Dim)
    val m = Array.ofDim[Long](Dim, Dim)
    rows.foreach { r =>
      var j = 0
      while (j < Dim) {
        s(j) += r(j)
        var k = 0
        while (k < Dim) { m(j)(k) += r(j) * r(k); k += 1 }
        j += 1
      }
    }
    (s, m, rows.length.toLong)
  }

  private def rayleigh(sArr: Array[Long], mArr: Array[Array[Long]],
                       n: Long, v: Array[Double]): Double = {
    val nD = n.toDouble
    val cv = Array.tabulate(Dim) { j =>
      var acc = 0.0
      var k = 0
      while (k < Dim) {
        acc += (mArr(j)(k).toDouble -
          sArr(j).toDouble * sArr(k).toDouble / nD) * v(k)
        k += 1
      }
      acc
    }
    var num = 0.0
    var den = 0.0
    var j = 0
    while (j < Dim) { num += v(j) * cv(j); den += v(j) * v(j); j += 1 }
    num / den
  }

  test("planted dominant axis is recovered with unit norm") {
    // variance 100x larger along axis 3 than anywhere else
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      val r = Array.tabulate(Dim)(_ => (rnd.nextInt(21) - 10).toLong)
      r(3) = (rnd.nextInt(2001) - 1000).toLong
      r
    }
    val (s, m, n) = momentsOf(rows)
    val v = Pca.topComponent(s, m, n)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    assert(math.abs(v(3)) > 0.99,
      s"dominant axis weight ${v(3)} — iteration failed to converge")
  }

  test("power iteration is deterministic and Rayleigh-monotone") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 100).map { _ =>
      Array.tabulate(Dim)(j => (rnd.nextInt(2 * j + 3) - j).toLong)
    }
    val (s, m, n) = momentsOf(rows)
    val a = Pca.topComponent(s, m, n)
    val b = Pca.topComponent(s, m, n)
    assert(a.toSeq == b.toSeq)
    // the converged vector's Rayleigh quotient dominates the start's
    val v0 = Array.fill(Dim)(0.125)
    assert(rayleigh(s, m, n, a) >= rayleigh(s, m, n, v0) - 1e-9)
  }

  test("projection output is one row per vector, deterministic") {
    val p1 = Pca.pcaProject(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val p2 = Pca.pcaProject(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(p1.toSeq == p2.toSeq)
    assert(p1.length == Tables.embeddings(spark, sf).count())
    // centered projection: mean is ~0 (exact up to 4dp rounding)
    val mean = p1.map(_._2).sum / p1.length
    assert(math.abs(mean) < 0.01)
  }

  test("variance report: dominant component is a valid share of trace") {
    val r = Pca.pcaVariance(spark, sf).collect()
    assert(r.length == 1)
    val (l1, tot, ratio) =
      (r(0).getDouble(0), r(0).getDouble(1), r(0).getDouble(2))
    assert(l1 > 0.0 && tot > 0.0)
    assert(l1 <= tot + 1e-9, s"lambda1 $l1 exceeds trace $tot")
    assert(ratio > 0.0 && ratio <= 1.0)
    // the dominant axis explains at least an average axis's share
    assert(ratio >= 1.0 / 64.0 - 1e-9)
  }

  test("deflated second component: near-orthogonal to v1, planted " +
    "secondary axis recovered, Rayleigh below lambda1") {
    // variance ordered: axis 3 >> axis 7 >> noise
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { _ =>
      val r = Array.tabulate(Dim)(_ => (rnd.nextInt(21) - 10).toLong)
      r(3) = (rnd.nextInt(4001) - 2000).toLong
      r(7) = (rnd.nextInt(1001) - 500).toLong
      r
    }
    val (s, m, n) = momentsOf(rows)
    val v1 = Pca.topComponent(s, m, n)
    val v2 = Pca.secondComponent(s, m, n, v1)
    // unit norm
    assert(math.abs(v2.map(x => x * x).sum - 1.0) < 1e-9)
    // near-orthogonality (3 power iterations, not exact eigensolve)
    val dot = v1.zip(v2).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 0.05, s"v2 not orthogonal to v1: $dot")
    // the planted secondary axis dominates v2
    val big = v2.zipWithIndex.maxBy { case (x, _) => math.abs(x) }._2
    assert(big == 7, s"expected axis 7 to dominate v2, got $big")
    // spectral ordering holds
    assert(rayleigh(s, m, n, v2) <= rayleigh(s, m, n, v1) + 1e-6)
  }
}
