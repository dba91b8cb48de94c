package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Pins the eigensolve half of sim10/sim11 — everything the DuckDB
  * oracle cannot express: Jacobi correctness on a known matrix,
  * orthonormality + eigen residual on the real corpus covariance,
  * descending eigenvalues, projection variance ≡ eigenvalue, and
  * replay determinism of the projection.
  */
class PcaSpec extends SparkSpecBase {

  test("jacobiEigen solves a known 2x2 exactly, sign-fixed") {
    val (ev, w) = Similarity.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(ev(0) - 3.0) < 1e-12 && math.abs(ev(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(math.abs(w(0)(0) - r) < 1e-12 && math.abs(w(0)(1) - r) < 1e-12)
    // second vector sign-fixed: largest-|component| (first on tie) positive
    assert(math.abs(math.abs(w(1)(0)) - r) < 1e-12)
    assert(w(1)(if (math.abs(w(1)(0)) >= math.abs(w(1)(1))) 0 else 1) > 0)
  }

  private lazy val covMat: Array[Array[Double]] = {
    val rows = Similarity.covarianceMatrix(spark, sf0001)
      .select("dim_i", "dim_j", "cov").collect()
    val d = rows.iterator.map(_.getInt(1)).max + 1
    val m = Array.ofDim[Double](d, d)
    rows.foreach { r => m(r.getInt(0))(r.getInt(1)) = r.getDouble(2); m(r.getInt(1))(r.getInt(0)) = r.getDouble(2) }
    m
  }

  test("eigenpairs: orthonormal, descending, residual ‖Av−λv‖ tiny, trace preserved") {
    val d = covMat.length
    val (ev, w) = Similarity.jacobiEigen(covMat)
    assert(ev.zip(ev.tail).forall { case (a, b) => a >= b })
    for (i <- 0 until d; j <- i until d) {
      val dot = (0 until d).map(k => w(i)(k) * w(j)(k)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"w$i . w$j = $dot")
    }
    for (i <- 0 until math.min(d, 8)) {
      val av = (0 until d).map(r => (0 until d).map(c => covMat(r)(c) * w(i)(c)).sum)
      val res = math.sqrt((0 until d).map(r => math.pow(av(r) - ev(i) * w(i)(r), 2)).sum)
      assert(res < 1e-9, s"eigen residual $i = $res")
    }
    val trace = (0 until d).map(k => covMat(k)(k)).sum
    assert(math.abs(ev.sum - trace) < 1e-9 * math.max(1.0, math.abs(trace)))
  }

  test("projection variance matches the eigenvalue; pc1 carries the most variance") {
    val p = Similarity.pcaProject(spark, sf0001, 3)
      .select(col("pc1"), col("pc2"), col("pc3")).collect()
    val n = p.length.toDouble
    val (ev, _) = Similarity.jacobiEigen(covMat)
    for (c <- 0 until 3) {
      val xs = p.map(_.getDouble(c))
      val mean = xs.sum / n
      val v = xs.map(x => (x - mean) * (x - mean)).sum / n
      // covariance was fit on 1e-6-quantized values; the projection runs
      // on raw floats — agreement is to quantization noise, not exact
      assert(math.abs(v - ev(c)) < 1e-3 * math.max(1.0, ev(c)),
        s"var(pc${c + 1}) = $v vs λ = ${ev(c)}")
    }
    assert(ev(0) >= ev(1) && ev(1) >= ev(2))
  }

  test("projection is replay-deterministic") {
    val a = Similarity.pcaProject(spark, sf0001, 2).collect().map(_.toString)
    val b = Similarity.pcaProject(spark, sf0001, 2).collect().map(_.toString)
    assert(a.sameElements(b))
  }
}
