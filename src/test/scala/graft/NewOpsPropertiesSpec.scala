package graft

import graft.operators.{Corpus, Similarity}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property suites for the session's new operators: invariants that
  * must hold for ANY corpus/matrix, not just the synthetic tables —
  * the random-input counterpart of the oracle checks.
  */
class NewOpsPropertiesSpec extends SparkSpecBase {
  import spark.implicits._

  private def check(prop: Prop, trials: Int): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(trials), prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  // random corpora from a tiny vocabulary (maximizes accidental n-gram
  // repeats — the interesting regime for span coverage)
  private val corpusGen = for {
    nDocs <- Gen.choose(2, 10)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(4, 30)
      ws <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("dupSpanCoverage invariants on random low-vocab corpora") {
    check(Prop.forAll(corpusGen) { docs =>
      val out = Corpus.dupSpanCoverage(docs.toDF("doc_id", "text"), n = 3)
        .as[(Long, Long, Long, Long, Long)].collect()
      out.forall { case (_, nWords, dupN, covered, permille) =>
        covered >= 0 && covered <= nWords &&
          ((dupN == 0) == (covered == 0)) &&
          // a doc with any duplicated gram covers at least n words
          (dupN == 0 || covered >= 3) &&
          permille == covered * 1000 / nWords
      }
    }, trials = 12)
  }

  test("duplicating an entire doc drives both copies to full coverage") {
    check(Prop.forAll(corpusGen) { docs =>
      val withCopy = docs :+ (docs.length.toLong, docs.head._2)
      val out = Corpus.dupSpanCoverage(withCopy.toDF("doc_id", "text"), n = 3)
        .as[(Long, Long, Long, Long, Long)].collect()
        .map(r => r._1 -> r._5).toMap
      // the first doc and its verbatim copy must both read 1000 permille
      // (every gram of each occurs ≥2 times corpus-wide)
      val first = docs.head._1
      val copy = docs.length.toLong
      !out.contains(first) || (out(first) == 1000L && out(copy) == 1000L)
    }, trials = 12)
  }

  private val symMatGen = for {
    d <- Gen.choose(2, 8)
    cells <- Gen.listOfN(d * d, Gen.choose(-5.0, 5.0))
  } yield {
    val raw = cells.grouped(d).map(_.toArray).toArray
    // A + Aᵀ is symmetric
    Array.tabulate(d, d)((i, j) => raw(i)(j) + raw(j)(i))
  }

  test("jacobiEigen reconstructs random symmetric matrices from its eigenpairs") {
    check(Prop.forAll(symMatGen) { a =>
      val d = a.length
      val (ev, w) = Similarity.jacobiEigen(a)
      // A = Σ_k λ_k w_k w_kᵀ — reconstruct and compare elementwise
      val rec = Array.tabulate(d, d)((i, j) =>
        (0 until d).map(k => ev(k) * w(k)(i) * w(k)(j)).sum)
      val maxAbs = a.flatten.map(math.abs).max.max(1.0)
      (0 until d).forall(i => (i until d).forall(j =>
        math.abs(rec(i)(j) - a(i)(j)) < 1e-8 * maxAbs))
    }, trials = 20)
  }

  test("jacobiEigen eigenvalues are descending and trace-preserving") {
    check(Prop.forAll(symMatGen) { a =>
      val (ev, _) = Similarity.jacobiEigen(a)
      val trace = a.indices.map(i => a(i)(i)).sum
      ev.zip(ev.tail).forall { case (x, y) => x >= y } &&
        math.abs(ev.sum - trace) < 1e-8 * math.max(1.0, math.abs(trace))
    }, trials = 20)
  }
}
