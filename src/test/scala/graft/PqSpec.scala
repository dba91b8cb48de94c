package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** L32: product-quantization ANN. The load-bearing property is that the
  * approximate ADC stage only SELECTS candidates — the reported scores
  * are always exact cosine — so reranking every corpus vector
  * (overfetch ≥ corpus size) must reproduce brute force exactly, and the
  * default operating point must agree with itself across runs
  * (the ADC partial sums are integer-quantized precisely so the
  * candidate ranking cannot drift with partitioning).
  */
class PqSpec extends SparkSpecBase {

  private def corpusSize: Int =
    Similarity.prepared(spark, sf0001).filter(col("vec_id") >= 10).count().toInt

  test("PQ codes are dense in [0, ks) and m per vector") {
    val e = Similarity.prepared(spark, sf0001)
    val books = Similarity.trainPqCodebooks(e, m = 8, ks = 16, subDim = 8)
    assert(books.length === 8)
    assert(books.forall(_.length === 16))
    val codes = e.select(Similarity.pqCodes(col("v"), books, 8).as("codes"))
    val stats = codes.select(
      min(array_min(col("codes"))).as("lo"),
      max(array_max(col("codes"))).as("hi"),
      min(size(col("codes"))).as("n")).head()
    assert(stats.getAs[Int]("lo") >= 0)
    assert(stats.getAs[Int]("hi") < 16)
    assert(stats.getAs[Int]("n") === 8)
  }

  test("full overfetch ≡ brute force: exact rerank over all ADC candidates") {
    val full = Similarity.pqAnn(spark, sf0001, overfetch = corpusSize, topK = 3)
      .collect().map(_.toSeq)
    val brute = SparkEntry.queries("sim1_bruteforce_topk")(spark, sf0001)
      .filter(col("rk") <= 3)
      .collect().map(_.toSeq)
    assert(full.toSeq === brute.toSeq)
  }

  test("IVF-PQ: full probe + full overfetch ≡ brute force; default point deterministic") {
    // with every list probed and every candidate reranked, the residual
    // ADC stage only ORDERS candidates — exact rerank must reproduce
    // brute force bit-for-bit
    val full = Similarity.ivfPqAnn(spark, sf0001,
      nCentroids = 8, nProbe = 8, overfetch = corpusSize, topK = 3)
      .collect().map(_.toSeq)
    val brute = SparkEntry.queries("sim1_bruteforce_topk")(spark, sf0001)
      .filter(col("rk") <= 3).collect().map(_.toSeq)
    assert(full.toSeq === brute.toSeq)
    val a = SparkEntry.queries("sim8_ivfpq_ann")(spark, sf0001).collect().map(_.toSeq)
    val b = SparkEntry.queries("sim8_ivfpq_ann")(spark, sf0001).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq && a.nonEmpty)
  }

  test("default operating point is deterministic across runs") {
    val a = SparkEntry.queries("sim7_pq_ann")(spark, sf0001).collect().map(_.toSeq)
    val b = SparkEntry.queries("sim7_pq_ann")(spark, sf0001).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
    // every query returns exactly topK rows ranked 1..k
    val byQ = a.groupBy(_.head)
    assert(byQ.values.forall(_.length === 3))
  }
}
