package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  test("IVF ANN returns at most topK deterministic results per query") {
    val out = Similarity.ivfAnn(spark, sf0001, nCentroids = 8, nProbe = 2, topK = 3)
      .select("q_id", "c_id", "cos_sim", "rk")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    val perQuery = out.groupBy(_._1)
    perQuery.foreach { case (q, rows) =>
      assert(rows.length <= 3, s"query $q returned ${rows.length} rows")
      assert(rows.map(_._4).sorted.sameElements(1L to rows.length), s"ranks not dense for $q")
      // candidates only from the corpus side
      assert(rows.forall(_._2 >= 10))
    }
    // seeded k-means + deterministic rerank → identical on re-run
    val again = Similarity.ivfAnn(spark, sf0001, nCentroids = 8, nProbe = 2, topK = 3)
      .select("q_id", "c_id", "cos_sim", "rk")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.toSet === again.toSet)
  }

  test("IVF ANN results are a subset-quality approximation of brute force") {
    // every IVF hit's cosine must not exceed the brute-force best (sanity:
    // reranking is exact so scores are true cosines)
    val ivf = Similarity.ivfAnn(spark, sf0001, nCentroids = 8, nProbe = 8, topK = 1)
      .select("q_id", "cos_sim").as[(Long, Double)].collect().toMap
    // nProbe == nCentroids probes everything → exact top-1
    val exact = SparkEntry.queries("sim1_bruteforce_topk")(spark, sf0001)
      .filter($"rk" === 1L).select("q_id", "cos_sim")
      .as[(Long, Double)].collect().toMap
    ivf.foreach { case (q, c) =>
      assert(math.abs(c - exact(q)) < 1e-9,
        s"full-probe IVF should equal brute force for query $q: $c vs ${exact(q)}")
    }
  }
}
