package graft

import graft.operators.Graph

/** R107: k-truss peel pinned against a sequential same-rule reference
  * on cascade fixtures. */
class KTrussSpec extends SparkSpecBase {
  import spark.implicits._

  private def seqTruss(edges: Set[(Long, Long)], k: Int): Map[(Long, Long), Long] = {
    var e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
    var changed = true
    var sup = Map.empty[(Long, Long), Long]
    while (changed) {
      val adj = (e.toSeq ++ e.toSeq.map(_.swap)).groupBy(_._1)
        .map { case (kk, vs) => kk -> vs.map(_._2).toSet }
      sup = e.map { case (a, b) =>
        (a, b) -> (adj(a) & adj(b)).size.toLong }.toMap
      val kept = e.filter(x => sup(x) >= k - 2)
      changed = kept.size != e.size
      e = kept
    }
    e.map(x => x -> sup(x)).toMap
  }

  private def run(edges: Set[(Long, Long)], k: Int): Map[(Long, Long), Long] =
    Graph.kTruss(edges.toSeq.toDF("src", "dst"), k).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def clique(ids: Seq[Long]): Set[(Long, Long)] =
    (for (a <- ids; b <- ids if a < b) yield (a, b)).toSet

  test("K5: every edge survives the 5-truss (support 3), none the 6-truss") {
    val k5 = clique(0L to 4L)
    val got = run(k5, 5)
    assert(got.keySet === k5)
    assert(got.values.toSet === Set(3L))
    assert(run(k5, 6).isEmpty)
    assert(got === seqTruss(k5, 5))
  }

  test("two triangles sharing an edge: 4-truss cascade empties the graph") {
    // the shared edge has support 2, but removing the single-triangle
    // edges drops it below threshold — the cascade k-core cannot see
    val edges = clique(Seq(0L, 1, 2)) ++ clique(Seq(1L, 2, 3))
    assert(run(edges, 3) === seqTruss(edges, 3)) // both triangles stand
    assert(run(edges, 3).keySet === edges)
    assert(run(edges, 4).isEmpty)
    assert(seqTruss(edges, 4).isEmpty)
  }

  test("clique + pendant chain: the chain peels, the clique stays") {
    val edges = clique(0L to 3L) ++ Set((3L, 10L), (10L, 11L))
    val got = run(edges, 4)
    assert(got === seqTruss(edges, 4))
    assert(got.keySet === clique(0L to 3L))
    assert(got.values.toSet === Set(2L))
  }

  test("gr20 catalog entry is deterministic across shuffle layouts") {
    val q = Graph.catalog.find(_.name == "gr20_ktruss").get
    val a = q.run(spark, sf0001).collect().map(_.toString).sorted
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    val b = try q.run(spark, sf0001).collect().map(_.toString).sorted
      finally spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert(a === b)
    assert(a.nonEmpty)
  }
}
