package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Pins R147's Borůvka minimum spanning forest (`gr26_mst` is rows-only:
  * the per-round argmin + contraction fixpoint has no SQL oracle) against
  * an independent sequential Kruskal on graphs where the MST is unique.
  */
class MstSpec extends SparkSpecBase {
  import spark.implicits._

  /** Sequential Kruskal with union-find — the reference implementation. */
  private def kruskal(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val out = Set.newBuilder[(Long, Long, Long)]
    for ((u, v, w) <- edges.sortBy { case (u, v, w) => (w, u, v) }) {
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) { parent(ru) = rv; out += ((u, v, w)) }
    }
    out.result()
  }

  private def mstOf(edges: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    Graph.mstBoruvka(edges.toDF("u", "v", "w"))
      .as[(Long, Long, Long)].collect().toSet

  test("matches Kruskal on a known small graph") {
    val edges = Seq[(Long, Long, Long)](
      (1, 2, 4), (1, 3, 1), (2, 3, 3), (2, 4, 7), (3, 4, 5), (4, 5, 2),
      (3, 5, 9))
    assert(mstOf(edges) === kruskal(edges))
    assert(mstOf(edges).size === 4) // n - 1 for one component of 5 nodes
  }

  test("matches Kruskal on a deterministic pseudo-random graph, and the forest spans") {
    // 40 nodes, ~120 edges, distinct hash weights (unique MST)
    val edges = (0 until 120).map { i =>
      val u = (i * 7 + 3) % 40L
      val v = (i * 13 + 11) % 40L
      (math.min(u, v), math.max(u, v), (u * 1000003 + v * 7919 + 1) % 99991 + 1)
    }.filter { case (u, v, _) => u != v }
      .groupBy { case (u, v, _) => (u, v) }.map(_._2.head).toSeq
    val got = mstOf(edges)
    val want = kruskal(edges)
    assert(got === want)
    // spanning-forest invariant: |MST| = nodes - components
    val nodes = edges.flatMap { case (u, v, _) => Seq(u, v) }.distinct
    val comps = operators.Dedup.connectedComponents(
        edges.toDF("u", "v", "w").select(col("u").as("id_a"), col("v").as("id_b")))
      .select("component").distinct().count()
    assert(got.size.toLong === nodes.size - comps)
  }

  test("disconnected graph yields a forest, one tree per component") {
    val edges = Seq[(Long, Long, Long)](
      (1, 2, 5), (2, 3, 2), (10, 11, 7), (11, 12, 1), (20, 21, 9))
    val got = mstOf(edges)
    assert(got === kruskal(edges))
    assert(got.size === 5) // every edge is a forest edge here
  }
}
