package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** R81 — Brandes betweenness in exact 1e-9 fixed point. The distributed
  * result must equal a sequential reference applying the IDENTICAL
  * integral floors (the pageRank/hits spec shape), and the quantized
  * scores must match analytic betweenness on shapes where it is known.
  */
class BetweennessSpec extends SparkSpecBase {
  import spark.implicits._

  private val Scale = 1000000000L

  /** Sequential Brandes with the same σ (BigInt) and δ (long, floored
    * DIV at each term) arithmetic as the operator. Sources = pivots. */
  private def reference(edges: Seq[(Long, Long)],
                        pivots: Seq[Long]): Map[Long, Long] = {
    val e = edges.distinct.filter(t => t._1 != t._2)
    val adj = e.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val btw = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    pivots.foreach { s =>
      // BFS layers with path counts
      val dist = scala.collection.mutable.Map(s -> 0)
      val sigma = scala.collection.mutable.Map(s -> BigInt(1))
      var frontier = Seq(s)
      var d = 0
      val layers = scala.collection.mutable.ArrayBuffer(Seq(s))
      while (frontier.nonEmpty) {
        d += 1
        val next = scala.collection.mutable.LinkedHashMap.empty[Long, BigInt]
        frontier.foreach { v =>
          adj.getOrElse(v, Seq.empty).foreach { w =>
            // only undiscovered nodes are at distance d — same-layer and
            // backward edges are not shortest-path DAG edges
            if (!dist.contains(w)) next(w) = next.getOrElse(w, BigInt(0)) + sigma(v)
          }
        }
        next.foreach { case (w, sg) => dist(w) = d; sigma(w) = sg }
        frontier = next.keys.toSeq
        if (frontier.nonEmpty) layers += frontier
      }
      // backward: δ in e9 units with the same per-term floor
      val delta = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      (layers.size - 2 to 0 by -1).foreach { di =>
        layers(di).foreach { v =>
          var acc = 0L
          adj.getOrElse(v, Seq.empty).foreach { w =>
            if (dist.get(w).contains(di + 1))
              acc += ((sigma(v) * (BigInt(Scale) + delta(w))) / sigma(w)).toLong
          }
          delta(v) = acc
        }
      }
      layers.drop(1).flatten.foreach(v => btw(v) = btw(v) + delta(v))
    }
    // zero-score nodes compare equal via the callers' getOrElse(0)
    btw.toMap.filter(_._2 != 0L)
  }

  private def run(edges: Seq[(Long, Long)], pivots: Seq[Long]): Map[Long, Long] =
    Graph.betweenness(edges.toDF("src", "dst"), pivots.toDF("node"))
      .as[(Long, Long)].collect().toMap

  test("directed path: interior nodes broker everything downstream") {
    // 0→1→2→3→4, all nodes as pivots. δ floors are exact here (σ=1):
    // analytic directed betweenness of node v = (#sources left of v)·
    // (#targets right of v): 1·3, 2·2, 3·1 for nodes 1,2,3.
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val got = run(e, Seq(0L, 1L, 2L, 3L, 4L))
    assert(got(1L) === 3L * Scale)
    assert(got(2L) === 4L * Scale)
    assert(got(3L) === 3L * Scale)
    assert(got.getOrElse(0L, 0L) === 0L)
    assert(got(4L) === 0L)
  }

  test("star: the hub brokers every spoke pair") {
    // spokes ↔ hub 0: 1..4 each both ways; hub betweenness = 4·3 pairs
    val e = (1L to 4L).flatMap(i => Seq((0L, i), (i, 0L)))
    val got = run(e, (0L to 4L))
    assert(got(0L) === 12L * Scale)
    (1L to 4L).foreach(i => assert(got(i) === 0L))
  }

  test("diamond splits path counts through both middles") {
    // 0→{1,2}→3: σ(0→3)=2, each middle carries 1/2 → 0.5e9 each
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 3L))
    val got = run(e, Seq(0L))
    assert(got(1L) === Scale / 2)
    assert(got(2L) === Scale / 2)
    assert(got(3L) === 0L)
  }

  test("matches the sequential same-floor reference on a random graph") {
    val n = 60L
    val e = (0L until n).flatMap(i => Seq((i, (i * 7 + 13) % n), (i, (i * 3 + 5) % n)))
    val pivots = (0L until 12L).toSeq
    val got = run(e, pivots)
    val want = reference(e, pivots)
    // compare on the union support; absent = 0
    val keys = got.keySet ++ want.keySet
    keys.foreach { k =>
      assert(got.getOrElse(k, 0L) === want.getOrElse(k, 0L), s"node $k")
    }
  }

  test("betweenness is bit-identical across partition layouts") {
    val n = 80L
    val e = (0L until n).flatMap(i => Seq((i, (i * 7 + 13) % n), (i, (i * 3 + 5) % n)))
    val piv = (0L until 10L).toSeq
    val a = Graph.betweenness(e.toDF("src", "dst").repartition(1), piv.toDF("node"))
      .orderBy("node").as[(Long, Long)].collect()
    val b = Graph.betweenness(e.toDF("src", "dst").repartition(13), piv.toDF("node"))
      .orderBy("node").as[(Long, Long)].collect()
    assert(a.sameElements(b))
  }
}
