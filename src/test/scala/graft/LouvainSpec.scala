package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Pins [[Graph.louvainRefine]] (R103): the distributed synchronous
  * parity-gated move phase must equal a sequential reference of the
  * IDENTICAL rule, fix a seeded mis-assignment on the barbell graph,
  * improve exact modularity on the fixtures, and be layout-invariant.
  */
class LouvainSpec extends SparkSpecBase {

  // ---- sequential reference of the same synchronous parity rule ----

  private def seqLouvain(edges: Set[(Long, Long)], init: Map[Long, Long],
                         rounds: Int): Map[Long, Long] = {
    val adj: Map[Long, Set[Long]] = {
      val sym = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap))
      sym.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    }
    val deg: Map[Long, Long] = adj.map { case (k, vs) => k -> vs.size.toLong }
    val m2 = deg.values.sum
    var lab = init.filter { case (n, _) => adj.contains(n) }
    for (r <- 1 to rounds) {
      val sigma: Map[Long, Long] = lab.toSeq.groupBy(_._2)
        .map { case (c, ns) => c -> ns.map(x => deg(x._1)).sum }
      lab = lab.map { case (i, ci) =>
        val kic: Map[Long, Long] = adj(i).toSeq.groupBy(lab)
          .map { case (c, ns) => c -> ns.size.toLong }
        def g(c: Long): BigInt =
          BigInt(m2) * BigInt(kic.getOrElse(c, 0L)) -
            BigInt(deg(i)) * (sigma(c) - (if (c == ci) deg(i) else 0L))
        val cands = kic.keySet + ci
        val best = cands.toSeq.map(c => (c, g(c))).minBy { case (c, gv) => (-gv, c) }
        i -> (if ((i + r) % 2 == 0 && best._2 > g(ci)) best._1 else ci)
      }
    }
    lab
  }

  /** Exact modularity numerator Q·4m² = Σ_c (4m·e_c − d_c²). */
  private def q4m2(edges: Set[(Long, Long)], lab: Map[Long, Long]): BigInt = {
    val canon = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    val m = canon.size.toLong
    val deg = canon.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val eIn = canon.toSeq.filter(e => lab(e._1) == lab(e._2))
      .groupBy(e => lab(e._1)).map { case (c, es) => c -> es.size.toLong }
    val dC = deg.toSeq.groupBy { case (n, _) => lab(n) }
      .map { case (c, ds) => c -> ds.map(_._2).sum }
    dC.map { case (c, d) =>
      BigInt(4) * BigInt(m) * BigInt(eIn.getOrElse(c, 0L)) - BigInt(d) * BigInt(d) }.sum
  }

  private def run(edges: Set[(Long, Long)], init: Map[Long, Long],
                  rounds: Int): Map[Long, Long] = {
    import spark.implicits._
    val e = edges.toSeq.toDF("src", "dst")
    val i = init.toSeq.toDF("node", "c")
    Graph.louvainRefine(e, i, rounds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def clique(ids: Seq[Long]): Set[(Long, Long)] =
    (for (a <- ids; b <- ids if a < b) yield (a, b)).toSet

  // barbell: K4 {0..3} — bridge 3–4 — K4 {4..7}
  private val barbell = clique(Seq(0L, 1, 2, 3)) ++ clique(Seq(4L, 5, 6, 7)) + ((3L, 4L))

  test("distributed ≡ sequential reference on the barbell, from singletons") {
    val init = (0L to 7L).map(n => n -> n).toMap
    for (rounds <- Seq(1, 2, 3, 4)) {
      assert(run(barbell, init, rounds) === seqLouvain(barbell, init, rounds),
        s"rounds=$rounds")
    }
  }

  test("a node seeded on the wrong side of the bridge moves home") {
    // node 4 (right-clique member) mis-assigned to the left community
    val init = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L,
      4L -> 0L, 5L -> 9L, 6L -> 9L, 7L -> 9L)
    val got = run(barbell, init, rounds = 2)
    assert(got === seqLouvain(barbell, init, 2))
    assert(got(4L) === 9L, "mis-seeded node should rejoin its clique")
    assert(got.filterNot(_._1 == 4L) === init.filterNot(_._1 == 4L),
      "correctly-placed nodes must not churn")
    assert(q4m2(barbell, got) > q4m2(barbell, init))
  }

  test("refinement from singletons improves exact modularity on the barbell") {
    val init = (0L to 7L).map(n => n -> n).toMap
    val got = run(barbell, init, rounds = 4)
    assert(q4m2(barbell, got) > q4m2(barbell, init))
  }

  test("ring of triangles: sequential equality and per-triangle communities") {
    // three triangles {0,1,2} {10,11,12} {20,21,22} joined in a ring
    val edges = clique(Seq(0L, 1, 2)) ++ clique(Seq(10L, 11, 12)) ++
      clique(Seq(20L, 21, 22)) + ((2L, 10L)) + ((12L, 20L)) + ((22L, 0L))
    val init = edges.flatMap(e => Seq(e._1, e._2)).map(n => n -> n).toMap
    val got = run(edges, init, rounds = 6)
    assert(got === seqLouvain(edges, init, 6))
    // communities must refine INTO triangles, never across the ring links
    val byC = got.groupBy(_._2).values.map(_.keySet).toSet
    for (cs <- byC)
      assert(Set(Set(0L, 1, 2), Set(10L, 11, 12), Set(20L, 21, 22))
        .exists(t => cs.subsetOf(t)), s"community $cs spans triangles")
    assert(q4m2(edges, got) > q4m2(edges, init))
  }

  test("gr18 catalog entry is deterministic across shuffle layouts") {
    val q = Graph.catalog.find(_.name == "gr18_louvain").get
    val a = q.run(spark, sf0001).collect().map(_.toString).sorted
    spark.conf.set("spark.sql.shuffle.partitions", "3")
    val b = try q.run(spark, sf0001).collect().map(_.toString).sorted
      finally spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert(a === b)
  }
}
