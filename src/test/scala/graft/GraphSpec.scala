package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** R36b: fixed-point PageRank. The distributed result must match an
  * independent driver-side reference that uses the SAME integer
  * arithmetic — exact equality, no tolerance, which is the point of the
  * fixed-point formulation (bit-identical across partitionings).
  */
class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Reference PageRank with identical long arithmetic, sequential. */
  private def reference(edges: Seq[(Long, Long)], nIter: Int,
                        dampingPpm: Long = 850000L): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length
    val outDeg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> Scale / n).toMap
    (1 to nIter).foreach { _ =>
      val dangling = nodes.filterNot(outDeg.contains).map(r).sum
      val inflow = e.groupBy(_._2).view.mapValues(
        _.map { case (s, _) => r(s) / outDeg(s) }.sum).toMap
      val base = (Scale * (1000000L - dampingPpm) / 1000000L) / n
      val share = dangling / n
      r = nodes.map(v => v ->
        (base + (dampingPpm * (inflow.getOrElse(v, 0L) + share)) / 1000000L)).toMap
    }
    r
  }

  test("pageRank matches the sequential fixed-point reference exactly (incl. dangling mass)") {
    // hub-and-spoke + a chain + a DANGLING sink (4 has no out-edges)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (2L, 3L),
      (3L, 4L), (1L, 4L))
    val got = Graph.pageRank(edges.toDF("src", "dst"), nIter = 10)
      .as[(Long, Long)].collect().toMap
    val want = reference(edges, nIter = 10)
    assert(got === want, s"got $got, want $want")
    // sanity: hub 2 outranks leaf 1; everything got (1-d)/n at least
    assert(got(2L) > got(1L))
    assert(got.values.forall(_ >= (Scale * 150000L / 1000000L) / 5))
  }

  test("pageRank is bit-identical across partition layouts") {
    val edges = (0L until 200L).map(i => (i, (i * 7 + 13) % 200))
    val a = Graph.pageRank(edges.toDF("src", "dst").repartition(1), nIter = 6)
      .orderBy("node").as[(Long, Long)].collect()
    val b = Graph.pageRank(edges.toDF("src", "dst").repartition(13), nIter = 6)
      .orderBy("node").as[(Long, Long)].collect()
    assert(a.sameElements(b))
  }

  test("gr2 catalog entry yields a full ranking with deterministic order") {
    val out = SparkEntry.queries("gr2_pagerank")(spark, sf0001).collect()
    assert(out.length === 50)
    val ranks = out.map(_.getLong(1))
    assert(ranks.sameElements(ranks.sorted.reverse), "sorted by rank desc")
  }

  test("LPA separates two dense communities linked by one bridge") {
    // two 6-cliques (0-5, 10-15) + a single bridge 5–10: a connected
    // graph — CC would report ONE component — but two dense regions
    val clique = (base: Long) =>
      for (i <- 0L to 5L; j <- 0L to 5L if i < j) yield (base + i, base + j)
    val edges = (clique(0L) ++ clique(10L) :+ (5L, 10L)).toDF("src", "dst")
    val out = Graph.labelPropagation(edges, nIter = 5)
      .as[(Long, Long)].collect().toMap
    val left = (0L to 5L).map(out)
    val right = (10L to 15L).map(out)
    assert(left.distinct.size === 1, s"left clique must agree on one label: $left")
    assert(right.distinct.size === 1, s"right clique must agree on one label: $right")
    assert(left.head !== right.head, "the bridge must not merge the communities")
  }

  test("LPA is bit-identical across partition layouts") {
    val edges = (0L until 300L).flatMap(i =>
      Seq((i, (i * 7 + 13) % 300), (i, (i * 3 + 5) % 300)))
    val a = Graph.labelPropagation(edges.toDF("src", "dst").repartition(1), nIter = 4)
      .orderBy("node").as[(Long, Long)].collect()
    val b = Graph.labelPropagation(edges.toDF("src", "dst").repartition(13), nIter = 4)
      .orderBy("node").as[(Long, Long)].collect()
    assert(a.sameElements(b))
  }

  test("kCore peels a pendant chain and keeps only the clique (cascading rounds)") {
    // 4-clique 0–3 + chain 3→4→5→6: node 4 starts at degree 2, but only
    // drops below 3 AFTER 5 and 6 peel — the fixpoint must cascade, a
    // single degree-filter pass would wrongly keep parts of the chain.
    val clique = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val chain = Seq((3L, 4L), (4L, 5L), (5L, 6L))
    val core = Graph.kCore((clique ++ chain).toDF("src", "dst"), k = 3)
      .as[(Long, Long)].collect().toMap
    assert(core === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      s"3-core must be exactly the clique at degree 3, got $core")
  }

  test("kCore returns empty when no subgraph survives, without iterating forever") {
    val chain = (0L until 10L).map(i => (i, i + 1))
    assert(Graph.kCore(chain.toDF("src", "dst"), k = 3).count() === 0L)
  }

  test("kCore peels a LONG path to empty (worst-case O(n) peel depth converges)") {
    // a bare path sheds only its two endpoints per round — the shape
    // that overruns a too-small round budget; with k=2 the true core is
    // empty and a non-fixpoint would leave interior nodes behind
    val path = (0L until 150L).map(i => (i, i + 1))
    assert(Graph.kCore(path.toDF("src", "dst"), k = 2).count() === 0L)
  }

  test("kCore fails LOUDLY when the round budget is too small (never a non-fixpoint)") {
    val path = (0L until 60L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      Graph.kCore(path.toDF("src", "dst"), k = 2, maxIter = 3).count()
    }
  }

  test("kCore is bit-identical across partition layouts") {
    val edges = (0L until 200L).flatMap(i =>
      Seq((i, (i * 7 + 13) % 200), (i, (i * 3 + 5) % 200), (i, (i * 11 + 2) % 200)))
    val a = Graph.kCore(edges.toDF("src", "dst").repartition(1), k = 3)
      .orderBy("node").as[(Long, Long)].collect()
    val b = Graph.kCore(edges.toDF("src", "dst").repartition(13), k = 3)
      .orderBy("node").as[(Long, Long)].collect()
    assert(a.sameElements(b))
    assert(a.nonEmpty, "degenerate fixture: functional graph lost its 3-core")
  }

  /** Reference HITS with identical BigInt fixed-point arithmetic:
    * max-normalized to 1e9 units, auth from hub then hub from the NEW
    * auth, integral (floor) division — the exact algebra of
    * [[Graph.hits]], sequential.
    */
  private def hitsReference(edges: Seq[(Long, Long)],
                            nIter: Int): Map[Long, (Long, Long)] = {
    val HScale = BigInt(1000000000L)
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    var hub = nodes.map(_ -> HScale).toMap
    var auth = hub
    def normalize(raw: Map[Long, BigInt]): Map[Long, BigInt] = {
      val mx = raw.values.max
      nodes.map(v => v -> raw.getOrElse(v, BigInt(0)) * HScale / mx).toMap
    }
    (1 to nIter).foreach { _ =>
      auth = normalize(e.groupBy(_._2).view.mapValues(_.map(p => hub(p._1)).sum).toMap)
      hub = normalize(e.groupBy(_._1).view.mapValues(_.map(p => auth(p._2)).sum).toMap)
    }
    nodes.map(v => v -> (auth(v).toLong, hub(v).toLong)).toMap
  }

  test("hits matches the sequential BigInt reference exactly (pure hub, pure authority, dangling)") {
    // 0,1 are pure hubs into 2,3 (pure authorities); 4 points at 2 and
    // is pointed at by 3 (mixed); 5 is a disconnected self-contained pair
    val edges = Seq((0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (4L, 2L),
      (3L, 4L), (5L, 6L), (6L, 5L))
    val got = Graph.hits(edges.toDF("src", "dst"), nIter = 8)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val want = hitsReference(edges, nIter = 8)
    assert(got === want, s"got $got, want $want")
    // structure: 2 is the top authority (3 in-links from hubs), 0/1 top hubs
    assert(got(2L)._1 === 1000000000L)
    assert(got(0L)._2 === 1000000000L && got(1L)._2 === 1000000000L)
    assert(got(2L)._2 === 0L, "pure authority has zero hub score")
  }

  test("hits is bit-identical across partition layouts") {
    val edges = (0L until 200L).flatMap(i =>
      Seq((i, (i * 7 + 13) % 200), (i, (i * 3 + 5) % 200)))
    val a = Graph.hits(edges.toDF("src", "dst").repartition(1), nIter = 5)
      .orderBy("node").as[(Long, Long, Long)].collect()
    val b = Graph.hits(edges.toDF("src", "dst").repartition(13), nIter = 5)
      .orderBy("node").as[(Long, Long, Long)].collect()
    assert(a.sameElements(b))
  }

  // R36c — Spark's NATIVE recursive CTE (UnionLoop) must agree with the
  // iterative frontier-expansion bfs on the same graph: for each seed,
  // (reached count, Σ min-dist) within 6 hops. Two independent
  // executions of the recursion — declarative engine loop vs driver
  // loop — pinned equal.
  test("native recursive CTE agrees with the iterative bfs per seed") {
    val sqlRows = Views.sql(spark, sf0001, Graph.recursiveCteSql)
      .as[(Long, Long, Long)].collect().toSeq
    val docs = Tables.documents(spark, sf0001).select(col("doc_id"))
    val n = docs.count()
    val edges = docs.select(col("doc_id").as("src"),
      ((col("doc_id") * 7 + 13) % n).as("dst"))
    val fromBfs = (0L until 8L).map { seed =>
      val r = Graph.bfs(edges, Seq(seed).toDF("node"), maxHops = 6)
        .agg(count(lit(1)), sum(col("dist")))
        .as[(Long, Long)].head()
      (seed, r._1, r._2)
    }
    assert(sqlRows === fromBfs)
  }

  test("personalized PageRank with seeds = all nodes IS pageRank, bit for bit") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 2L), (5L, 1L))
      .toDF("src", "dst")
    val allNodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("node")
    val pr = Graph.pageRank(edges, nIter = 8)
      .as[(Long, Long)].collect().sorted.toSeq
    val ppr = Graph.personalizedPageRank(edges, allNodes, nIter = 8)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(ppr === pr)
  }

  test("personalized PageRank holds EXACTLY zero outside the seed component") {
    // two disconnected cycles; seeds live only in the first
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L), (11L, 10L))
      .toDF("src", "dst")
    val r = Graph.personalizedPageRank(edges, Seq(1L).toDF("node"), nIter = 8)
      .as[(Long, Long)].collect().toMap
    assert(r(10L) === 0L && r(11L) === 0L)
    assert(r(1L) > 0L && r(2L) > 0L)
    // mass is conserved up to documented floor losses (< nIter·|E| units)
    assert(r.values.sum <= Scale)
    assert(r.values.sum > Scale - 8L * 4L - 8L)
  }

  test("personalized PageRank concentrates rank near the seed") {
    // star: hub 0 ↔ leaves 1..6; seed = one leaf — the seed must outrank
    // every other leaf (it alone receives teleport mass)
    val edges = (1L to 6L).flatMap(l => Seq((0L, l), (l, 0L))).toDF("src", "dst")
    val r = Graph.personalizedPageRank(edges, Seq(1L).toDF("node"), nIter = 12)
      .as[(Long, Long)].collect().toMap
    assert((2L to 6L).forall(l => r(1L) > r(l)),
      s"seed leaf must outrank non-seed leaves: $r")
  }

  test("personalizedPageRank refuses seeds absent from the graph") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val ex = intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(edges, Seq(99L).toDF("node"))
    }
    assert(ex.getMessage.contains("no seed"))
  }

  test("off-graph seeds are dropped: mixed seed set equals the on-graph subset") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val mixed = Graph.personalizedPageRank(edges, Seq(1L, 99L).toDF("node"), nIter = 6)
      .as[(Long, Long)].collect().sorted.toSeq
    val clean = Graph.personalizedPageRank(edges, Seq(1L).toDF("node"), nIter = 6)
      .as[(Long, Long)].collect().sorted.toSeq
    assert(mixed === clean)
  }

  // ---------------------------------------------------- R105 harmonic

  private def harmonicRef(edges: Seq[(Long, Long)], pivots: Seq[Long],
                          bound: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(_.swap)).filter(e => e._1 != e._2)
      .distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val acc = scala.collection.mutable.Map.empty[Long, Long]
    for (s <- pivots.distinct if adj.contains(s)) {
      var frontier = Set(s); var seen = Set(s); var d = 0
      while (frontier.nonEmpty && d < bound) {
        d += 1
        val next = frontier.flatMap(v => adj.getOrElse(v, Set.empty)) -- seen
        for (v <- next) acc(v) = acc.getOrElse(v, 0L) + 1000000000L / d
        seen ++= next; frontier = next
      }
    }
    acc.toMap
  }

  test("harmonic: star and path analytic values, full run equals sequential BFS") {
    // star: center 0, leaves 1..6; pivots = all
    val star = (1L to 6L).map(l => (0L, l))
    val nodes = 0L to 6L
    val got = Graph.harmonic(star.toDF("src", "dst"),
        nodes.toDF("node"), maxDepth = 8)
      .as[(Long, Long)].collect().toMap
    // center: 6 pivots at distance 1 → 6e9; each leaf: center at 1,
    // five peers at 2 → 1e9 + 5·5e8
    assert(got(0L) === 6L * 1000000000L)
    for (l <- 1L to 6L) assert(got(l) === 1000000000L + 5L * 500000000L)
    assert(got === harmonicRef(star, nodes, bound = 8))
    // path 0-1-2-3-4: integral DIV terms (1e9/3 truncates)
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val pn = 0L to 4L
    val gotP = Graph.harmonic(path.toDF("src", "dst"),
        pn.toDF("node"), maxDepth = 8)
      .as[(Long, Long)].collect().toMap
    assert(gotP === harmonicRef(path, pn, bound = 8))
    assert(gotP(0L) === 1000000000L + 500000000L + 333333333L + 250000000L)
  }

  test("harmonic: truncation is hop-bounded semantics; budget overrun raises") {
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L))
    val trunc = Graph.harmonic(path.toDF("src", "dst"),
        Seq(0L).toDF("node"), maxDepth = 2, truncate = true)
      .as[(Long, Long)].collect().toMap
    assert(trunc === Map(1L -> 1000000000L, 2L -> 500000000L))
    val e = intercept[Exception](
      Graph.harmonic(path.toDF("src", "dst"), Seq(0L).toDF("node"),
        maxDepth = 2).collect())
    assert(e.getMessage.contains("still expanding"))
  }
}
