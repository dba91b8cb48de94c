package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph traversal — recursive-query semantics (WITH RECURSIVE)
  * expressed as a frontier-expansion loop of hash joins. Like
  * [[Dedup.connectedComponents]], the driver loop iterates HOPS, never
  * rows, and each round localCheckpoints to keep plan depth constant.
  * Spark 4 additionally executes UNION ALL recursive CTEs natively
  * (UnionLoop) — `gr13_recursive_cte` runs the SAME statement text on
  * both engines; the iterative forms remain the scale path (UNION-dedup
  * recursion, per-round convergence checks, lineage truncation).
  */
object Graph {

  /** Multi-source BFS: minimum hop distance from any seed, up to
    * `maxHops`. `edges` = (src, dst) directed; `seeds` = (node).
    * One shuffle join per hop; frontier shrinks as nodes settle.
    */
  def bfs(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    // null endpoints would defeat the anti-join dedup (=== never matches
    // NULL) and re-enter forever — drop them up front
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .transform(graft.plans.Lineage.truncate)
    val levels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var frontier = seeds.select(col("node")).filter(col("node").isNotNull)
      .distinct().withColumn("dist", lit(0L)).transform(graft.plans.Lineage.truncate)
    levels += frontier
    // seen-set as a plain union of the (few, checkpointed) levels: plan
    // depth stays O(hops) and each node is stored exactly once — no
    // per-hop recopy of the accumulated set
    def seen: DataFrame = levels.reduce(_ union _)
    var hop = 0
    while (hop < maxHops && frontier.limit(1).count() > 0) {
      hop += 1
      val next = e.join(frontier.withColumnRenamed("node", "src").drop("dist"), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(seen.select(col("node").as("seenNode")),
          col("node") === col("seenNode"), "left_anti")
        .withColumn("dist", lit(hop.toLong))
        .transform(graft.plans.Lineage.truncate)
      levels += next
      frontier = next
    }
    // Note: Dataset.unpersist is a no-op for localCheckpoint'd frames
    // (their blocks live at the RDD layer, not the CacheManager); the
    // level/edge blocks are reclaimed by the ContextCleaner once these
    // local references drop out of scope.
    levels.reduce(_ union _).transform(graft.plans.Lineage.truncate)
  }

  /** PageRank in FIXED-POINT integer arithmetic: ranks are longs in
    * units of 1e-12 (`Scale`), contributions use exact integral `DIV`,
    * and every per-node inflow is a sum of longs — order-independent, so
    * results are bit-identical across partition counts and retries
    * (float-sum PageRank is not, and would fail the determinism audit
    * every other catalog query passes). Floor losses shrink total mass
    * by < nIter·|E| units of 1e-12 — irrelevant for ranking.
    *
    * Shape per iteration: one hash-join shuffle (ranks ⨝ edges on src) +
    * one aggregation on dst; dangling mass (nodes without out-edges) is
    * a 1-row aggregate redistributed uniformly; `localCheckpoint` keeps
    * plan depth constant like [[bfs]]. Driver loop iterates ITERATIONS,
    * never rows.
    */
  def pageRank(edges: DataFrame, nIter: Int = 8,
               dampingPpm: Long = 850000L): DataFrame = {
    val Scale = 1000000000000L
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().transform(graft.plans.Lineage.truncate)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().transform(graft.plans.Lineage.truncate)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph (no non-null edges)")
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .transform(graft.plans.Lineage.truncate)
    var ranks = nodes.withColumn("r", lit(Scale / n)).transform(graft.plans.Lineage.truncate)
    (1 to nIter).foreach { _ =>
      val withDeg = ranks.join(outDeg, Seq("node"), "left")
      val dangling = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(col("r")), lit(0L)).as("s"))
        .head().getLong(0)
      val contribs = e
        .join(withDeg.filter(col("deg").isNotNull)
          .select(col("node").as("src"), col("r"), col("deg")), Seq("src"))
        .select(col("dst").as("node"), expr("r DIV deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      val base = (Scale * (1000000L - dampingPpm) / 1000000L) / n
      val danglingShare = dangling / n
      // `/` on long Columns is DOUBLE division in Spark SQL — the
      // integral `DIV` operator keeps the whole update in exact longs
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          expr(s"${base}L + ($dampingPpm" + "L * (coalesce(inflow, 0L) + " +
            s"${danglingShare}L)) DIV 1000000L").as("r"))
        .transform(graft.plans.Lineage.truncate)
    }
    ranks.withColumnRenamed("r", "rank_e12")
  }

  /** Personalized PageRank: teleport (and dangling mass) flow to the
    * SEED set only, so rank concentrates around the seeds — the
    * seed-expansion primitive ("find more like the curated set")
    * behind gr17. Same exact fixed-point integer algebra as
    * [[pageRank]]: with seeds = all nodes the two are identical BIT FOR
    * BIT (spec'd), because base and dangling shares then divide by the
    * same n. Nodes outside the seed component provably hold rank 0 —
    * integer arithmetic makes that an exact statement, not an epsilon
    * one. Seeds are a bounded curated set → broadcast join; per
    * iteration the shuffle shape is pageRank's (edges ⨝ ranks + one
    * dst aggregation).
    *
    * Seed semantics: seeds are intersected with the graph's nodes —
    * a seed with no edges cannot receive or route mass, so off-graph
    * seeds are DROPPED (spec-pinned; gr17 relies on it: curated docs
    * that never matched a similarity pair simply don't anchor mass).
    * Only the degenerate all-seeds-off-graph case refuses loudly.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, nIter: Int = 8,
                           dampingPpm: Long = 850000L): DataFrame = {
    val Scale = 1000000000000L
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().transform(graft.plans.Lineage.truncate)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().transform(graft.plans.Lineage.truncate)
    val sd = seeds.select(col("node")).distinct()
      .join(nodes, Seq("node")) // seeds constrained to graph nodes
      .transform(graft.plans.Lineage.truncate)
    val nSeeds = sd.count()
    require(nSeeds > 0, "personalizedPageRank: no seed is a graph node")
    val isSeed = sd.withColumn("seed", lit(true))
    val outDeg = e.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
      .transform(graft.plans.Lineage.truncate)
    // all teleport mass starts (and stays anchored) at the seeds
    var ranks = nodes.join(broadcast(isSeed), Seq("node"), "left")
      .withColumn("r", when(col("seed"), lit(Scale / nSeeds)).otherwise(lit(0L)))
      .select("node", "r").transform(graft.plans.Lineage.truncate)
    (1 to nIter).foreach { _ =>
      val withDeg = ranks.join(outDeg, Seq("node"), "left")
      val dangling = withDeg.filter(col("deg").isNull)
        .agg(coalesce(sum(col("r")), lit(0L)).as("s"))
        .head().getLong(0)
      val contribs = e
        .join(withDeg.filter(col("deg").isNotNull)
          .select(col("node").as("src"), col("r"), col("deg")), Seq("src"))
        .select(col("dst").as("node"), expr("r DIV deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("inflow"))
      val base = (Scale * (1000000L - dampingPpm) / 1000000L) / nSeeds
      val danglingShare = dangling / nSeeds
      // seeds get base + the one-division damped (inflow + dangling)
      // term — the EXACT expression pageRank uses, so seeds = all nodes
      // reproduces pageRank bit for bit; non-seeds damp inflow only
      ranks = nodes.join(contribs, Seq("node"), "left")
        .join(broadcast(isSeed), Seq("node"), "left")
        .select(col("node"),
          when(col("seed"),
            expr(s"${base}L + ($dampingPpm" + "L * (coalesce(inflow, 0L) + " +
              s"${danglingShare}L)) DIV 1000000L"))
            .otherwise(
              expr(s"($dampingPpm" + "L * coalesce(inflow, 0L)) DIV 1000000L"))
            .as("r"))
        .transform(graft.plans.Lineage.truncate)
    }
    ranks.withColumnRenamed("r", "rank_e12")
  }

  /** HITS hubs & authorities (Kleinberg) in exact fixed-point integers:
    * authority = Σ hub over in-edges, hub = Σ authority over out-edges,
    * each vector max-normalized to `Scale` units per iteration with
    * integral division — like [[pageRank]], float-free so scores are
    * bit-identical across partitionings/retries. Max-normalization (vs
    * the textbook L2) keeps the update in integer algebra; the ranking
    * it induces is the same fixpoint ranking.
    *
    * Shape per iteration: two join+agg shuffles (edges ⨝ scores on one
    * endpoint, aggregated on the other) and two 1-row max aggregates
    * re-entering as broadcast scalars; frames stay node-sized and
    * localCheckpoint'd, the driver loop iterates ITERATIONS, never rows.
    */
  def hits(edges: DataFrame, nIter: Int = 8): DataFrame = {
    val Scale = 1000000000L
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct().transform(graft.plans.Lineage.truncate)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().transform(graft.plans.Lineage.truncate)
    require(!nodes.isEmpty, "hits: empty graph (no non-null edges)")
    // raw Σ then max-normalize: raw ≤ Scale·maxDegree fits a long; the
    // Scale·raw product goes through decimal(38,0) before the DIV
    def normalized(raw: DataFrame, scoreCol: String): DataFrame = {
      val mx = raw.agg(max(col(scoreCol)).as("mx"))
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(mx)) // 1-row scalar
        .select(col("node"),
          expr(s"CAST(coalesce($scoreCol, 0L) AS DECIMAL(38,0)) * ${Scale}L" +
            " DIV CAST(mx AS DECIMAL(38,0))").cast("long").as(scoreCol))
    }
    var hub = nodes.withColumn("hub", lit(Scale)).transform(graft.plans.Lineage.truncate)
    var auth = hub.select(col("node"), col("hub").as("auth"))
    (1 to nIter).foreach { _ =>
      val authRaw = e.join(hub.select(col("node").as("src"), col("hub")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum("hub").as("auth"))
      auth = normalized(authRaw, "auth").transform(graft.plans.Lineage.truncate)
      val hubRaw = e.join(auth.select(col("node").as("dst"), col("auth")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum("auth").as("hub"))
      hub = normalized(hubRaw, "hub").transform(graft.plans.Lineage.truncate)
    }
    auth.join(hub, Seq("node"))
      .select(col("node"), col("auth").as("auth_e9"), col("hub").as("hub_e9"))
  }

  /** Hop-bounded single-source shortest paths (Bellman–Ford relaxation):
    * after `rounds` iterations, `dist` holds the exact minimum-weight
    * path using ≤ `rounds` edges — which equals the min over all ≤rounds
    * walks, the form a recursive-CTE oracle can enumerate. INTEGER
    * weights, so distances are exact longs (no float-sum drift across
    * partitionings). One join+agg shuffle per round; the settled frame
    * is node-sized, localCheckpoint'd per round like [[bfs]]/[[pageRank]].
    * `edges` = (src, dst, w≥0). At 100 TB scale the same loop runs with
    * `dist` and `edges` co-partitioned on the join key; rounds — not
    * rows — drive the driver loop.
    */
  def shortestPaths(edges: DataFrame, source: Long, rounds: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .groupBy("src", "dst").agg(min("w").as("w")) // parallel edges: keep cheapest
      .transform(graft.plans.Lineage.truncate)
    var dist = e.sparkSession.range(1)
      .select(lit(source).as("node"), lit(0L).as("d"))
      .transform(graft.plans.Lineage.truncate)
    (1 to rounds).foreach { _ =>
      val relaxed = e
        .join(dist.select(col("node").as("src"), col("d")), Seq("src"))
        .select(col("dst").as("node"), (col("d") + col("w")).as("d"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min("d").as("d"))
        .transform(graft.plans.Lineage.truncate)
    }
    dist
  }

  /** Deterministic synchronous label propagation (community detection):
    * every node starts as its own label; each round a node adopts the
    * most frequent label among its undirected neighbors plus itself,
    * ties broken to the SMALLEST label — a total order, so the result is
    * a pure function of the graph (plain LPA's random tie-breaks and
    * asynchronous sweeps are not reproducible, which would fail the
    * repo-wide determinism audit). Complements [[Dedup]]'s connected
    * components: LPA splits a connected graph into DENSE regions, CC
    * only finds disconnected ones.
    *
    * Shape per round: one join shuffle (labels ⨝ edges on the neighbor
    * key) + one (node, label) count + one per-node argmax via min-struct
    * aggregation — all fixed-width; `localCheckpoint` pins plan depth
    * like [[bfs]]/[[pageRank]]. Driver loop iterates ROUNDS, never rows.
    */
  def labelPropagation(edges: DataFrame, nIter: Int = 5): DataFrame = {
    // undirected: each edge contributes both directions
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    val adj = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .transform(graft.plans.Lineage.truncate)
    val nodes = adj.select(col("src").as("node")).distinct()
    var labels = nodes.withColumn("lbl", col("node")).transform(graft.plans.Lineage.truncate)
    for (_ <- 0 until nIter) {
      val neighborVotes = adj
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .select(col("src").as("node"), col("lbl"))
      val votes = neighborVotes.union(labels.select(col("node"), col("lbl")))
        .groupBy("node", "lbl").agg(count(lit(1)).as("cnt"))
      labels = votes
        .groupBy("node")
        .agg(min(struct((-col("cnt")).as("neg"), col("lbl"))).as("best"))
        .select(col("node"), col("best.lbl").as("lbl"))
        .transform(graft.plans.Lineage.truncate)
    }
    labels
  }

  /** k-truss decomposition (edge analogue of [[kCore]]): repeatedly
    * delete edges supported by fewer than k−2 triangles until a fixed
    * point — the surviving subgraph is the k-truss, a strictly denser
    * community signal than k-core (every edge sits in ≥ k−2 triangles
    * of the SURVIVING graph, so cascades prune bridge edges k-core
    * keeps). Per round: one gr3-style two-join triangle enumeration
    * (u<v<w orientation, each triangle counted once, fan-out Σd(v)² —
    * never node×node) + a 3-way edge-support explode + one semi-join
    * prune; frames localCheckpoint'd. Rounds = peel depth; running out
    * of `maxIter` raises — never a silent non-fixpoint. Returns
    * surviving `(u, v, support)`. */
  def kTruss(edges: DataFrame, k: Int, maxIter: Int = 100): DataFrame = {
    require(k >= 3, s"kTruss: k must be >= 3, got $k")
    var e = edges
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct().transform(graft.plans.Lineage.truncate)
    var n = e.count()
    var it = 0
    var result: DataFrame = null
    while (result == null) {
      it += 1
      require(it <= maxIter,
        s"kTruss: still peeling after $maxIter rounds — raise maxIter")
      // triangles u<v<w: (u,v) ⨝ (v,w) ⨝ (u,w)
      val tri = e.as("ab")
        .join(e.select(col("u").as("v"), col("v").as("w")).as("bc"), Seq("v"))
        .join(e.select(col("u"), col("v").as("w")).as("ac"), Seq("u", "w"))
        .select(col("u"), col("v"), col("w"))
      val support = tri.select(
          explode(array(
            struct(col("u").as("a"), col("v").as("b")),
            struct(col("u").as("a"), col("w").as("b")),
            struct(col("v").as("a"), col("w").as("b")))).as("e"))
        .groupBy(col("e.a").as("u"), col("e.b").as("v"))
        .agg(count(lit(1)).as("support"))
      val kept = e.join(support, Seq("u", "v"), "left")
        .filter(coalesce(col("support"), lit(0L)) >= (k - 2).toLong)
        .transform(graft.plans.Lineage.truncate)
      val n2 = kept.select("u", "v").count()
      if (n2 == n) result = kept.select(col("u"), col("v"),
        coalesce(col("support"), lit(0L)).as("support"))
      else { e = kept.select("u", "v"); n = n2 } // kept is already pinned
    }
    result
  }

  /** Harmonic centrality from `sources` (k-pivot estimator; exact when
    * pivots = all nodes): H(v) = Σ_{s≠v} 1/d(s,v) over UNDIRECTED
    * shortest-path distances, held in 1e9 fixed point — each term is
    * the integral `1e9 DIV d`, so the accumulation is a long sum,
    * bit-identical across partitionings (float harmonic is not). The
    * closeness-family readout beside [[betweenness]]: closeness proper
    * is undefined on disconnected graphs, harmonic just drops the
    * unreachable terms — which is why it's the form that scales.
    *
    * Shape: multi-source frontier BFS keyed (s, v) — one join shuffle +
    * anti-join dedup per depth (layers are node×pivot bounded), then a
    * single per-node aggregate of `1e9 DIV depth`; `localCheckpoint`
    * pins plan depth per round. Driver loop iterates DEPTHS. A frontier
    * still expanding at `maxDepth` raises — never a silently truncated
    * centrality. */
  def harmonic(edges: DataFrame, sources: DataFrame,
               maxDepth: Int = 64, truncate: Boolean = false): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    val e = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().transform(graft.plans.Lineage.truncate)
    var frontier = sources.select(col("node")).filter(col("node").isNotNull)
      .distinct()
      .select(col("node").as("s"), col("node").as("v"))
      .transform(graft.plans.Lineage.truncate)
    var seen = frontier
    val terms = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var depth = 0
    while (frontier.limit(1).count() > 0 && depth < maxDepth) {
      depth += 1
      val next = e
        .join(frontier.select(col("s"), col("v").as("src")), Seq("src"))
        .select(col("s"), col("dst").as("v")).distinct()
        .join(seen, Seq("s", "v"), "left_anti")
        .transform(graft.plans.Lineage.truncate)
      terms += next.select(col("v"), lit(1000000000L / depth).as("h"))
      seen = seen.unionByName(next).transform(graft.plans.Lineage.truncate)
      frontier = next
    }
    // truncate=true is the HOP-BOUNDED variant (contributions only from
    // the ≤maxDepth neighborhood — a deliberate, documented semantic,
    // and the oracle-expressible one); truncate=false means maxDepth is
    // a budget and running out of it is an error, never silent.
    require(truncate || frontier.limit(1).count() == 0,
      s"harmonic: BFS still expanding at depth $maxDepth — raise maxDepth")
    if (terms.isEmpty)
      e.sparkSession.range(0).select(col("id").as("node"), col("id").as("harm_e9"))
    else terms.reduce(_ unionByName _)
      .groupBy(col("v").as("node")).agg(sum("h").as("harm_e9"))
  }

  /** Louvain-style modularity-greedy refinement (one node-move level)
    * over an initial community assignment — the quality upgrade on
    * [[labelPropagation]]'s frequency-greedy labels (LPA can glue two
    * dense regions a single frequent label leaks across; the modularity
    * gain test un-glues them).
    *
    * Each round, every ELIGIBLE node evaluates moving to each
    * neighboring community c with the standard gain comparison
    *   g(c) = 2m·k_{i,c} − k_i·Σtot'(c)        (Σtot' excludes i when
    * c is i's own community) and adopts the argmax iff it strictly
    * beats staying, ties to the SMALLEST community id. Determinism over
    * the canonical sequential Louvain (whose result depends on visit
    * order — irreproducible across partitionings): moves are SYNCHRONOUS
    * and gated by node/round PARITY ((node+round) % 2), which kills the
    * two-node swap oscillation synchronous updates are prone to; the
    * result is a pure function of the graph. The tradeoff is documented:
    * without a global visit order, per-round monotone modularity ascent
    * is not guaranteed in theory (concurrent same-parity moves interact
    * through Σtot), so LouvainSpec PINS the improvement on adversarial
    * fixtures instead of assuming it. Gains are EXACT — all-long inputs
    * with the products through decimal(38,0), so the argmax can't be
    * float-perturbed (2m·k and k_i·Σtot overflow long at lake-scale
    * edge counts).
    *
    * Shape per round: one join shuffle (adjacency ⨝ labels on the
    * neighbor key), one (node, community) count, one per-community
    * degree sum (|C|-sized, broadcast back), one per-node argmax —
    * all fixed-width; `localCheckpoint` pins plan depth like [[bfs]].
    * Driver loop iterates ROUNDS, never rows.
    */
  def louvainRefine(edges: DataFrame, initial: DataFrame,
                    rounds: Int = 4): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    val adj = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .transform(graft.plans.Lineage.truncate)
    val deg = adj.groupBy(col("src").as("node")).agg(count(lit(1)).as("ki"))
      .transform(graft.plans.Lineage.truncate)
    // 2m = Σ deg — every undirected edge counted in both directions
    val m2 = deg.agg(sum("ki")).head.getLong(0)
    var labels = initial.select(col("node"), col("c"))
      .join(deg.select("node"), Seq("node"), "left_semi") // graph nodes only
      .transform(graft.plans.Lineage.truncate)
    for (r <- 1 to rounds) {
      val sigma = labels.join(deg, Seq("node"))
        .groupBy("c").agg(sum("ki").as("sigma"))
      val kic = adj
        .join(labels.select(col("node").as("dst"), col("c")), Seq("dst"))
        .groupBy(col("src").as("node"), col("c"))
        .agg(count(lit(1)).as("kic"))
      // the stay option must exist even with zero in-community neighbors
      val cand = kic
        .unionByName(labels.select(col("node"), col("c"), lit(0L).as("kic")))
        .groupBy("node", "c").agg(sum("kic").as("kic"))
      val scored = cand
        .join(labels.select(col("node"), col("c").as("ci")), Seq("node"))
        .join(deg, Seq("node"))
        .join(broadcast(sigma), Seq("c"))
        .withColumn("g",
          lit(m2).cast("decimal(38,0)") * col("kic")
            - col("ki").cast("decimal(38,0)")
              * (col("sigma") - when(col("c") === col("ci"), col("ki"))
                  .otherwise(lit(0L))))
      val best = scored.groupBy("node")
        .agg(min(struct((col("g") * -1).as("neg"), col("c"))).as("best"),
          max(when(col("c") === col("ci"), col("g"))).as("gstay"),
          first("ci").as("ci"))
      labels = best.select(col("node"),
          when((col("node") + r) % 2 === 0 && col("best.neg") * -1 > col("gstay"),
            col("best.c")).otherwise(col("ci")).as("c"))
        .transform(graft.plans.Lineage.truncate)
    }
    labels
  }

  /** k-core decomposition (iterative peel): repeatedly delete nodes of
    * degree < k until none remain; survivors are the k-core — the
    * standard "dense region" prefilter before expensive per-cluster work
    * (community detection, pairwise dedup). `edges` = undirected pairs
    * (symmetrized + deduped here, callers pass either orientation).
    *
    * Shape per round: one degree aggregate (fixed-width (node, count)
    * shuffle) + two semi-joins that shrink the edge frame; the frame is
    * localCheckpoint'd so plan depth stays constant. Rounds equal the
    * PEEL DEPTH, which is usually tiny but is O(n) in the worst case (a
    * bare path peels two endpoints per round) — so non-convergence
    * within `maxIter` is a loud error, never a silent non-fixpoint that
    * would break the "every survivor has in-core degree ≥ k" contract.
    * The driver loop iterates ROUNDS, never rows — the per-round
    * `count()` is the convergence test, same license as [[bfs]] and
    * [[Dedup.connectedComponents]]. Returns `(node, core_degree)`.
    */
  def kCore(edges: DataFrame, k: Int, maxIter: Int = 200): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    val canon = edges
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"), greatest(col("src"), col("dst")).as("v"))
      .distinct()
    // both directions, so degree is one groupBy on the source column
    var sym = canon.select(col("u").as("a"), col("v").as("b"))
      .unionByName(canon.select(col("v").as("a"), col("u").as("b")))
      .transform(graft.plans.Lineage.truncate)
    var nEdges = sym.count()
    var it = 0
    var converged = nEdges == 0
    while (!converged && it < maxIter) {
      val keep = sym.groupBy("a").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("a")
      val pruned = sym
        .join(keep, Seq("a"), "left_semi")
        .join(keep.select(col("a").as("b")), Seq("b"), "left_semi")
        .select("a", "b")
        .transform(graft.plans.Lineage.truncate)
      val n2 = pruned.count()
      converged = n2 == nEdges
      nEdges = n2
      sym = pruned
      it += 1
    }
    require(converged,
      s"kCore: not converged after $maxIter rounds ($nEdges directed edges left) — " +
        "raise maxIter; returning a non-fixpoint would violate the degree->=k contract")
    sym.groupBy(col("a").as("node")).agg(count(lit(1)).as("core_degree"))
  }

  /** Strongly connected components (directed) by forward-backward
    * coloring — the standard data-parallel SCC (Orzan / FW-BW family;
    * Tarjan's stack walk is inherently sequential and cannot shard):
    *
    * per outer round, over the REMAINING graph:
    *  1. isolated nodes (no remaining edges) leave as singleton SCCs;
    *  2. color every node with its minimum ancestor id (min-label
    *     frontier propagation along edges to fixpoint — each inner step
    *     joins only the nodes that just improved, the bfs shape);
    *  3. a color whose root r (lab(r) = r) lies inside the class marks
    *     SCC(r) = nodes of color r that reach r backward WITHIN color r
    *     (members of one SCC share their whole ancestor closure, so the
    *     entire SCC carries one color, and every v→r path stays inside
    *     the SCC — the class-restricted backward reach is exactly the
    *     SCC, with r provably its minimum member);
    *  4. extracted SCCs leave the graph; everything else re-colors next
    *     round (its min ancestor is now gone).
    *
    * Every round extracts at least the SCC of the smallest remaining id
    * (its label is itself), so the loop terminates in ≤ #SCC outer
    * rounds — typically a handful on hash-shaped graphs, O(n) on an
    * adversarial chain, hence the loud `maxOuter` budget (the kCore
    * license: never a silent non-fixpoint). All frames stay node-sized,
    * localCheckpoint'd; min-aggregations over longs keep the result
    * bit-identical across partitionings. Returns `(node, scc_id)` with
    * `scc_id` = the component's minimum node id (canonical).
    */
  /** `unrollHops` (r7 judge item 7): number of min-label relaxations per
    * DRIVER ROUND in the inner coloring loop — hops 2..k ride the same
    * physical plan as hop 1 (join-chain), so one localCheckpoint + one
    * convergence check pays for k propagation steps. Semantics-neutral:
    * min-propagation is monotone and idempotent, so extra relaxations
    * past the fixpoint are no-ops and the fixpoint label frame is
    * identical for any k ≥ 1 (SccSpec pins 1 ≡ 2 ≡ 4). The win is
    * driver/job-launch overhead — exactly what multiplies on a 1000-
    * executor cluster. Measured A/B at sf0.1/local[32] (WarmBench,
    * warm-pass medians): unroll 1 → 11.1 s, 2 → 9.6 s (−13%), 4 →
    * 11.6 s (doubled-per-hop plan size eats the launch saving) — so
    * the default is 2 (PLANS.md r8).
    */
  def scc(edges: DataFrame, maxOuter: Int = 64, maxInner: Int = 256,
          unrollHops: Int = 2): DataFrame = {
    val e0 = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    // self-loops never change strong connectivity — drop them, but keep
    // their endpoints in the node universe (they may be otherwise isolated)
    var rem = e0.filter(col("src") =!= col("dst")).distinct().transform(graft.plans.Lineage.truncate)
    var nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().transform(graft.plans.Lineage.truncate)
    val done = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var outer = 0
    while (nodes.limit(1).count() > 0) {
      outer += 1
      require(outer <= maxOuter,
        s"scc: not converged after $maxOuter outer rounds — adversarial " +
          "SCC-chain depth; raise maxOuter rather than accept a partial labeling")
      // 1. singleton exits: nodes no remaining edge touches
      val touched = rem.select(col("src").as("node"))
        .union(rem.select(col("dst").as("node"))).distinct().transform(graft.plans.Lineage.truncate)
      val isolated = nodes.join(touched, Seq("node"), "left_anti")
        .select(col("node"), col("node").as("scc_id")).transform(graft.plans.Lineage.truncate)
      done += isolated
      nodes = touched
      if (nodes.limit(1).count() > 0) {
        // 2. min-ancestor coloring to fixpoint (frontier propagation);
        // `joined` is the one checkpoint per hop — `lab`/`improved` are
        // single-projection derivations of it, so lineage stays depth-1
        // without paying two extra materializations per round
        var lab = nodes.select(col("node"), col("node").as("lab")).transform(graft.plans.Lineage.truncate)
        var improved = lab
        var inner = 0
        while (improved.limit(1).count() > 0) {
          inner += unrollHops
          require(inner <= maxInner,
            s"scc: coloring not converged after $maxInner hops — graph diameter " +
              "exceeds the budget; raise maxInner")
          // hops 1..unrollHops-1 stay PLAN-ONLY; only the block's last
          // joined frame checkpoints, and the convergence check reads
          // the last hop's improvements off that one materialization
          var h = 0
          while (h < unrollHops) {
            val cand = rem
              .join(improved.select(col("node").as("src"), col("lab")), Seq("src"))
              .groupBy(col("dst").as("node")).agg(min(col("lab")).as("cand"))
            val joined0 = lab.join(cand, Seq("node"), "left")
            val joined =
              if (h == unrollHops - 1) joined0.transform(graft.plans.Lineage.truncate)
              else joined0
            improved = joined.filter(col("cand") < col("lab"))
              .select(col("node"), col("cand").as("lab"))
            lab = joined
              .select(col("node"), least(col("lab"), col("cand")).as("lab"))
            h += 1
          }
        }
        // 3. class-restricted backward reach from the in-class roots
        val labEdges = rem
          .join(lab.select(col("node").as("src"), col("lab").as("slab")), Seq("src"))
          .join(lab.select(col("node").as("dst"), col("lab").as("dlab")), Seq("dst"))
          .filter(col("slab") === col("dlab"))
          .select(col("src"), col("dst"), col("slab").as("lab"))
          .transform(graft.plans.Lineage.truncate)
        // accumulate marked levels bfs-style (each level checkpointed
        // once, the union is plan-only) instead of re-materializing the
        // growing mark set every round
        val markLevels = scala.collection.mutable.ArrayBuffer(
          lab.filter(col("node") === col("lab")).transform(graft.plans.Lineage.truncate))
        def mark: DataFrame = markLevels.reduce(_ union _)
        var frontier = markLevels.head
        while (frontier.limit(1).count() > 0) {
          val next = labEdges
            .join(frontier.select(col("node").as("dst"), col("lab")), Seq("dst", "lab"))
            .select(col("src").as("node"), col("lab")).distinct()
            .join(mark, Seq("node"), "left_anti")
            .transform(graft.plans.Lineage.truncate)
          markLevels += next
          frontier = next
        }
        done += mark.select(col("node"), col("lab").as("scc_id"))
        // 4. shrink to the survivors
        nodes = nodes.join(mark, Seq("node"), "left_anti").transform(graft.plans.Lineage.truncate)
        rem = rem
          .join(nodes.select(col("node").as("src")), Seq("src"), "left_semi")
          .join(nodes.select(col("node").as("dst")), Seq("dst"), "left_semi")
          .select(col("src"), col("dst")).transform(graft.plans.Lineage.truncate)
      }
    }
    if (done.isEmpty) e0.select(col("src").as("node"), col("src").as("scc_id")).limit(0)
    else done.reduce(_ union _)
  }

  /** Betweenness centrality (Brandes) from a pivot source set, in the
    * repo's exact fixed-point discipline: how often a node sits on
    * shortest paths between others — the brokerage readout PageRank's
    * endorsement mass misses. Directed, unweighted.
    *
    *  - Phase 1 runs the layered BFS for ALL sources at once: frames
    *    keyed (source, node), one join+agg shuffle per depth, σ = path
    *    counts summed exactly (decimal - they multiply later).
    *  - Phase 2 walks the layers backward: δ(s,v) = Σ_w σ(s,v)·(1e9 +
    *    δ(s,w)) DIV σ(s,w) over shortest-path-DAG successors w — the
    *    textbook recurrence scaled to 1e-9 units with integral DIV, so
    *    every sum is a long sum: results are bit-identical across
    *    partitionings where float Brandes is not. Each DIV floors ≤1
    *    unit; the accumulated error is < depth·maxσ·1e-9 — ranking-
    *    irrelevant, and the spec's sequential reference applies the
    *    IDENTICAL floors so equality is exact, not approximate.
    *  - Exact betweenness is `sources` = all nodes; a k-pivot subset is
    *    the standard estimator at scale (cost k·O(E) total, the same
    *    per-depth shuffles regardless of k).
    *
    * Returns (node, btw_e9) = Σ over pivots s≠v of δ(s,v), 1e-9 units.
    */
  def betweenness(edges: DataFrame, sources: DataFrame,
                  maxDepth: Int = 64): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct().transform(graft.plans.Lineage.truncate)
    // layer 0: each source reaches itself by the one empty path
    val layers = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var frontier = sources.select(col("node")).filter(col("node").isNotNull)
      .distinct()
      .select(col("node").as("s"), col("node").as("v"),
        lit(BigDecimal(1)).cast("decimal(38,0)").as("sigma"))
      .transform(graft.plans.Lineage.truncate)
    layers += frontier
    def seen: DataFrame = layers.reduce(_ union _).select(col("s"), col("v"))
    var depth = 0
    while (frontier.limit(1).count() > 0 && depth < maxDepth) {
      depth += 1
      val next = e
        .join(frontier.select(col("s"), col("v").as("src"), col("sigma")), Seq("src"))
        .groupBy(col("s"), col("dst").as("v")).agg(sum(col("sigma")).as("sigma"))
        // decimal(38,0) overflow yields NULL under non-ANSI sum — turn it
        // into a loud failure, never silently dropped path counts
        .select(col("s"), col("v"), when(col("sigma").isNotNull, col("sigma"))
          .otherwise(raise_error(lit(
            "betweenness: path-count sum overflowed decimal(38,0) — " +
              "graph too path-dense for the exact form"))).as("sigma"))
        .join(seen, Seq("s", "v"), "left_anti")
        .transform(graft.plans.Lineage.truncate)
      layers += next
      frontier = next
    }
    require(frontier.limit(1).count() == 0,
      s"betweenness: BFS still expanding at depth $maxDepth — raise maxDepth")
    // backward accumulation, deepest layer first (its δ is 0)
    val Scale = 1000000000L
    var deltaNext = layers.last.select(col("s"), col("v"), col("sigma"))
      .withColumn("delta", lit(0L)).transform(graft.plans.Lineage.truncate)
    val contribs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    contribs += deltaNext.select(col("v"), col("delta"))
    ((layers.size - 2) to 0 by -1).foreach { d =>
      val terms = e
        .join(layers(d).select(col("s"), col("v").as("src"),
          col("sigma").as("sigma_v")), Seq("src"))
        .join(deltaNext.select(col("s"), col("v").as("dst"),
          col("sigma").as("sigma_w"), col("delta").as("delta_w")),
          Seq("s", "dst"))
        // σ_v·(Scale + δ_w) DIV σ_w — integral division on decimals
        // (the hits normalization shape), every downstream sum a long
        // sum; the product overflowing decimal(38,0) NULLs under
        // non-ANSI arithmetic, which would silently DROP the term from
        // the sum — raise instead (the repo's no-silent-non-fixpoint rule)
        .select(col("s"), col("src").as("v"),
          expr(s"CAST(sigma_v * (${Scale}L + delta_w) AS DECIMAL(38,0)) " +
            "DIV sigma_w").as("term"))
        .select(col("s"), col("v"), when(col("term").isNotNull, col("term"))
          .otherwise(raise_error(lit(
            "betweenness: sigma*(1e9+delta) overflowed decimal(38,0) — " +
              "graph too path-dense for the exact form"))).as("term"))
        .groupBy("s", "v").agg(sum(col("term")).as("delta"))
      deltaNext = layers(d)
        .join(terms, Seq("s", "v"), "left")
        .select(col("s"), col("v"), col("sigma"),
          coalesce(col("delta"), lit(0L)).as("delta"))
        .transform(graft.plans.Lineage.truncate)
      if (d >= 1) contribs += deltaNext.select(col("v"), col("delta"))
    }
    contribs.reduce(_ union _)
      .groupBy(col("v").as("node")).agg(sum(col("delta")).as("btw_e9"))
  }


  /** Shared statement text for `gr13_recursive_cte` — one string, two
    * engines, so the Spark side and the oracle cannot drift.
    */
  val recursiveCteSql: String =
    """WITH RECURSIVE e AS (
      |  SELECT doc_id AS src,
      |         (doc_id * 7 + 13) % (SELECT count(*) FROM documents) AS dst
      |  FROM documents),
      |r AS (
      |  SELECT doc_id AS seed, doc_id AS node, CAST(0 AS BIGINT) AS dist
      |  FROM documents WHERE doc_id < 8
      |  UNION ALL
      |  SELECT r.seed, e.dst, r.dist + 1 FROM r JOIN e ON e.src = r.node
      |  WHERE r.dist < 6),
      |m AS (SELECT seed, node, CAST(min(dist) AS BIGINT) AS dist
      |      FROM r GROUP BY 1, 2)
      |SELECT seed, CAST(count(*) AS BIGINT) AS reached,
      |       CAST(sum(dist) AS BIGINT) AS total_dist
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  val catalog: Seq[Q] = Seq(
    // Reachability over a deterministic functional graph on doc ids,
    // oracle = DuckDB WITH RECURSIVE (the declarative twin of the
    // iterative frontier loop).
    Q(
      "gr1_bfs_reachability",
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src,
        |         (doc_id * 7 + 13) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents),
        |r AS (
        |  SELECT doc_id AS node, CAST(0 AS BIGINT) AS dist
        |  FROM documents WHERE doc_id < 5
        |  UNION
        |  SELECT e.dst, r.dist + 1 FROM r JOIN e ON e.src = r.node
        |  WHERE r.dist < 6)
        |SELECT node, CAST(min(dist) AS BIGINT) AS dist
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 13) % n).as("dst"))
      // bfs emits exactly one row per reached node at its min distance —
      // no re-aggregation needed
      val seeds = docs.filter(col("doc_id") < 5).select(col("doc_id").as("node"))
      bfs(edges, seeds, maxHops = 6).orderBy("node")
    },

    // R36b — PageRank over the same deterministic functional graph.
    // Oracle: the 8 fixed rounds unrolled as generated integer CTEs
    // ([[pprUnrolledOracle]], the gr12 recipe) — the exact fixed-point
    // algebra DuckDB can replay; GraphSpec additionally pins the values
    // against an independent driver-side reference implementation.
    Q("gr2_pagerank", pagerankUnrolledOracle) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val edges = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 13) % n).as("dst"))
      pageRank(edges, nIter = 8)
        .orderBy(desc("rank_e12"), col("node")).limit(50)
    },

    // R83 — seed-expansion corpus discovery: "find more docs like the
    // curated set" as personalized PageRank over the similarity graph.
    // Edges = dd15's blocked sorted-neighborhood pairs (bounded O(n·w)
    // candidates, never corpus²) made undirected; seeds = the curated
    // source's docs; teleport anchors all mass at the seeds, so rank
    // measures multi-hop similarity flow and unreachable docs hold
    // EXACTLY 0 (integer fixed point). Output: top non-seed docs — the
    // expansion candidates a curation pipeline would human-review.
    // Oracle: [[pprUnrolledOracle]] with dd15's pair generator as the
    // edge prelude and the curated source as seeds — 8 personalized
    // rounds in exact integer algebra; GraphSpec additionally pins
    // seeds=all ≡ pageRank bit-for-bit, component isolation, and
    // seed-anchored mass.
    Q("gr17_seed_expansion", seedExpansionUnrolledOracle) { (s, d) =>
      val docs = Tables.documents(s, d)
      val pairs = graft.operators.Corpus.sortedNeighborhoodPairs(docs)
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      val seeds = docs.filter(col("source") === "src1")
        .select(col("doc_id").as("node"))
      personalizedPageRank(edges, seeds, nIter = 8)
        .join(seeds.withColumn("is_seed", lit(true)), Seq("node"), "left")
        .filter(col("is_seed").isNull)
        .select(col("node"), col("rank_e12"))
        .orderBy(desc("rank_e12"), col("node")).limit(30)
    },

    // R60 — triangle enumeration (graph-analytics staple): undirected
    // edges from three deterministic hash links per doc, normalized to
    // (u < v) and deduped; triangles are TWO equi-join shuffles with the
    // u < v < w orientation so each triangle is emitted exactly once.
    // At 100 TB the standard refinement is degree-ordering the
    // orientation (point the edge at the higher-degree endpoint) so the
    // wedge join is bounded by Σ d(v)² of the LOW-degree side — the
    // join structure here is already that algorithm.
    Q(
      "gr3_triangles",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b)
        |SELECT e1.u AS u, e1.v AS v, e2.v AS w
        |FROM e e1 JOIN e e2 ON e1.v = e2.u
        |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
        |ORDER BY u, v, w""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val raw = docs.select(col("doc_id").as("a"), ((col("doc_id") * 7 + 13) % n).as("b"))
        .unionByName(docs.select(col("doc_id").as("a"), ((col("doc_id") * 3 + 5) % n).as("b")))
        .unionByName(docs.select(col("doc_id").as("a"), ((col("doc_id") * 11 + 2) % n).as("b")))
      val e = raw.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .transform(graft.plans.Lineage.truncate) // three self-join consumers — dedup once
      val wedges = e.select(col("u"), col("v"))
        .join(e.select(col("u").as("v"), col("v").as("w")), "v")
      wedges.join(e.select(col("u"), col("v").as("w")), Seq("u", "w"))
        .select(col("u"), col("v"), col("w"))
        .orderBy("u", "v", "w")
    },

    // R64b — hop-bounded weighted shortest paths from node 0 over the
    // same deterministic 3-out functional graph gr3 uses, directed, with
    // integer weights (src+dst) % 100 + 1. 10 Bellman–Ford rounds ≡ the
    // min over all ≤10-hop walks, which is exactly what the DuckDB
    // recursive CTE (with a hop counter) enumerates — walks with cycles
    // are never cheaper than their shortcut path, so the two agree.
    Q(
      "gr4_shortest_path",
      """WITH RECURSIVE e AS (
        |  SELECT src, dst, CAST((src + dst) % 100 + 1 AS BIGINT) AS w FROM (
        |    SELECT doc_id AS src,
        |           (doc_id*7+13) % (SELECT count(*) FROM documents) AS dst
        |    FROM documents
        |    UNION ALL
        |    SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents)
        |    FROM documents
        |    UNION ALL
        |    SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents)
        |    FROM documents) raw
        |  WHERE src <> dst),
        |walk(node, d, hops) AS (
        |  SELECT CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0
        |  UNION ALL
        |  SELECT e.dst, walk.d + e.w, hops + 1
        |  FROM walk JOIN e ON e.src = walk.node
        |  WHERE hops < 10)
        |SELECT node, CAST(min(d) AS BIGINT) AS dist
        |FROM walk GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * mult + add) % n).as("dst"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("src") =!= col("dst"))
        .withColumn("w", (col("src") + col("dst")) % 100 + 1)
      shortestPaths(e, source = 0L, rounds = 10)
        .select(col("node"), col("d").as("dist"))
        .orderBy("node")
    },

    // R72 — label-propagation communities over the 3-out functional
    // graph. ORACLE upgrade (r4 session 8): synchronous LPA has no
    // portable RECURSIVE form (aggregation per iteration), but the
    // catalog entry runs a FIXED 5 rounds — and a fixed unroll is just
    // five chained plain CTEs. The oracle text is GENERATED by the same
    // loop bound the Spark side iterates, so the two can't drift; tie
    // rule (max count, then min label) is row_number-total on both.
    // GraphSpec still pins the planted two-community case.
    Q("gr5_lpa_communities", lpaUnrolledOracle) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * mult + add) % n).as("dst"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
      labelPropagation(e, nIter = 5)
        .groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_node"))
        .orderBy(desc("n_members"), col("community"))
        .limit(50)
    },

    // R79 — degree distribution over the 3-out functional graph: the
    // first graph-health readout (hubs? isolates? is the k-core knob
    // sensible?) before any iterative algorithm is worth running.
    // Undirected distinct edges → one degree aggregate → the
    // |distinct degrees|-row histogram; oracle replays the same
    // construction in SQL.
    Q(
      "gr7_degree_histogram",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |sym AS (SELECT u AS node FROM e UNION ALL SELECT v FROM e),
        |deg AS (SELECT node, count(*) AS degree FROM sym GROUP BY 1)
        |SELECT CAST(degree AS BIGINT) AS degree, count(*) AS n_nodes
        |FROM deg GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
      e.select(col("u").as("node")).unionByName(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
        .groupBy("degree").agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    },

    // R75 — k-core decomposition over the same 3-out functional graph.
    // ORACLE UPGRADE (r6): the degree-peel fixpoint unrolls into 5
    // generated rounds ([[kcoreUnrolledOracle]] — peeling is idempotent
    // past convergence, so the fixed unroll replays the fixpoint
    // exactly). GraphSpec additionally pins the planted clique-vs-chain
    // case and cross-partitioning determinism.
    Q("gr6_kcore", kcoreUnrolledOracle) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * mult + add) % n).as("dst"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
      kCore(e, k = 3).orderBy("node")
    },

    // R85 — link prediction by common-neighbor count: the top
    // NON-adjacent pairs sharing the most neighbors (the simplest
    // link-prediction score, and the candidate generator Adamic-Adar /
    // Jaccard variants rerank). Pairs come from ONE equi-join of the
    // symmetric adjacency on the shared neighbor — fan-out Σ d(v)² like
    // gr3's wedge join, never node×node — then an anti-join drops
    // existing edges. Top-30 under a total order.
    Q(
      "gr8_common_neighbors",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |adj AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
        |cn AS (SELECT a1.node AS a, a2.node AS b, count(*) AS common
        |       FROM adj a1 JOIN adj a2 ON a1.nbr = a2.nbr AND a1.node < a2.node
        |       GROUP BY 1, 2),
        |nonadj AS (SELECT cn.a, cn.b, cn.common FROM cn
        |           LEFT JOIN e ON cn.a = e.u AND cn.b = e.v
        |           WHERE e.u IS NULL)
        |SELECT a, b, CAST(common AS BIGINT) AS common
        |FROM nonadj ORDER BY common DESC, a, b LIMIT 30""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .transform(graft.plans.Lineage.truncate) // adjacency (twice) + anti-join consume it
      val adj = e.select(col("u").as("node"), col("v").as("nbr"))
        .unionByName(e.select(col("v").as("node"), col("u").as("nbr")))
      val cn = adj.select(col("node").as("a"), col("nbr"))
        .join(adj.select(col("node").as("b"), col("nbr")), "nbr")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("common"))
      cn.join(e, cn("a") === e("u") && cn("b") === e("v"), "left_anti")
        .orderBy(desc("common"), col("a"), col("b")).limit(30)
    },

    // R87b — degree assortativity (do hubs link to hubs?): Pearson
    // correlation of endpoint degrees over all DIRECTED edge instances
    // (both orientations of each undirected edge — the standard
    // definition). Degrees are one aggregate joined onto the edge frame;
    // the moments are exact integer sums and the coefficient is q60's
    // fixed double tree, so the hash compare is exact.
    Q(
      "gr10_assortativity",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |sym AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT node, count(*) AS deg FROM sym GROUP BY 1),
        |p AS (SELECT du.deg AS x, dv.deg AS y FROM sym
        |      JOIN deg du ON sym.node = du.node
        |      JOIN deg dv ON sym.nbr = dv.node),
        |m AS (SELECT count(*) AS n,
        |        CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |        CAST(sum(x*x) AS BIGINT) AS sxx, CAST(sum(y*y) AS BIGINT) AS syy,
        |        CAST(sum(x*y) AS BIGINT) AS sxy
        |      FROM p)
        |SELECT n,
        |  CAST(n*sxy - sx*sy AS DOUBLE)
        |    / (sqrt(CAST(n*sxx - sx*sx AS DOUBLE))
        |       * sqrt(CAST(n*syy - sy*sy AS DOUBLE))) AS assortativity
        |FROM m""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .transform(graft.plans.Lineage.truncate)
      val sym = e.select(col("u").as("node"), col("v").as("nbr"))
        .unionByName(e.select(col("v").as("node"), col("u").as("nbr")))
      val deg = sym.groupBy("node").agg(count(lit(1)).as("deg"))
      val p = sym
        .join(deg.select(col("node"), col("deg").as("x")), Seq("node"))
        .join(deg.select(col("node").as("nbr"), col("deg").as("y")), Seq("nbr"))
        .select(col("x"), col("y"))
      p.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(col("x") * col("x")).as("sxx"), sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
              * sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
            .as("assortativity"))
    },

    // R86 — local clustering coefficient: per node, the fraction of its
    // neighbor pairs that are themselves connected, in integer permille
    // ((2·t·1000) DIV (deg·(deg−1))). Triangles-per-node reuses gr3's
    // two-shuffle u<v<w enumeration (each triangle credits all three
    // corners); degrees are one aggregate. The permille stays integral
    // so the hash compare is exact; nodes with deg < 2 are excluded
    // (coefficient undefined). Top-30 most-clustered under a total
    // order.
    Q(
      "gr9_clustering",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |tri AS (SELECT e1.u AS u, e1.v AS v, e2.v AS w
        |        FROM e e1 JOIN e e2 ON e1.v = e2.u
        |        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tc AS (SELECT node, count(*) AS t FROM (
        |         SELECT u AS node FROM tri UNION ALL
        |         SELECT v FROM tri UNION ALL
        |         SELECT w FROM tri) x GROUP BY 1),
        |deg AS (SELECT node, count(*) AS deg FROM (
        |          SELECT u AS node FROM e UNION ALL SELECT v FROM e) s GROUP BY 1)
        |SELECT deg.node, CAST(deg AS BIGINT) AS degree,
        |  CAST(coalesce(t, 0) AS BIGINT) AS triangles,
        |  (coalesce(t, 0) * 2 * 1000) // (deg * (deg - 1)) AS coeff_permille
        |FROM deg LEFT JOIN tc ON deg.node = tc.node
        |WHERE deg >= 2
        |ORDER BY coeff_permille DESC, deg.node LIMIT 30""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .transform(graft.plans.Lineage.truncate) // triangle joins + degree agg consume it
      val wedges = e.select(col("u"), col("v"))
        .join(e.select(col("u").as("v"), col("v").as("w")), "v")
      val tri = wedges.join(e.select(col("u"), col("v").as("w")), Seq("u", "w"))
        .select(col("u"), col("v"), col("w"))
      val tc = tri.select(col("u").as("node"))
        .unionByName(tri.select(col("v").as("node")))
        .unionByName(tri.select(col("w").as("node")))
        .groupBy("node").agg(count(lit(1)).as("t"))
      val deg = e.select(col("u").as("node")).unionByName(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      deg.join(tc, Seq("node"), "left")
        .filter(col("deg") >= 2)
        .select(col("node"), col("deg").as("degree"),
          coalesce(col("t"), lit(0L)).as("triangles"),
          expr("(coalesce(t, 0) * 2 * 1000) DIV (deg * (deg - 1))").as("coeff_permille"))
        .orderBy(desc("coeff_permille"), col("node")).limit(30)
    },

    // R92 — directed-edge reciprocity (what share of links are mutual —
    // the first asymmetry readout on any directed graph: follower
    // graphs, citation links, hyperlinks). The DIRECTED deterministic
    // formula graph (no least/greatest fold), mutual pairs found by one
    // self-join on the reversed edge; both counts are 1-row aggregates
    // re-entering as broadcast scalars, the ratio exact integral ppm.
    Q(
      "gr11_reciprocity",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT a, b FROM raw WHERE a <> b)
        |SELECT (SELECT count(*) FROM e) AS n_edges,
        |  (SELECT count(*) FROM e e1 JOIN e e2 ON e1.a = e2.b AND e1.b = e2.a)
        |    AS n_mutual,
        |  (SELECT count(*) FROM e e1 JOIN e e2 ON e1.a = e2.b AND e1.b = e2.a)
        |    * 1000000 // (SELECT count(*) FROM e) AS recip_ppm""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b")).distinct()
        .transform(graft.plans.Lineage.truncate) // both counts + the reversed join consume it
      val mutual = e.join(
        e.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"), "left_semi")
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(broadcast(mutual.agg(count(lit(1)).as("n_mutual"))))
        .select(col("n_edges"), col("n_mutual"),
          expr("n_mutual * 1000000 DIV n_edges").as("recip_ppm"))
    },

    // R93 — HITS hubs & authorities over the directed formula graph:
    // the link-analysis complement of gr2's PageRank (endorsement mass
    // vs the hub/authority duality). Exact fixed-point integers — see
    // [[hits]]. ORACLE upgrade (r4 session 8, gr5's precedent): the
    // mutual recursion has no portable RECURSIVE form, but the entry's
    // FIXED 8 rounds unroll into generated plain CTEs — every product
    // rides HUGEINT and every normalize is a floor division of
    // non-negatives (Spark decimal DIV trunc ≡ DuckDB // floor there),
    // so the unroll is bit-exact. HitsSpec's BigInt sequential
    // reference still pins adversarial small graphs.
    Q("gr12_hits", hitsUnrolledOracle) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * mult + add) % n).as("dst"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("src") =!= col("dst"))
      hits(e, nIter = 8)
        .orderBy(desc("auth_e9"), desc("hub_e9"), col("node")).limit(20)
    },

    // R36c — NATIVE recursive CTE execution: Spark 4's UnionLoop runs
    // the WITH RECURSIVE statement itself (no driver loop), and the
    // IDENTICAL text runs on DuckDB — per-seed 6-hop reachability over
    // the deterministic functional graph, walks deduped to min-dist
    // before the rollup. UNION ALL recursion on an out-degree-1 graph
    // is bounded (seeds × (hops+1) rows), well under the engine's
    // recursion limits; the iterative [[bfs]] stays the 100 TB path —
    // it dedups per round, while UNION ALL recursion re-expands every
    // walk and a high-fan-out graph needs the UNION-dedup form Spark
    // doesn't execute natively yet.
    Q("gr13_recursive_cte", Graph.recursiveCteSql) { (s, d) =>
      graft.Views.sql(s, d, Graph.recursiveCteSql)
    },

    // R80 — strongly connected components over the directed 2-out
    // formula graph (the cycle structure of the functional links —
    // which doc-reference rings exist and how big they are). ORACLE
    // upgraded in r4 session 8: mutual reachability IS portable SQL —
    // ONE transitive closure, then a swapped self-join (r(a,b) ∧
    // r(b,a)) — the O(n²)-pair oracle is fine at oracle scale while
    // the Spark side runs the FW-BW coloring that survives real
    // graphs; SccSpec additionally pins the partition against a
    // sequential Tarjan reference on adversarial graphs. Output:
    // component-size histogram + smallest component ids — bounded rows
    // at any graph size.
    Q(
      "gr14_scc",
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src,
        |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |r AS (
        |  SELECT src AS a, dst AS b FROM e WHERE src <> dst
        |  UNION
        |  SELECT r.a, e.dst FROM r JOIN e ON e.src = r.b),
        |m AS (
        |  SELECT r1.a, r1.b FROM r r1 JOIN r r2 ON r1.a = r2.b AND r1.b = r2.a
        |  UNION ALL
        |  SELECT doc_id, doc_id FROM documents),
        |scc AS (SELECT a AS node, min(b) AS scc_id FROM m GROUP BY 1),
        |hist AS (SELECT scc_id, count(*) AS size FROM scc GROUP BY 1)
        |SELECT CAST(size AS BIGINT) AS size,
        |  CAST(count(*) AS BIGINT) AS n_components,
        |  CAST(min(scc_id) AS BIGINT) AS min_scc_id
        |FROM hist GROUP BY size
        |ORDER BY size DESC, min_scc_id""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * mult + add) % n).as("dst"))
      val e = es(7, 13).unionByName(es(3, 5))
      // GRAFT_SCC_UNROLL: relaxations per driver round (A/B knob; output
      // is unroll-invariant — SccSpec pins 1 ≡ 2 ≡ 4; default 2 won the
      // r8 A/B: 11.1 → 9.6 s warm at sf0.1)
      scc(e, unrollHops =
          sys.env.get("GRAFT_SCC_UNROLL").map(_.toInt).getOrElse(2))
        .groupBy("scc_id").agg(count(lit(1)).as("size"))
        .groupBy("size").agg(count(lit(1)).as("n_components"),
          min(col("scc_id")).as("min_scc_id"))
        .orderBy(desc("size"), col("min_scc_id"))
    },

    // R81 — betweenness centrality from a 12-pivot sample over the
    // 2-out formula graph: the brokerage top-20 (which docs sit on the
    // most shortest reference chains). ORACLE UPGRADE (r6): the k-pivot
    // Brandes pass — forward σ layers + reverse integral δ recurrence —
    // unrolls into generated CTEs ([[betweennessUnrolledOracle]], H=24
    // empty-tail bound over the measured depth-11 fixpoint), so the
    // full nested shortest-path arithmetic is certified cross-engine.
    // BetweennessSpec additionally pins the distributed result against
    // a sequential reference and analytic path/star values.
    Q("gr15_betweenness", betweennessUnrolledOracle) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * mult + add) % n).as("dst"))
      val e = es(7, 13).unionByName(es(3, 5))
      val pivots = docs.filter(col("doc_id") < 12).select(col("doc_id").as("node"))
      betweenness(e, pivots)
        .orderBy(desc("btw_e9"), col("node")).limit(20)
    },

    // R82 — modularity of a given partition (the clustering-quality
    // metric community detection optimizes), EXACT: Q·4m² = Σ_c(4m·e_c
    // − d_c²) over undirected deduped edges, all longs — no float until
    // the single reported ratio in ppm. The partition under test is the
    // deterministic doc_id%10 assignment so the ORACLE can replay the
    // whole computation in SQL (a learned partition would leave the
    // metric unverifiable); gr5's LPA output plugs into the same
    // formula in GraphSpec-adjacent use. One edge scan + two
    // fixed-width aggregates.
    Q(
      "gr16_modularity",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        |ec AS (SELECT u % 10 AS c, CAST(count(*) AS BIGINT) AS e_in
        |       FROM e WHERE u % 10 = v % 10 GROUP BY 1),
        |dc AS (SELECT c, CAST(sum(deg) AS BIGINT) AS d_c FROM (
        |         SELECT u % 10 AS c, count(*) AS deg FROM e GROUP BY u % 10
        |         UNION ALL
        |         SELECT v % 10 AS c, count(*) AS deg FROM e GROUP BY v % 10)
        |       GROUP BY 1)
        |SELECT dc.c AS community, COALESCE(ec.e_in, 0) AS e_in, dc.d_c,
        |  CAST((4 * m.m * COALESCE(ec.e_in, 0) - dc.d_c * dc.d_c) AS BIGINT)
        |    AS q_term_4m2
        |FROM dc LEFT JOIN ec ON dc.c = ec.c CROSS JOIN m
        |ORDER BY community""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct().transform(graft.plans.Lineage.truncate) // three aggregate consumers
      val m = e.count()
      val ec = e.filter(col("u") % 10 === col("v") % 10)
        .groupBy((col("u") % 10).as("c")).agg(count(lit(1)).as("e_in"))
      val dc = e.groupBy((col("u") % 10).as("c")).agg(count(lit(1)).as("deg"))
        .unionByName(e.groupBy((col("v") % 10).as("c")).agg(count(lit(1)).as("deg")))
        .groupBy("c").agg(sum("deg").as("d_c"))
      dc.join(ec, Seq("c"), "left")
        .select(col("c").as("community"),
          coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_c"),
          (lit(4L) * m * coalesce(col("e_in"), lit(0L))
            - col("d_c") * col("d_c")).as("q_term_4m2"))
        .orderBy("community")
    },

    // R105 — hop-bounded harmonic centrality from 12 pivots over the
    // UNDIRECTED 2-out functional graph, fully oracle-checked: the
    // DuckDB recursive CTE replays the bounded multi-source BFS,
    // min-distance per (pivot, node), and the same integral `1e9 DIV d`
    // terms — so the fixed-point arithmetic claim is certified
    // cross-engine, not just spec-pinned. Top-20 under a total order.
    Q(
      "gr19_harmonic",
      """WITH RECURSIVE n AS (SELECT count(*) AS n FROM documents),
        |raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT n FROM n) AS b FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT n FROM n) FROM documents),
        |e AS (
        |  SELECT a AS src, b AS dst FROM raw WHERE a <> b
        |  UNION
        |  SELECT b, a FROM raw WHERE a <> b),
        |r AS (
        |  SELECT doc_id AS s, doc_id AS v, CAST(0 AS BIGINT) AS d
        |  FROM documents WHERE doc_id < 12
        |  UNION
        |  SELECT r.s, e.dst, r.d + 1 FROM r JOIN e ON e.src = r.v
        |  WHERE r.d < 8),
        |md AS (SELECT s, v, min(d) AS d FROM r GROUP BY 1, 2)
        |SELECT v AS node, CAST(sum(1000000000 // d) AS BIGINT) AS harm_e9
        |FROM md WHERE d > 0 GROUP BY 1
        |ORDER BY harm_e9 DESC, node LIMIT 20""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * mult + add) % n).as("dst"))
      val e = es(7, 13).unionByName(es(3, 5))
      val pivots = docs.filter(col("doc_id") < 12).select(col("doc_id").as("node"))
      harmonic(e, pivots, maxDepth = 8, truncate = true)
        .orderBy(desc("harm_e9"), col("node")).limit(20)
    },

    // R107 — 3-truss over the 3-out functional graph (edge-level dense
    // cores beside gr6's node-level k-core): the edges that survive in
    // at least one triangle OF THE SURVIVING GRAPH — sparse functional
    // graphs have few overlapping triangles, so higher k empties here
    // (the cascade fixtures in KTrussSpec exercise k=4..6 on cliques).
    // ORACLE UPGRADE (r6): the support-peel fixpoint unrolls into 5
    // generated rounds ([[ktrussUnrolledOracle]] — idempotent past
    // convergence, final round's support column is the output exactly
    // as kTruss returns it). KTrussSpec additionally pins cascade
    // semantics (shared-edge collapse, clique preservation) against a
    // sequential same-rule reference.
    Q("gr20_ktruss", ktrussUnrolledOracle) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * mult + add) % n).as("dst"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
      kTruss(e, k = 3).orderBy("u", "v")
    },

    // R103 — Louvain-style modularity refinement seeded by gr5's LPA
    // labels over the same 3-out functional graph. Rows-only: the
    // iterated gain argmax has no portable recursive CTE; LouvainSpec
    // pins the synchronous parity rule against a sequential reference,
    // the clique-glue fixture where LPA under-splits, and the measured
    // exact-modularity improvement. Output is the community summary
    // (deterministic — the whole gain algebra is integer/decimal).
    Q("gr18_louvain", louvainUnrolledOracle) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * mult + add) % n).as("dst"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
      val seed = labelPropagation(e, nIter = 5)
        .select(col("node"), col("lbl").as("c"))
      louvainRefine(e, seed, rounds = 4)
        .groupBy(col("c").as("community"))
        .agg(count(lit(1)).as("n_members"), min(col("node")).as("min_node"))
        .orderBy(desc("n_members"), col("community"))
        .limit(50)
    },

    // R126 — deterministic random-walk sampling (the node2vec/DeepWalk
    // corpus generator): from every seed, a 4-step walk over the
    // indexed adjacency table, the step choice drawn from the
    // engine-portable md5 stream keyed by (seed, node, step) — so the
    // "random" walks are exactly reproducible, shardable, and
    // ORACLE-CHECKABLE (DuckDB replays the identical walks through a
    // recursive CTE). Each step is ONE equi-join of the frontier
    // against the (src, idx) adjacency — walk count × depth joins of
    // id-width rows, never a per-node driver loop; this is the shape
    // that feeds a 100 TB embedding trainer its walk corpus.
    Q(
      "gr21_random_walks",
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src, 1 AS idx,
        |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 2, (doc_id*31 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 3, (doc_id*101 + 2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |w AS (
        |  SELECT doc_id AS seed, CAST(0 AS BIGINT) AS step, doc_id AS node
        |  FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT w.seed, w.step + 1, e.dst
        |  FROM w JOIN e ON e.src = w.node AND e.idx = 1 +
        |    CAST('0x' || substr(md5(CAST(w.seed AS VARCHAR) || ':' ||
        |           CAST(w.node AS VARCHAR) || ':' || CAST(w.step AS VARCHAR)),
        |         1, 8) AS BIGINT) % 3
        |  WHERE w.step < 4)
        |SELECT seed, step, node FROM w ORDER BY seed, step, node""".stripMargin
    ) { (s, d) =>
      deterministicWalks(s, d).orderBy("seed", "step", "node")
    },

    // R126b — skip-gram co-occurrence from the walk corpus (DeepWalk's
    // next stage): window-±2 (center, context) pair counts along each
    // walk — the positive-example matrix an embedding trainer consumes.
    // One self-join of the walks frame on (seed, step distance), counts
    // exact; the walks being md5-deterministic makes even THIS stage
    // fully oracle-checkable.
    Q(
      "gr22_walk_cooccurrence",
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src, 1 AS idx,
        |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 2, (doc_id*31 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 3, (doc_id*101 + 2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |w AS (
        |  SELECT doc_id AS seed, CAST(0 AS BIGINT) AS step, doc_id AS node
        |  FROM documents WHERE doc_id < 50
        |  UNION ALL
        |  SELECT w.seed, w.step + 1, e.dst
        |  FROM w JOIN e ON e.src = w.node AND e.idx = 1 +
        |    CAST('0x' || substr(md5(CAST(w.seed AS VARCHAR) || ':' ||
        |           CAST(w.node AS VARCHAR) || ':' || CAST(w.step AS VARCHAR)),
        |         1, 8) AS BIGINT) % 3
        |  WHERE w.step < 4)
        |SELECT a.node AS center, b.node AS context,
        |  CAST(b.step - a.step AS BIGINT) AS dist,
        |  CAST(count(*) AS BIGINT) AS cnt
        |FROM w a JOIN w b
        |  ON a.seed = b.seed AND b.step - a.step BETWEEN 1 AND 2
        |GROUP BY 1, 2, 3
        |ORDER BY cnt DESC, center, context, dist LIMIT 50""".stripMargin
    ) { (s, d) =>
      val w = deterministicWalks(s, d).transform(graft.plans.Lineage.truncate)
      val a = w.select(col("seed"), col("step").as("sa"), col("node").as("center"))
      val b = w.select(col("seed"), col("step").as("sb"), col("node").as("context"))
      a.join(b, Seq("seed"))
        .filter((col("sb") - col("sa")).between(1, 2))
        .groupBy(col("center"), col("context"),
          (col("sb") - col("sa")).as("dist"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), col("center"), col("context"), col("dist"))
        .limit(50)
    },

    // R138 — hop-bounded eccentricity per seed: how DEEP each seed's
    // reachable ball goes within 8 hops (max of min-distances) plus its
    // size — the per-source diameter readout beside gr19's harmonic
    // centrality (which sums the same distances). Seed-labeled BFS:
    // the frontier carries (seed, node), dedup is an anti-join against
    // the seen set PER SEED, one join+agg shuffle per hop — [[bfs]]'s
    // plan with a composite key, so the 100 TB story is unchanged
    // (frontier shrinks as nodes settle; hops, not rows, drive the
    // driver loop). Oracle: the gr1 recursive-CTE shape with the seed
    // column carried through the recursion.
    Q(
      "gr23_eccentricity",
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src,
        |         (doc_id * 7 + 13) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents),
        |r AS (
        |  SELECT doc_id AS seed, doc_id AS node, CAST(0 AS BIGINT) AS dist
        |  FROM documents WHERE doc_id < 5
        |  UNION
        |  SELECT r.seed, e.dst, r.dist + 1 FROM r JOIN e ON e.src = r.node
        |  WHERE r.dist < 8),
        |m AS (SELECT seed, node, CAST(min(dist) AS BIGINT) AS d
        |      FROM r GROUP BY 1, 2)
        |SELECT seed, CAST(max(d) AS BIGINT) AS ecc8,
        |  CAST(count(*) AS BIGINT) AS n_reached
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      val e = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * 7 + 13) % n).as("dst")).transform(graft.plans.Lineage.truncate)
      var frontier = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("seed"), col("doc_id").as("node"),
          lit(0L).as("dist")).transform(graft.plans.Lineage.truncate)
      val levels = scala.collection.mutable.ArrayBuffer(frontier)
      def seen: DataFrame = levels.reduce(_ union _)
      var hop = 0
      while (hop < 8 && frontier.limit(1).count() > 0) {
        hop += 1
        frontier = e
          .join(frontier.withColumnRenamed("node", "src").drop("dist"), Seq("src"))
          .select(col("seed"), col("dst").as("node")).distinct()
          .join(seen.select(col("seed"), col("node")), Seq("seed", "node"),
            "left_anti")
          .withColumn("dist", lit(hop.toLong))
          .transform(graft.plans.Lineage.truncate)
        levels += frontier
      }
      seen.groupBy("seed")
        .agg(max("dist").as("ecc8"), count(lit(1)).as("n_reached"))
        .orderBy("seed")
    },

    // R139 — Adamic-Adar link prediction: gr8's common-neighbor
    // candidates reranked by Σ 1/ln(deg(w)) over the shared neighbors w
    // — a rare bridge node is worth more evidence than a hub everyone
    // touches. Same wedge join as gr8 (fan-out Σ d(v)², never n×n) with
    // the degree frame broadcast onto the shared-neighbor key; each
    // 1/ln(deg) weight is micro-quantized ONCE to a 1e6-unit BIGINT
    // (tx19's discipline — a common neighbor has deg ≥ 2 by
    // construction, so ln never sees 1) and the pair score is an EXACT
    // integer sum. Top-30 non-adjacent pairs under a total order.
    Q(
      "gr24_adamic_adar",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |adj AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT node AS nbr, CAST(count(*) AS BIGINT) AS dg
        |        FROM adj GROUP BY 1),
        |aa AS (SELECT a1.node AS a, a2.node AS b,
        |         CAST(count(*) AS BIGINT) AS common,
        |         CAST(sum(CAST(round(1000000 / ln(CAST(dg AS DOUBLE)))
        |                  AS BIGINT)) AS BIGINT) AS aa_e6
        |       FROM adj a1 JOIN adj a2 ON a1.nbr = a2.nbr AND a1.node < a2.node
        |         JOIN deg ON deg.nbr = a1.nbr
        |       GROUP BY 1, 2),
        |nonadj AS (SELECT aa.a, aa.b, aa.common, aa.aa_e6 FROM aa
        |           LEFT JOIN e ON aa.a = e.u AND aa.b = e.v
        |           WHERE e.u IS NULL)
        |SELECT a, b, common, aa_e6
        |FROM nonadj ORDER BY aa_e6 DESC, a, b LIMIT 30""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .transform(graft.plans.Lineage.truncate) // adjacency (twice), degrees, anti-join
      val adj = e.select(col("u").as("node"), col("v").as("nbr"))
        .unionByName(e.select(col("v").as("node"), col("u").as("nbr")))
      val deg = adj.groupBy("nbr").agg(count(lit(1)).as("dg"))
      val aa = adj.select(col("node").as("a"), col("nbr"))
        .join(adj.select(col("node").as("b"), col("nbr")), "nbr")
        .filter(col("a") < col("b"))
        // deg is NODE-sized — an honest equi-join on the wedge's shuffle
        // key (q53's no-broadcast lesson), never a broadcast
        .join(deg, Seq("nbr"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("common"),
          sum(round(lit(1000000) / log(col("dg").cast("double")))
            .cast("long")).as("aa_e6"))
      aa.join(e, aa("a") === e("u") && aa("b") === e("v"), "left_anti")
        .orderBy(desc("aa_e6"), col("a"), col("b")).limit(30)
    },

    // R142 — neighborhood-Jaccard link prediction: the third member of
    // the family (gr8 counts common neighbors, gr24 rarity-weights
    // them, this NORMALIZES by the union: J = |N(a)∩N(b)| /
    // (d(a)+d(b)−|∩|)) — a hub pair with 5 shared neighbors out of 200
    // scores far below a niche pair sharing 5 of 8. Unlike gr24 there
    // is NO transcendental anywhere: degrees join the pair frame on its
    // own endpoint keys (node-sized frame, honest shuffles, never a
    // broadcast) and the permille is exact integer DIV on positive
    // integers. Top-30 non-adjacent pairs under a total order.
    Q(
      "gr25_jaccard_links",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |adj AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg FROM adj GROUP BY 1),
        |cn AS (SELECT a1.node AS a, a2.node AS b, CAST(count(*) AS BIGINT) AS common
        |       FROM adj a1 JOIN adj a2 ON a1.nbr = a2.nbr AND a1.node < a2.node
        |       GROUP BY 1, 2),
        |sc AS (SELECT cn.a, cn.b, cn.common,
        |         (cn.common * 1000) // (da.dg + db.dg - cn.common) AS jac_permille
        |       FROM cn JOIN deg da ON da.node = cn.a
        |         JOIN deg db ON db.node = cn.b),
        |nonadj AS (SELECT sc.a, sc.b, sc.common, sc.jac_permille FROM sc
        |           LEFT JOIN e ON sc.a = e.u AND sc.b = e.v
        |           WHERE e.u IS NULL)
        |SELECT a, b, common, jac_permille
        |FROM nonadj ORDER BY jac_permille DESC, a, b LIMIT 30""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct()
        .transform(graft.plans.Lineage.truncate) // adjacency (twice), degrees, anti-join
      val adj = e.select(col("u").as("node"), col("v").as("nbr"))
        .unionByName(e.select(col("v").as("node"), col("u").as("nbr")))
      val deg = adj.groupBy("node").agg(count(lit(1)).as("dg"))
      val cn = adj.select(col("node").as("a"), col("nbr"))
        .join(adj.select(col("node").as("b"), col("nbr")), "nbr")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("common"))
      val sc = cn
        .join(deg.select(col("node").as("a"), col("dg").as("da")), Seq("a"))
        .join(deg.select(col("node").as("b"), col("dg").as("db")), Seq("b"))
        .select(col("a"), col("b"), col("common"),
          expr("(common * 1000) DIV (da + db - common)").as("jac_permille"))
      sc.join(e, sc("a") === e("u") && sc("b") === e("v"), "left_anti")
        .orderBy(desc("jac_permille"), col("a"), col("b")).limit(30)
    },

    // R149 — 4-cycle (square) census: the second motif beside gr3's
    // triangles — bipartite-ish cores and co-citation structure show up
    // as squares, not triangles. A square is determined by its two
    // OPPOSITE-corner pairs, so #C4 = Σ_{a<b} C(w(a,b), 2) / 2 with
    // w = common-neighbor counts — gr8's wedge join reused WITHOUT the
    // adjacency filter, one integer aggregate on top, and the halving
    // is provably exact (every square is counted by exactly two corner
    // pairs). No enumeration of the squares themselves ever happens —
    // the count comes off the wedge frame.
    Q(
      "gr27_squares",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |adj AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
        |cn AS (SELECT a1.node AS a, a2.node AS b, CAST(count(*) AS BIGINT) AS w
        |       FROM adj a1 JOIN adj a2 ON a1.nbr = a2.nbr AND a1.node < a2.node
        |       GROUP BY 1, 2)
        |SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
        |  CAST(count(*) AS BIGINT) AS n_corner_pairs,
        |  CAST(sum((w * (w - 1)) // 2) AS BIGINT) AS sum_c2,
        |  CAST(sum((w * (w - 1)) // 2) // 2 AS BIGINT) AS n_squares
        |FROM cn""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
        .transform(graft.plans.Lineage.truncate) // adjacency twice + edge count
      val adj = e.select(col("u").as("node"), col("v").as("nbr"))
        .unionByName(e.select(col("v").as("node"), col("u").as("nbr")))
      val cn = adj.select(col("node").as("a"), col("nbr"))
        .join(adj.select(col("node").as("b"), col("nbr")), "nbr")
        .filter(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("w"))
      val ne = e.agg(count(lit(1)).as("n_edges"))
      cn.agg(count(lit(1)).as("n_corner_pairs"),
          sum(expr("w * (w - 1) DIV 2")).as("sum_c2"))
        .crossJoin(broadcast(ne))
        .select(col("n_edges"), col("n_corner_pairs"), col("sum_c2"),
          expr("sum_c2 DIV 2").as("n_squares"))
    },

    // R156 — rich-club coefficient: do the hubs form their own dense
    // club? φ = 2·E_rich / (n_rich·(n_rich−1)) over the nodes above the
    // 90th-percentile degree — the threshold is an exact rank pick on
    // the DEGREE-CELL frame (ev19 discipline), membership is a
    // node-sized semi-join, E_rich one edge pass against the member
    // set, and φ is an exact integer permille. Everything after the
    // degree aggregate is node- or club-sized.
    Q(
      "gr28_rich_club",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg
        |        FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |        GROUP BY 1),
        |cells AS (SELECT dg, count(*) AS cnt FROM deg GROUP BY 1),
        |rk AS (SELECT dg,
        |    sum(cnt) OVER (ORDER BY dg ROWS BETWEEN UNBOUNDED PRECEDING
        |                   AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER () AS tot
        |  FROM cells),
        |thr AS (SELECT min(dg) AS t FROM rk WHERE 10 * cum >= 9 * tot),
        |rich AS (SELECT node FROM deg CROSS JOIN thr WHERE dg >= t),
        |er AS (SELECT CAST(count(*) AS BIGINT) AS e_rich
        |       FROM e JOIN rich r1 ON e.u = r1.node
        |              JOIN rich r2 ON e.v = r2.node),
        |nr AS (SELECT CAST(count(*) AS BIGINT) AS n_rich FROM rich)
        |SELECT (SELECT t FROM thr) AS deg_threshold, n_rich, e_rich,
        |  CASE WHEN n_rich < 2 THEN NULL
        |       ELSE (2 * e_rich * 1000) // (n_rich * (n_rich - 1)) END
        |    AS phi_permille
        |FROM nr CROSS JOIN er""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
        .transform(graft.plans.Lineage.truncate) // degrees + both member joins
      val deg = e.select(col("u").as("node"))
        .unionByName(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("dg"))
        .transform(graft.plans.Lineage.truncate) // cells + membership read it
      val cells = deg.groupBy("dg").agg(count(lit(1)).as("cnt"))
      // degree-value cells grow with the graph — blocked cumulative (r7)
      val tot0 = cells.agg(sum("cnt").as("tot"))
      val rk = graft.operators.Blocked
        .cumulative(cells, Seq(col("dg")), Seq("cnt"))
        .withColumnRenamed("cum_cnt", "cum")
        .crossJoin(broadcast(tot0))
      val thr = rk.filter(lit(10) * col("cum") >= lit(9) * col("tot"))
        .agg(min("dg").as("t"))
      val rich = deg.crossJoin(broadcast(thr)).filter(col("dg") >= col("t"))
        .select("node")
      val er = e.join(rich.select(col("node").as("u")), "u")
        .join(rich.select(col("node").as("v")), "v")
        .agg(count(lit(1)).as("e_rich"))
      val nr = rich.agg(count(lit(1)).as("n_rich"))
      nr.crossJoin(er).crossJoin(broadcast(thr))
        .select(col("t").as("deg_threshold"), col("n_rich"), col("e_rich"),
          when(col("n_rich") < 2, lit(null))
            .otherwise(expr("(2 * e_rich * 1000) DIV (n_rich * (n_rich - 1))"))
            .as("phi_permille"))
    },

    // R157 — degree-distribution Gini (inequality of attention): gr7
    // histograms the degrees, tx23 fits their Zipf slope, THIS gives
    // the one-number concentration readout (0 = egalitarian mesh, →1 =
    // hub-dominated). The rank-weighted sum runs on DEGREE CELLS: a
    // value dg with count c occupying ranks R+1..R+c contributes
    // dg·(c·R + c(c+1)/2) EXACTLY, so G = (2S − (n+1)T)/(nT) is one
    // double of exact integers, e6-quantized. Windows only on the
    // cell frame.
    Q(
      "gr29_degree_gini",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS dg
        |        FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |        GROUP BY 1),
        |cells AS (SELECT dg, CAST(count(*) AS BIGINT) AS c FROM deg GROUP BY 1),
        |rk AS (SELECT dg, c,
        |    coalesce(sum(c) OVER (ORDER BY dg
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r
        |  FROM cells),
        |m AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |        CAST(sum(dg * c) AS BIGINT) AS t,
        |        CAST(sum(CAST(dg AS HUGEINT) * (c * r + (c * (c + 1)) // 2))
        |          AS HUGEINT) AS s
        |      FROM rk)
        |SELECT n, t AS sum_degrees,
        |  CAST(round(1000000 * (2 * CAST(s AS DOUBLE) - CAST(n + 1 AS DOUBLE) * t)
        |    / (CAST(n AS DOUBLE) * t)) AS BIGINT) AS gini_e6
        |FROM m""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
      val deg = e.select(col("u").as("node"))
        .unionByName(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("dg"))
      val cells = deg.groupBy("dg").agg(count(lit(1)).as("c"))
      // degree-value cells grow with the graph — blocked strict-prefix
      // cumulative (inclusive minus own count), never one reducer (r7)
      val rk = graft.operators.Blocked
        .cumulative(cells, Seq(col("dg")), Seq("c"))
        .withColumn("r", col("cum_c") - col("c"))
        .drop("cum_c")
      val m = rk.agg(sum("c").as("n"), sum(col("dg") * col("c")).as("t"),
        sum(dec(col("dg"))
          * (col("c") * col("r") + expr("(c * (c + 1)) DIV 2"))).as("s"))
      m.select(col("n"), col("t").as("sum_degrees"),
        round(lit(1000000)
          * (lit(2) * col("s").cast("double")
            - (col("n") + 1).cast("double") * col("t"))
          / (col("n").cast("double") * col("t"))).cast("long").as("gini_e6"))
    },

    // R158b — label-mixing (discrete) assortativity: gr10 asks whether
    // HIGH-DEGREE nodes stick together, this asks whether SAME-LANGUAGE
    // documents do — the homophily number. Edges doubled to ordered
    // pairs (the standard symmetric treatment), e-matrix counts and
    // marginals are exact integers, and Newman's r = (m·Σe_ii − Σrow²)
    // / (m² − Σrow²) is one quantized double of exact integer
    // cross-multiplies (wide products in decimal(38,0)/HUGEINT). All
    // frames after the edge join are |langs|²-sized.
    Q(
      "gr30_label_mixing",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |lab AS (SELECT doc_id, lang FROM documents),
        |de AS (SELECT u AS x, v AS y FROM e UNION ALL SELECT v, u FROM e),
        |le AS (SELECT la.lang AS lx, lb.lang AS ly
        |       FROM de JOIN lab la ON de.x = la.doc_id
        |               JOIN lab lb ON de.y = lb.doc_id),
        |em AS (SELECT lx, ly, CAST(count(*) AS BIGINT) AS c FROM le GROUP BY 1, 2),
        |m AS (SELECT CAST(sum(c) AS BIGINT) AS m2,
        |        CAST(sum(CASE WHEN lx = ly THEN c ELSE 0 END) AS BIGINT) AS diag
        |      FROM em),
        |rows_ AS (SELECT lx, CAST(sum(c) AS BIGINT) AS rs FROM em GROUP BY 1),
        |sq AS (SELECT CAST(sum(CAST(rs AS HUGEINT) * rs) AS HUGEINT) AS sumrow2
        |       FROM rows_)
        |SELECT m2, diag,
        |  CAST(round(1000000
        |    * (CAST(m2 AS DOUBLE) * diag - CAST(sumrow2 AS DOUBLE))
        |    / (CAST(m2 AS DOUBLE) * m2 - CAST(sumrow2 AS DOUBLE))) AS BIGINT)
        |    AS assortativity_e6
        |FROM m CROSS JOIN sq""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
      val de = e.select(col("u").as("x"), col("v").as("y"))
        .unionByName(e.select(col("v").as("x"), col("u").as("y")))
      val em = de
        .join(docs.select(col("doc_id").as("x"), col("lang").as("lx")), "x")
        .join(docs.select(col("doc_id").as("y"), col("lang").as("ly")), "y")
        .groupBy("lx", "ly").agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // totals + marginals read it
      val m = em.agg(sum("c").as("m2"),
        sum(when(col("lx") === col("ly"), col("c")).otherwise(0L)).as("diag"))
      val sq = em.groupBy("lx").agg(sum("c").as("rs"))
        .agg(sum(dec(col("rs")) * col("rs")).as("sumrow2"))
      m.crossJoin(sq)
        .select(col("m2"), col("diag"),
          round(lit(1000000)
            * (col("m2").cast("double") * col("diag")
              - col("sumrow2").cast("double"))
            / (col("m2").cast("double") * col("m2")
              - col("sumrow2").cast("double"))).cast("long")
            .as("assortativity_e6"))
    },

    // R160 — two-hop reach (friend-of-friend audience size): the
    // influence number a direct degree misses — a modest-degree node
    // wired to hubs reaches more in two hops than a hub wired to
    // leaves. DISTINCT 2-hop neighbors per node (self and directs
    // excluded) via one wedge join + distinct on the wedge's own
    // shuffle keys; top-20 under a total order. Candidate volume is
    // O(Σdeg²)-bounded like gr8, never n².
    Q(
      "gr31_two_hop",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents) FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents) FROM documents),
        |e AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |adj AS (SELECT u AS node, v AS nbr FROM e UNION ALL SELECT v, u FROM e),
        |two AS (
        |  SELECT DISTINCT a1.node, a2.nbr AS hop2
        |  FROM adj a1 JOIN adj a2 ON a1.nbr = a2.node
        |  WHERE a2.nbr <> a1.node),
        |pure AS (
        |  SELECT t.node, t.hop2 FROM two t
        |  LEFT JOIN adj d ON t.node = d.node AND t.hop2 = d.nbr
        |  WHERE d.node IS NULL),
        |reach AS (SELECT node, CAST(count(*) AS BIGINT) AS reach2
        |          FROM pure GROUP BY 1)
        |SELECT node, reach2 FROM reach
        |ORDER BY reach2 DESC, node LIMIT 20""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
        .transform(graft.plans.Lineage.truncate) // wedge + direct anti-join
      val adj = e.select(col("u").as("node"), col("v").as("nbr"))
        .unionByName(e.select(col("v").as("node"), col("u").as("nbr")))
      val two = adj.select(col("node"), col("nbr").as("mid"))
        .join(adj.select(col("node").as("mid"), col("nbr").as("hop2")), "mid")
        .filter(col("hop2") =!= col("node"))
        .select("node", "hop2").distinct()
      val pure = two.join(adj.select(col("node"), col("nbr").as("hop2")),
        Seq("node", "hop2"), "left_anti")
      pure.groupBy("node").agg(count(lit(1)).as("reach2"))
        .orderBy(desc("reach2"), col("node")).limit(20)
    },

    // R147 — Borůvka minimum spanning forest over the doc graph (see
    // mstBoruvka). Weights are md5-derived 60-bit positive BIGINTs —
    // distinct with overwhelming probability, so the forest is UNIQUE
    // and the stability hash pins the exact edge set; the struct total
    // order (w, u, v) settles any residual tie deterministically.
    // Rows-only: the per-round argmin + contraction fixpoint has no
    // bounded SQL unroll (data-dependent round count); MstSpec pins the
    // algorithm against an in-test Kruskal on known graphs.
    Q("gr26_mst", mstUnrolledOracle) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
        .withColumn("w", expr(
          """CAST(conv(substr(md5(concat(CAST(u AS STRING), ':',
            |  CAST(v AS STRING))), 1, 15), 16, 10) AS BIGINT)""".stripMargin))
      mstBoruvka(e).orderBy("u", "v")
    },

    // R169 — Katz centrality, 6 unrolled rounds in EXACT integer
    // algebra (the gr12/gr2 recipe applied to the third classic
    // centrality): with α = 1/8 and X_t = 8^t·x_t, the recurrence
    // x_{t+1} = 1 + α·Σ_in x_t becomes the all-integer
    // X_{t+1}(v) = 8^{t+1} + Σ_{u→v} X_t(u) — no float ever appears,
    // and the generated oracle unrolls the same six rounds as
    // MATERIALIZED CTEs. Each round is ONE edges⨝scores join + one
    // map-side-combinable sum, shuffling on the join key only;
    // Lineage.truncate caps planner stats per round. In-degree ≤3 on
    // the 3-map functional graph bounds X_6 well under 2^63 (and the
    // α < 1/λ_max convergence condition is irrelevant at a fixed
    // unroll depth). Top-20 under the (score, node) total order.
    Q("gr32_katz", katzUnrolledOracle) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * mult + add) % n).as("dst"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("src") =!= col("dst")).distinct()
        .transform(graft.plans.Lineage.truncate) // read 6×2 times below
      val nodes = e.select(col("src").as("node"))
        .unionByName(e.select(col("dst").as("node"))).distinct()
        .transform(graft.plans.Lineage.truncate)
      var x = nodes.withColumn("katz", lit(1L))
      var pow8 = 1L
      for (_ <- 1 to 6) {
        pow8 *= 8L
        val inflow = e.join(x.withColumnRenamed("node", "src"), "src")
          .groupBy(col("dst").as("nd")).agg(sum("katz").as("inflow"))
        x = graft.plans.Lineage.truncate(
          nodes.join(inflow, col("node") === col("nd"), "left")
            .select(col("node"),
              (coalesce(col("inflow"), lit(0L)) + lit(pow8)).as("katz")))
      }
      x.select(col("node"), col("katz").as("katz_scaled"))
        .orderBy(desc("katz_scaled"), col("node")).limit(20)
    },

    // R184 — network robustness under targeted attack: remove the
    // top-10 hubs (by undirected degree, total-ordered) and compare
    // the component structure against the intact graph — the
    // percolation readout (does the graph shatter or hold when its
    // hubs go). Largest-CC share is THE robustness number in network
    // science. Scale: hub pick is a distributed top-k (orderBy+limit,
    // TakeOrderedAndProject — never a global rank window), removal is
    // two broadcast anti-joins, components run dd5's pointer-jumping
    // CC (O(log diameter) rounds); isolated survivors enter the
    // component count as singletons without materializing them. The
    // oracle replays both scenarios with recursive-CTE closures
    // (gr14's pattern, fine at oracle scale).
    Q(
      "gr33_robustness",
      """WITH RECURSIVE e0 AS (
        |  SELECT doc_id AS a,
        |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |eu AS MATERIALIZED (
        |  SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |  FROM e0 WHERE a <> b),
        |nodes AS MATERIALIZED (SELECT DISTINCT nd FROM (
        |  SELECT u AS nd FROM eu UNION ALL SELECT v FROM eu)),
        |deg AS (SELECT nd, count(*) AS dg FROM (
        |  SELECT u AS nd FROM eu UNION ALL SELECT v AS nd FROM eu) GROUP BY 1),
        |hubs AS MATERIALIZED (SELECT nd FROM deg ORDER BY dg DESC, nd LIMIT 10),
        |symf AS MATERIALIZED (
        |  SELECT u AS a, v AS b FROM eu UNION ALL SELECT v, u FROM eu),
        |rf AS (SELECT a, b FROM symf
        |       UNION
        |       SELECT r.a, s.b FROM rf r JOIN symf s ON s.a = r.b),
        |compf AS (SELECT a AS nd, min(b) AS comp FROM (
        |  SELECT a, b FROM rf UNION ALL SELECT nd, nd FROM nodes) GROUP BY 1),
        |szf AS (SELECT comp, count(*) AS sz FROM compf GROUP BY 1),
        |ea AS MATERIALIZED (SELECT u, v FROM eu
        |  WHERE u NOT IN (SELECT nd FROM hubs)
        |    AND v NOT IN (SELECT nd FROM hubs)),
        |rem AS MATERIALIZED (SELECT nd FROM nodes
        |  WHERE nd NOT IN (SELECT nd FROM hubs)),
        |syma AS MATERIALIZED (
        |  SELECT u AS a, v AS b FROM ea UNION ALL SELECT v, u FROM ea),
        |ra AS (SELECT a, b FROM syma
        |       UNION
        |       SELECT r.a, s.b FROM ra r JOIN syma s ON s.a = r.b),
        |compa AS (SELECT a AS nd, min(b) AS comp FROM (
        |  SELECT a, b FROM ra UNION ALL SELECT nd, nd FROM rem) GROUP BY 1),
        |sza AS (SELECT comp, count(*) AS sz FROM compa GROUP BY 1)
        |SELECT 'attacked' AS scenario,
        |  CAST((SELECT count(*) FROM rem) AS BIGINT) AS n_nodes,
        |  CAST(count(*) AS BIGINT) AS n_components,
        |  CAST(max(sz) AS BIGINT) AS largest_cc,
        |  CAST((max(sz) * 1000) // (SELECT count(*) FROM rem) AS BIGINT) AS largest_share_pm
        |FROM sza
        |UNION ALL
        |SELECT 'full',
        |  CAST((SELECT count(*) FROM nodes) AS BIGINT),
        |  CAST(count(*) AS BIGINT), CAST(max(sz) AS BIGINT),
        |  CAST((max(sz) * 1000) // (SELECT count(*) FROM nodes) AS BIGINT)
        |FROM szf
        |ORDER BY scenario""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val eu = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")).distinct()
        .transform(graft.plans.Lineage.truncate) // degree + both scenarios
      val nodes = eu.select(col("u").as("nd"))
        .unionByName(eu.select(col("v").as("nd"))).distinct()
        .transform(graft.plans.Lineage.truncate)
      val deg = eu.select(col("u").as("nd"))
        .unionByName(eu.select(col("v").as("nd")))
        .groupBy("nd").agg(count(lit(1)).as("dg"))
      val hubs = deg.orderBy(desc("dg"), col("nd")).limit(10).select("nd")
        .localCheckpoint(true) // two anti-joins + the node filter
      def profile(pairs: org.apache.spark.sql.DataFrame,
                  universe: org.apache.spark.sql.DataFrame,
                  scen: String) = {
        val cc = Dedup.connectedComponents(
          pairs.select(col("u").as("id_a"), col("v").as("id_b")))
        val sz = cc.groupBy("component").agg(count(lit(1)).as("sz"))
        val es0 = sz.agg(count(lit(1)).as("nc_edge"),
          coalesce(max("sz"), lit(0L)).as("largest_edge"),
          coalesce(sum("sz"), lit(0L)).as("edge_nodes"))
        val uni = universe.agg(count(lit(1)).as("n_nodes"))
        es0.crossJoin(uni).select(
          lit(scen).as("scenario"), col("n_nodes"),
          (col("nc_edge") + col("n_nodes") - col("edge_nodes")).as("n_components"),
          // an all-isolated survivor set still has components of size 1
          greatest(col("largest_edge"),
            when(col("n_nodes") > col("edge_nodes"), 1L).otherwise(0L))
            .as("largest_cc"))
          .withColumn("largest_share_pm",
            expr("(largest_cc * 1000) DIV n_nodes"))
      }
      val hubB = broadcast(hubs)
      val ea = eu
        .join(hubB.withColumnRenamed("nd", "u"), Seq("u"), "left_anti")
        .join(hubB.withColumnRenamed("nd", "v"), Seq("v"), "left_anti")
      val rem = nodes.join(hubB, Seq("nd"), "left_anti")
      profile(ea, rem, "attacked")
        .unionByName(profile(eu, nodes, "full"))
        .orderBy("scenario")
    },

    // R187 — average-neighbour-degree profile knn(k): gr10's
    // assortativity is the scalar, this is the CURVE (is the mixing
    // monotone, or hub-avoidance only above a degree knee). Per degree
    // class k: the edge-weighted mean neighbour degree —
    // Σ_{nodes of deg k} Σ_nbr deg(nbr) DIV Σ_{deg k} k — exact
    // integers end to end. Scale: degree frame is node-sized; the
    // nbr-degree lookup is ONE self-equi-join of the symmetric edge
    // list against the degree frame (shuffles on the join key); the
    // profile aggregate lands on |distinct degrees| rows.
    Q(
      "gr34_knn_profile",
      """WITH e0 AS (
        |  SELECT doc_id AS a,
        |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |eu AS MATERIALIZED (
        |  SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |  FROM e0 WHERE a <> b),
        |adj AS (SELECT u AS node, v AS nbr FROM eu
        |        UNION ALL SELECT v, u FROM eu),
        |deg AS MATERIALIZED (
        |  SELECT node, CAST(count(*) AS BIGINT) AS dg FROM adj GROUP BY 1),
        |j AS (SELECT a.node, dn.dg AS nbr_dg
        |      FROM adj a JOIN deg dn ON dn.node = a.nbr),
        |pn AS (SELECT j.node, d.dg, CAST(sum(j.nbr_dg) AS BIGINT) AS s
        |       FROM j JOIN deg d ON d.node = j.node GROUP BY 1, 2)
        |SELECT dg AS k,
        |  CAST(count(*) AS BIGINT) AS n_nodes,
        |  CAST((100 * sum(s)) // sum(dg) AS BIGINT) AS avg_nbr_deg_e2
        |FROM pn GROUP BY dg ORDER BY dg""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val eu = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")).distinct()
        .transform(graft.plans.Lineage.truncate)
      val adj = eu.select(col("u").as("node"), col("v").as("nbr"))
        .unionByName(eu.select(col("v").as("node"), col("u").as("nbr")))
      val deg = adj.groupBy("node").agg(count(lit(1)).as("dg"))
        .transform(graft.plans.Lineage.truncate) // both sides of the lookup
      val j = adj.join(deg.select(col("node").as("nbr"), col("dg").as("nbr_dg")), "nbr")
        .select("node", "nbr_dg")
      val pn = j.join(deg, "node")
        .groupBy("node", "dg").agg(sum("nbr_dg").as("s"))
      pn.groupBy(col("dg").as("k"))
        .agg(count(lit(1)).as("n_nodes"),
          expr("(100 * sum(s)) DIV sum(dg)").as("avg_nbr_deg_e2"))
        .orderBy("k")
    },

    // R192 — triangle-motif significance vs the configuration model:
    // gr3 counts triangles, this asks whether that count MEANS
    // anything — observed T against the degree-sequence-preserving
    // null E[T] = (M2/M1)³/6 (M1=Σd, M2=Σd(d−1); Newman's closed
    // form), ratio > 1 ⇒ genuine triadic closure. Both moments are
    // exact integer sums off the node-sized degree frame; the
    // expectation and ratio are single double expressions of exact
    // sub-2⁵³ ints (identical trees both engines), e6-rounded. The
    // triangle count reuses gr3's two-join wedge+adjacency plan,
    // reduced to ONE scalar.
    Q(
      "gr35_motif_z",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |e AS MATERIALIZED (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |tri AS (SELECT CAST(count(*) AS BIGINT) AS t
        |        FROM e e1 JOIN e e2 ON e1.v = e2.u
        |        JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |deg AS (SELECT nd, CAST(count(*) AS BIGINT) AS dg FROM (
        |  SELECT u AS nd FROM e UNION ALL SELECT v AS nd FROM e) GROUP BY 1),
        |m AS (SELECT CAST(sum(dg) AS BIGINT) AS m1,
        |        CAST(sum(dg*(dg-1)) AS BIGINT) AS m2 FROM deg)
        |SELECT t AS triangles, m1, m2,
        |  CAST(round(1000000 * (CAST(m2 AS DOUBLE)/m1) * (CAST(m2 AS DOUBLE)/m1)
        |    * (CAST(m2 AS DOUBLE)/m1) / 6) AS BIGINT) AS expected_e6,
        |  CAST(round(1000000 * 6 * CAST(t AS DOUBLE) * m1 * m1 * m1
        |    / (CAST(m2 AS DOUBLE) * m2 * m2)) AS BIGINT) AS ratio_e6
        |FROM tri, m""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")).distinct()
        .transform(graft.plans.Lineage.truncate) // triangle joins + degrees
      val wedges = e.select(col("u"), col("v"))
        .join(e.select(col("u").as("v"), col("v").as("w")), "v")
      val tri = wedges.join(e.select(col("u"), col("v").as("w")), Seq("u", "w"))
        .agg(count(lit(1)).as("t"))
      val deg = e.select(col("u").as("nd"))
        .unionByName(e.select(col("v").as("nd")))
        .groupBy("nd").agg(count(lit(1)).as("dg"))
      val m = deg.agg(sum("dg").as("m1"), sum(expr("dg*(dg-1)")).as("m2"))
      tri.crossJoin(broadcast(m))
        .select(col("t").as("triangles"), col("m1"), col("m2"),
          expr("""CAST(round(1000000 * (CAST(m2 AS DOUBLE)/m1) * (CAST(m2 AS DOUBLE)/m1)
            | * (CAST(m2 AS DOUBLE)/m1) / 6) AS BIGINT)""".stripMargin).as("expected_e6"),
          expr("""CAST(round(1000000 * 6 * CAST(t AS DOUBLE) * m1 * m1 * m1
            | / (CAST(m2 AS DOUBLE) * m2 * m2)) AS BIGINT)""".stripMargin).as("ratio_e6"))
    },

    // R207 — sparse matrix multiplication as a relational primitive:
    // A² of the directed adjacency matrix — (i,k)⨝(k,j) equi-join +
    // sum per (i,j) — IS distributed spmm (the GraphBLAS/MapReduce
    // matmul everyone builds on); entries of A² count length-2 WALKS
    // with multiplicity, which is what gr31's DISTINCT two-hop
    // deliberately is not. One shuffle on the contraction key k, one
    // on the output key (i,j); fan-out Σ din(k)·dout(k), never n².
    // Top-20 cells under the (count, i, j) total order.
    Q(
      "gr36_matmul",
      """WITH e0 AS (
        |  SELECT doc_id AS i,
        |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS j
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |a AS MATERIALIZED (SELECT DISTINCT i, j FROM e0 WHERE i <> j),
        |m AS (SELECT x.i, y.j, CAST(count(*) AS BIGINT) AS walks
        |      FROM a x JOIN a y ON x.j = y.i GROUP BY 1, 2)
        |SELECT i, j, walks FROM m
        |ORDER BY walks DESC, i, j LIMIT 20""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("i"),
        ((col("doc_id") * mult + add) % n).as("j"))
      val a = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("i") =!= col("j")).distinct()
        .transform(graft.plans.Lineage.truncate) // both sides of the spmm
      a.select(col("i"), col("j").as("k"))
        .join(a.select(col("i").as("k"), col("j")), "k")
        .groupBy("i", "j").agg(count(lit(1)).as("walks"))
        .orderBy(desc("walks"), col("i"), col("j")).limit(20)
    },

    // R219 — graph-signal smoothness (Dirichlet energy vs the random
    // null): is the n_chars signal SMOOTH on the doc graph — mean
    // edge energy Σ(x_u−x_v)²/m against its random-pairing
    // expectation 2·var(x); ratio < 1e6 means linked docs look alike
    // (the numeric cousin of gr30's categorical homophily, and the
    // quantity every label-propagation/GNN smoothing step implicitly
    // minimizes). Exact throughout: edge energy and the variance
    // identity are integer sums, the ratio ONE floor DIV in
    // decimal(38,0)/HUGEINT — (10⁶·num·n²) passes 2⁶³ by design.
    // Two edges⨝signal equi-joins; everything else is 1-row frames.
    Q(
      "gr37_smoothness",
      """WITH e0 AS (
        |  SELECT doc_id AS a,
        |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |eu AS MATERIALIZED (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM e0 WHERE a <> b),
        |x AS (SELECT doc_id, n_chars AS x FROM documents),
        |en AS (SELECT CAST(count(*) AS BIGINT) AS m,
        |         CAST(sum(CAST(xu.x - xv.x AS HUGEINT) * (xu.x - xv.x)) AS HUGEINT) AS num
        |       FROM eu JOIN x xu ON eu.u = xu.doc_id
        |               JOIN x xv ON eu.v = xv.doc_id),
        |mo AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
        |         CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
        |       FROM x)
        |SELECT mo.n AS n_nodes, en.m AS n_edges,
        |  CAST(en.num AS BIGINT) AS energy,
        |  CAST((1000000 * en.num * mo.n * mo.n)
        |       // (2 * en.m * (mo.n * mo.q - CAST(mo.s AS HUGEINT) * mo.s))
        |       AS BIGINT) AS smoothness_e6
        |FROM en, mo""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val eu = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")).distinct()
      val x = docs.select(col("doc_id"), col("n_chars").as("x"))
      val en = eu
        .join(x.select(col("doc_id").as("u"), col("x").as("xu")), "u")
        .join(x.select(col("doc_id").as("v"), col("x").as("xv")), "v")
        .agg(count(lit(1)).as("m"),
          sum(expr("CAST(xu - xv AS DECIMAL(38,0)) * (xu - xv)"))
            .cast("decimal(38,0)").as("num"))
      val mo = x.agg(count(lit(1)).as("n"), sum("x").as("s"),
        sum(expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").as("q"))
      en.crossJoin(broadcast(mo))
        .select(col("n").as("n_nodes"), col("m").as("n_edges"),
          col("num").cast("long").as("energy"),
          expr("""CAST((1000000 * num * n * n)
            | DIV (2 * m * (n * q - CAST(s AS DECIMAL(38,0)) * s))
            | AS BIGINT)""".stripMargin).as("smoothness_e6"))
    },

    // R229 — multiplex layer overlap: the 3-map doc graph is really
    // three LAYERS of one multiplex network — how similar are they?
    // Pairwise edge-set Jaccard (undirected canonical edges per
    // layer, distinct within layer, intersection via inner join,
    // union by inclusion–exclusion) — the multiplex redundancy
    // readout (near-duplicate layers add no structure). Each layer
    // is one scan-local map; pair joins shuffle on the edge key;
    // 3 output rows.
    Q(
      "gr38_layer_overlap",
      """WITH l1 AS (SELECT DISTINCT least(doc_id, (doc_id*7+13) % (SELECT count(*) FROM documents)) AS u,
        |    greatest(doc_id, (doc_id*7+13) % (SELECT count(*) FROM documents)) AS v
        |  FROM documents
        |  WHERE doc_id <> (doc_id*7+13) % (SELECT count(*) FROM documents)),
        |l2 AS (SELECT DISTINCT least(doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents)) AS u,
        |    greatest(doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents)) AS v
        |  FROM documents
        |  WHERE doc_id <> (doc_id*3+5) % (SELECT count(*) FROM documents)),
        |l3 AS (SELECT DISTINCT least(doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents)) AS u,
        |    greatest(doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents)) AS v
        |  FROM documents
        |  WHERE doc_id <> (doc_id*11+2) % (SELECT count(*) FROM documents)),
        |p12 AS (SELECT '1-2' AS pair,
        |    (SELECT CAST(count(*) AS BIGINT) FROM l1) AS na,
        |    (SELECT CAST(count(*) AS BIGINT) FROM l2) AS nb,
        |    (SELECT CAST(count(*) AS BIGINT) FROM l1 JOIN l2 USING (u, v)) AS ni),
        |p13 AS (SELECT '1-3',
        |    (SELECT CAST(count(*) AS BIGINT) FROM l1),
        |    (SELECT CAST(count(*) AS BIGINT) FROM l3),
        |    (SELECT CAST(count(*) AS BIGINT) FROM l1 JOIN l3 USING (u, v))),
        |p23 AS (SELECT '2-3',
        |    (SELECT CAST(count(*) AS BIGINT) FROM l2),
        |    (SELECT CAST(count(*) AS BIGINT) FROM l3),
        |    (SELECT CAST(count(*) AS BIGINT) FROM l2 JOIN l3 USING (u, v))),
        |u AS (SELECT * FROM p12 UNION ALL SELECT * FROM p13
        |      UNION ALL SELECT * FROM p23)
        |SELECT pair, na AS edges_a, nb AS edges_b, ni AS common,
        |  (ni * 1000) // (na + nb - ni) AS jaccard_pm
        |FROM u ORDER BY pair""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def layer(mult: Int, add: Int) = docs
        .select(col("doc_id").as("a"), ((col("doc_id") * mult + add) % n).as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")).distinct()
        .transform(graft.plans.Lineage.truncate) // two pair joins each
      val l = Seq(layer(7, 13), layer(3, 5), layer(11, 2))
      def pair(name: String, a: org.apache.spark.sql.DataFrame,
               b: org.apache.spark.sql.DataFrame) = {
        val na = a.count(); val nb = b.count()
        val ni = a.join(b, Seq("u", "v")).count()
        (name, na, nb, ni)
      }
      val rows = Seq(pair("1-2", l(0), l(1)), pair("1-3", l(0), l(2)),
        pair("2-3", l(1), l(2)))
      import s.implicits._
      rows.toDF("pair", "edges_a", "edges_b", "common")
        .withColumn("jaccard_pm",
          expr("(common * 1000) DIV (edges_a + edges_b - common)"))
        .orderBy("pair")
    },

    // R234 — hop plot (distance distribution from a seed set): how
    // many docs sit at each BFS distance from the first 12 seeds —
    // the classic reachability-growth curve (a plateau means the
    // frontier saturated; gr23's eccentricity is its per-node max).
    // Runs the shared iterative [[bfs]] (per-round frontier joins,
    // min-dist dedup, Lineage-truncated) and histograms the
    // (node, dist) frame; the oracle replays it as a bounded
    // recursive CTE with min-dist dedup.
    Q(
      "gr39_hop_plot",
      """WITH RECURSIVE e AS (
        |  SELECT doc_id AS src,
        |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |r AS (
        |  SELECT doc_id AS node, 0 AS dist FROM documents WHERE doc_id < 12
        |  UNION ALL
        |  SELECT e.dst, r.dist + 1 FROM r JOIN e ON e.src = r.node
        |  WHERE r.dist < 4 AND e.src <> e.dst),
        |m AS (SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM r GROUP BY 1)
        |SELECT dist, CAST(count(*) AS BIGINT) AS n_nodes
        |FROM m GROUP BY dist ORDER BY dist""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * mult + add) % n).as("dst"))
      val e = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("src") =!= col("dst"))
      val seeds = docs.filter(col("doc_id") < 12).select(col("doc_id").as("node"))
      bfs(e, seeds, maxHops = 4)
        .groupBy("dist").agg(count(lit(1)).as("n_nodes"))
        .orderBy("dist")
    },

    // R235 — degree-distribution entropy: the one-number diversity of
    // the degree sequence beside gr29's Gini (entropy reads evenness,
    // Gini reads concentration — a regular graph maxes one and zeroes
    // the other). H = Σ (cnt·⌊10⁶·log2(n/cnt)⌉) DIV n over degree
    // CELLS — the tx27 quantize-once discipline, exact integer sums,
    // cells bounded by |distinct degrees|.
    Q(
      "gr40_degree_entropy",
      """WITH e0 AS (
        |  SELECT doc_id AS a,
        |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |eu AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |       FROM e0 WHERE a <> b),
        |deg AS (SELECT nd, CAST(count(*) AS BIGINT) AS dg FROM (
        |  SELECT u AS nd FROM eu UNION ALL SELECT v AS nd FROM eu) GROUP BY 1),
        |cells AS (SELECT dg, CAST(count(*) AS BIGINT) AS cnt FROM deg GROUP BY 1),
        |n AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM cells)
        |SELECT n.n AS n_nodes,
        |  CAST(count(*) AS BIGINT) AS n_degree_classes,
        |  CAST(sum(cnt * CAST(round(1000000 *
        |    log2(CAST(n.n AS DOUBLE) / cnt)) AS BIGINT)) // n.n AS BIGINT)
        |    AS entropy_e6
        |FROM cells, n GROUP BY n.n""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val eu = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")).distinct()
      val deg = eu.select(col("u").as("nd"))
        .unionByName(eu.select(col("v").as("nd")))
        .groupBy("nd").agg(count(lit(1)).as("dg"))
      val cells = deg.groupBy("dg").agg(count(lit(1)).as("cnt"))
      val nn = cells.agg(sum("cnt").as("n"))
      cells.crossJoin(broadcast(nn))
        .groupBy("n")
        .agg(count(lit(1)).as("n_degree_classes"),
          expr("""CAST(sum(cnt * CAST(round(1000000 *
            | log2(CAST(n AS DOUBLE) / cnt)) AS BIGINT)) DIV n AS BIGINT)"""
            .stripMargin).as("entropy_e6"))
        .select(col("n").as("n_nodes"), col("n_degree_classes"), col("entropy_e6"))
    },

    // R240 — local bridges (Granovetter's weak ties): edges whose
    // endpoints share NO common neighbour — removing one lengthens
    // its endpoints' distance past 2, so these are the edges holding
    // communities together (gr3/gr9 count the CLOSED triangles; this
    // finds the edges in none). Common-neighbour counts per EDGE come
    // from one wedge join aggregated onto the edge key, then a
    // left-anti against the edge list; summary + the first-20 bridge
    // edges under a total order. All shuffles on edge/wedge keys.
    Q(
      "gr41_local_bridges",
      """WITH e0 AS (
        |  SELECT doc_id AS a,
        |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |eu AS MATERIALIZED (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM e0 WHERE a <> b),
        |adj AS (SELECT u AS node, v AS nbr FROM eu
        |        UNION ALL SELECT v, u FROM eu),
        |closed AS (
        |  SELECT DISTINCT e.u, e.v
        |  FROM eu e
        |  JOIN adj a1 ON a1.node = e.u
        |  JOIN adj a2 ON a2.node = e.v AND a2.nbr = a1.nbr),
        |bridges AS (
        |  SELECT e.u, e.v FROM eu e
        |  LEFT JOIN closed c ON c.u = e.u AND c.v = e.v
        |  WHERE c.u IS NULL)
        |SELECT CAST((SELECT count(*) FROM eu) AS BIGINT) AS n_edges,
        |  CAST(count(*) AS BIGINT) AS n_local_bridges,
        |  CAST((count(*) * 1000) // (SELECT count(*) FROM eu) AS BIGINT)
        |    AS bridge_share_pm,
        |  CAST(min(u * 100000000 + v) AS BIGINT) AS first_bridge_key
        |FROM bridges""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val eu = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")).distinct()
        .transform(graft.plans.Lineage.truncate) // adj + anti-join + totals
      val adj = eu.select(col("u").as("node"), col("v").as("nbr"))
        .unionByName(eu.select(col("v").as("node"), col("u").as("nbr")))
      val closed = eu
        .join(adj.select(col("node").as("u"), col("nbr").as("w")), "u")
        .join(adj.select(col("node").as("v"), col("nbr").as("w")), Seq("v", "w"))
        .select("u", "v").distinct()
      val bridges = eu.join(closed, Seq("u", "v"), "left_anti")
        .localCheckpoint(true) // count + key pick read it
      val tot = eu.agg(count(lit(1)).as("n_edges"))
      bridges.agg(count(lit(1)).as("n_local_bridges"),
          min(col("u") * 100000000L + col("v")).as("first_bridge_key"))
        .crossJoin(broadcast(tot))
        .select(col("n_edges"), col("n_local_bridges"),
          expr("(n_local_bridges * 1000) DIV n_edges").as("bridge_share_pm"),
          col("first_bridge_key"))
    },

    // R242 — numeric-attribute assortativity: Pearson correlation of
    // (x_u, x_v) over the DOUBLED edge list (symmetrization makes the
    // two marginals identical, the standard convention) for the
    // n_chars signal — completing the assortativity family: gr10 by
    // degree, gr30 by category, this by numeric attribute; gr37's
    // smoothness is its energy-form cousin but reads dispersion, not
    // linear association. Exact decimal/HUGEINT moments off two
    // signal joins, one identical-tree double e6-rounded.
    Q(
      "gr42_attr_assortativity",
      """WITH e0 AS (
        |  SELECT doc_id AS a,
        |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |eu AS MATERIALIZED (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM e0 WHERE a <> b),
        |de AS (SELECT u, v FROM eu UNION ALL SELECT v, u FROM eu),
        |x AS (SELECT doc_id, n_chars AS x FROM documents),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xu.x) AS BIGINT) AS sx,
        |    CAST(sum(xv.x) AS BIGINT) AS sy,
        |    CAST(sum(CAST(xu.x AS HUGEINT) * xu.x) AS HUGEINT) AS sxx,
        |    CAST(sum(CAST(xv.x AS HUGEINT) * xv.x) AS HUGEINT) AS syy,
        |    CAST(sum(CAST(xu.x AS HUGEINT) * xv.x) AS HUGEINT) AS sxy
        |  FROM de JOIN x xu ON de.u = xu.doc_id
        |          JOIN x xv ON de.v = xv.doc_id)
        |SELECT n AS n_directed_edges,
        |  CAST(round(1000000 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |    / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
        |         * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT)
        |    AS assortativity_e6
        |FROM m""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("n_chars"))
      val n = docs.count()
      def es(mult: Int, add: Int) = docs.select(col("doc_id").as("a"),
        ((col("doc_id") * mult + add) % n).as("b"))
      val eu = es(7, 13).unionByName(es(3, 5)).unionByName(es(11, 2))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")).distinct()
      val de = eu.unionByName(eu.select(col("v").as("u"), col("u").as("v")))
      val x = docs.select(col("doc_id"), col("n_chars").as("x"))
      val m = de
        .join(x.select(col("doc_id").as("u"), col("x").as("xu")), "u")
        .join(x.select(col("doc_id").as("v"), col("x").as("xv")), "v")
        .agg(count(lit(1)).as("n"),
          sum("xu").as("sx"), sum("xv").as("sy"),
          sum(expr("CAST(xu AS DECIMAL(38,0)) * xu")).cast("decimal(38,0)").as("sxx"),
          sum(expr("CAST(xv AS DECIMAL(38,0)) * xv")).cast("decimal(38,0)").as("syy"),
          sum(expr("CAST(xu AS DECIMAL(38,0)) * xv")).cast("decimal(38,0)").as("sxy"))
      m.select(col("n").as("n_directed_edges"),
        expr("""CAST(round(1000000 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
          | / sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
          |      * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))) AS BIGINT)"""
          .stripMargin).as("assortativity_e6"))
    },

    // R254 — undirected triad census + global transitivity: gr3
    // enumerates the triangles, gr9 the per-node closure; the census
    // places EVERY C(n,3) triple into its class (empty / one-edge /
    // path / triangle) in CLOSED FORM — no triple enumeration anywhere:
    // wedges W = Σ C(d,2); paths = W − 3T; one-edge = m(n−2) − 2W + 3T
    // (each triple containing k edges is counted k times by m(n−2));
    // empty = C(n,3) − rest. Triangles come from gr3's oriented
    // two-join COUNT (u<v<w — each triangle once). All products ride
    // decimal(38,0)/HUGEINT; the two exact divisions (C(n,3)/6 and
    // W's /2) divide evenly but still use the %-subtraction identity
    // so neither engine ever rounds. Global transitivity 3T/W is the
    // one double. Cost: degree aggregate + gr3's triangle join.
    Q(
      "gr43_triad_census",
      """WITH raw AS (
        |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents)
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents)
        |  FROM documents),
        |e AS MATERIALIZED (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
        |      FROM raw WHERE a <> b),
        |nd AS (SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        |        SELECT u AS node FROM e UNION ALL SELECT v FROM e)
        |      GROUP BY 1),
        |base AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(d AS HUGEINT) * (d - 1)) // 2 AS HUGEINT) AS w
        |  FROM nd),
        |em AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        |tr AS (SELECT CAST(count(*) AS BIGINT) AS t
        |  FROM e e1 JOIN e e2 ON e1.v = e2.u
        |  JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT n, m, CAST(w AS BIGINT) AS wedges, t AS triangles,
        |  CAST(CAST(m AS HUGEINT) * (n - 2) - 2 * w + 3 * t AS BIGINT)
        |    AS triad_one_edge,
        |  CAST(w - 3 * t AS BIGINT) AS triad_path,
        |  CAST((CAST(n AS HUGEINT) * (n-1) * (n-2)) // 6
        |    - (CAST(m AS HUGEINT) * (n - 2) - 2 * w + 3 * t)
        |    - (w - 3 * t) - t AS BIGINT) AS triad_empty,
        |  3.0 * CAST(t AS DOUBLE) / CAST(w AS DOUBLE) AS transitivity
        |FROM base CROSS JOIN em CROSS JOIN tr""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val nDocs = docs.count()
      val raw = docs.select(col("doc_id").as("a"),
          ((col("doc_id") * 7 + 13) % nDocs).as("b"))
        .unionByName(docs.select(col("doc_id").as("a"),
          ((col("doc_id") * 3 + 5) % nDocs).as("b")))
        .unionByName(docs.select(col("doc_id").as("a"),
          ((col("doc_id") * 11 + 2) % nDocs).as("b")))
      val e = raw.filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct()
        .transform(graft.plans.Lineage.truncate) // degrees + 3-way triangle join
      val nd = e.select(col("u").as("node"))
        .unionByName(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("d"))
      val dd1 = col("d").cast("decimal(38,0)") * (col("d") - 1)
      val base = nd.agg(count(lit(1)).as("n"),
        ((sum(dd1) - pmod(sum(dd1), lit(2))) / 2).cast("decimal(38,0)").as("w"))
      val em = e.agg(count(lit(1)).as("m"))
      val tr = e.join(e.select(col("u").as("v"), col("v").as("w0")), "v")
        .join(e.select(col("u"), col("v").as("w0")), Seq("u", "w0"))
        .agg(count(lit(1)).as("t"))
      val nD = col("n").cast("decimal(38,0)")
      val c3num = nD * (col("n") - 1) * (col("n") - 2)
      base.crossJoin(em).crossJoin(tr)
        .select(col("n"), col("m"),
          col("w").cast("long").as("wedges"), col("t").as("triangles"),
          (col("m").cast("decimal(38,0)") * (col("n") - 2)
            - lit(2) * col("w") + lit(3) * col("t")).cast("long")
            .as("triad_one_edge"),
          (col("w") - lit(3) * col("t")).cast("long").as("triad_path"),
          (((c3num - pmod(c3num, lit(6))) / 6).cast("decimal(38,0)")
            - (col("m").cast("decimal(38,0)") * (col("n") - 2)
              - lit(2) * col("w") + lit(3) * col("t"))
            - (col("w") - lit(3) * col("t")) - col("t")).cast("long")
            .as("triad_empty"),
          (lit(3.0) * col("t").cast("double") / col("w").cast("double"))
            .as("transitivity"))
    }
  )

  /** gr5's oracle: synchronous mode-vote LPA unrolled to the entry's
    * fixed 5 rounds as plain chained CTEs (generated, so the round
    * count and tie rule cannot drift from the Spark loop). */
  // lazy: referenced by the `catalog` val ABOVE its declaration — a
  // strict val would still be null during catalog construction
  /** Shared WITH-list prefix: 3-map edges, symmetric adjacency, and the
    * 5 unrolled synchronous-LPA rounds ending at `l5(node, lbl)`.
    * MATERIALIZED per round: l_{i-1} is referenced twice (neighbor
    * join + self vote) — inlining would re-evaluate the upstream chain
    * 2^rounds times (the gr12 bring-up lesson). */
  private lazy val lpaPrefixSql: String = {
    val rounds = (1 to 5).map { i =>
      s"""v$i AS MATERIALIZED (
         |      SELECT a.s AS node, l.lbl FROM adj a JOIN l${i - 1} l ON l.node = a.t
         |      UNION ALL SELECT node, lbl FROM l${i - 1}),
         |c$i AS (SELECT node, lbl, count(*) AS cnt FROM v$i GROUP BY 1, 2),
         |l$i AS MATERIALIZED (SELECT node, lbl FROM (
         |        SELECT node, lbl, row_number() OVER (PARTITION BY node
         |                 ORDER BY cnt DESC, lbl) AS rn FROM c$i) WHERE rn = 1)"""
        .stripMargin
    }.mkString(",\n")
    s"""e AS (
       |  SELECT doc_id AS s,
       |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS t
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
       |  FROM documents),
       |adj AS MATERIALIZED (SELECT DISTINCT s, t FROM (
       |  SELECT s, t FROM e WHERE s <> t
       |  UNION ALL SELECT t, s FROM e WHERE s <> t)),
       |l0 AS MATERIALIZED (SELECT DISTINCT s AS node, s AS lbl FROM adj),
       |$rounds""".stripMargin
  }

  private[graft] lazy val lpaUnrolledOracle: String =
    s"""WITH $lpaPrefixSql
       |SELECT CAST(lbl AS BIGINT) AS community,
       |  CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(min(node) AS BIGINT) AS min_node
       |FROM l5 GROUP BY 1
       |ORDER BY n_members DESC, community LIMIT 50""".stripMargin

  /** gr18's ORACLE (r6): the LPA prefix seeds 4 generated Louvain
    * local-move rounds — [[louvainRefine]]'s exact synchronous
    // parity-gated rule, integer gain algebra in HUGEINT (m2·kic −
    * ki·(Σtot − [stay]·ki)), argmax ≡ row_number (g DESC, c), strict
    * improvement gate. Every round is FIXED — the loop was never a
    * data-dependent fixpoint, so a straight unroll certifies it. */
  private[graft] lazy val louvainUnrolledOracle: String = {
    val rounds = (1 to 4).map { r =>
      val prev = s"lv${r - 1}"
      s"""sg$r AS (SELECT l.c, CAST(sum(d.ki) AS BIGINT) AS sigma
         |  FROM $prev l JOIN deg d ON d.node = l.node GROUP BY 1),
         |kc$r AS (SELECT a.s AS node, l.c, CAST(count(*) AS BIGINT) AS kic
         |  FROM adj a JOIN $prev l ON l.node = a.t GROUP BY 1, 2),
         |cd$r AS (SELECT node, c, CAST(sum(kic) AS BIGINT) AS kic FROM (
         |    SELECT node, c, kic FROM kc$r
         |    UNION ALL SELECT node, c, CAST(0 AS BIGINT) FROM $prev)
         |  GROUP BY 1, 2),
         |sc$r AS MATERIALIZED (
         |  SELECT cd.node, cd.c, li.c AS ci,
         |    CAST((SELECT m2 FROM m2t) AS HUGEINT) * cd.kic
         |      - CAST(d.ki AS HUGEINT)
         |        * (sg.sigma - CASE WHEN cd.c = li.c THEN d.ki ELSE 0 END) AS g
         |  FROM cd$r cd JOIN $prev li ON li.node = cd.node
         |  JOIN deg d ON d.node = cd.node
         |  JOIN sg$r sg ON sg.c = cd.c),
         |bt$r AS (SELECT node, c AS bc, g AS bg FROM (
         |    SELECT node, c, g, row_number() OVER (PARTITION BY node
         |      ORDER BY g DESC, c) AS rn FROM sc$r) WHERE rn = 1),
         |st$r AS (SELECT node, max(CASE WHEN c = ci THEN g END) AS gstay
         |  FROM sc$r GROUP BY 1),
         |lv$r AS MATERIALIZED (
         |  SELECT b.node,
         |    CASE WHEN (b.node + $r) % 2 = 0 AND b.bg > s.gstay
         |         THEN b.bc ELSE li.c END AS c
         |  FROM bt$r b JOIN st$r s ON s.node = b.node
         |  JOIN $prev li ON li.node = b.node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH $lpaPrefixSql,
       |deg AS MATERIALIZED (SELECT s AS node, CAST(count(*) AS BIGINT) AS ki
       |  FROM adj GROUP BY 1),
       |m2t AS (SELECT CAST(sum(ki) AS BIGINT) AS m2 FROM deg),
       |lv0 AS MATERIALIZED (SELECT node, lbl AS c FROM l5),
       |$rounds
       |SELECT CAST(c AS BIGINT) AS community,
       |  CAST(count(*) AS BIGINT) AS n_members,
       |  CAST(min(node) AS BIGINT) AS min_node
       |FROM lv4 GROUP BY 1
       |ORDER BY n_members DESC, community LIMIT 50""".stripMargin
  }

  /** gr12's oracle: the 8 fixed HITS rounds unrolled as generated plain
    * CTEs (HUGEINT products, floor division of non-negatives — exactly
    * [[hits]]' integer algebra, so the texts cannot drift). */
  private[graft] lazy val hitsUnrolledOracle: String = {
    val S = 1000000000L
    // every per-round CTE is MATERIALIZED: ar/hr are each referenced
    // twice (score join + max), so inlining doubles the re-evaluated
    // upstream chain PER ROUND — a 2^rounds blowup measured in CPU-
    // minutes at bring-up; materialization makes the unroll linear
    val rounds = (1 to 8).map { i =>
      s"""ar$i AS MATERIALIZED (
         |       SELECT e.dst AS node, CAST(sum(h.hub) AS BIGINT) AS raw
         |       FROM e JOIN h${i - 1} h ON h.node = e.src GROUP BY 1),
         |am$i AS MATERIALIZED (SELECT CAST(max(raw) AS HUGEINT) AS mx FROM ar$i),
         |a$i AS MATERIALIZED (SELECT n.node,
         |         CAST(CAST(coalesce(ar.raw, 0) AS HUGEINT) * $S
         |              // am.mx AS BIGINT) AS auth
         |       FROM nodes n LEFT JOIN ar$i ar ON ar.node = n.node
         |       CROSS JOIN am$i am),
         |hr$i AS MATERIALIZED (
         |       SELECT e.src AS node, CAST(sum(a.auth) AS BIGINT) AS raw
         |       FROM e JOIN a$i a ON a.node = e.dst GROUP BY 1),
         |hm$i AS MATERIALIZED (SELECT CAST(max(raw) AS HUGEINT) AS mx FROM hr$i),
         |h$i AS MATERIALIZED (SELECT n.node,
         |         CAST(CAST(coalesce(hr.raw, 0) AS HUGEINT) * $S
         |              // hm.mx AS BIGINT) AS hub
         |       FROM nodes n LEFT JOIN hr$i hr ON hr.node = n.node
         |       CROSS JOIN hm$i hm)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT doc_id AS src,
       |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS dst
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
       |  FROM documents),
       |-- MATERIALIZED: 16 unrolled rounds reference e/nodes — inlining
       |-- would re-open the parquet scan per reference (EMFILE in DuckDB)
       |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |h0 AS (SELECT node, CAST($S AS BIGINT) AS hub FROM nodes),
       |$rounds
       |SELECT a8.node, CAST(a8.auth AS BIGINT) AS auth_e9,
       |  CAST(h8.hub AS BIGINT) AS hub_e9
       |FROM a8 JOIN h8 ON h8.node = a8.node
       |ORDER BY auth_e9 DESC, hub_e9 DESC, a8.node LIMIT 20""".stripMargin
  }

  /** Generated unrolled Katz oracle (gr32): six exact-integer rounds of
    * X_{t+1}(v) = 8^{t+1} + Σ_{u→v} X_t(u) over the 3-map functional
    * graph — the gr12 recipe (MATERIALIZED per round so the unroll
    * stays linear, not 2^rounds). */
  private[graft] lazy val katzUnrolledOracle: String = {
    val rounds = (1 to 6).map { i =>
      val pow8 = math.pow(8, i).toLong
      s"""xr$i AS MATERIALIZED (
         |       SELECT e.dst AS node, CAST(sum(x.katz) AS BIGINT) AS inflow
         |       FROM e JOIN x${i - 1} x ON x.node = e.src GROUP BY 1),
         |x$i AS MATERIALIZED (SELECT n.node,
         |         CAST(coalesce(xr.inflow, 0) + $pow8 AS BIGINT) AS katz
         |       FROM nodes n LEFT JOIN xr$i xr ON xr.node = n.node)"""
        .stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (
       |  SELECT doc_id AS src,
       |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS dst
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
       |  FROM documents),
       |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |x0 AS (SELECT node, CAST(1 AS BIGINT) AS katz FROM nodes),
       |$rounds
       |SELECT node, katz AS katz_scaled FROM x6
       |ORDER BY katz_scaled DESC, node LIMIT 20""".stripMargin
  }

  /** gr6's oracle: the degree-peel loop of [[kCore]] (k=3) unrolled as
    * 5 generated rounds. Peeling is IDEMPOTENT past its fixpoint (a
    * round that removes nothing recomputes the same frame), so a fixed
    * unroll ≥ the measured round count (1 at every oracle SF, with a
    * 4-round margin) reproduces the fixpoint exactly; if the data ever
    * out-peeled the unroll, the Spark side still runs to ITS fixpoint
    * and the driver's hash compare fails loudly — the convergence check
    * is built into the certification, never silently truncated. */
  private[graft] lazy val kcoreUnrolledOracle: String = {
    val R = 5
    val rounds = (1 to R).map { i =>
      s"""k$i AS MATERIALIZED (
         |  SELECT a FROM s${i - 1} GROUP BY a HAVING count(*) >= 3),
         |s$i AS MATERIALIZED (
         |  SELECT s.a, s.b FROM s${i - 1} s
         |  JOIN k$i x ON x.a = s.a JOIN k$i y ON y.a = s.b)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS (
       |  SELECT doc_id AS src,
       |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS dst
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
       |  FROM documents),
       |canon AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM raw WHERE src <> dst),
       |s0 AS MATERIALIZED (
       |  SELECT u AS a, v AS b FROM canon UNION ALL SELECT v, u FROM canon),
       |$rounds
       |SELECT a AS node, CAST(count(*) AS BIGINT) AS core_degree
       |FROM s$R GROUP BY 1 ORDER BY node""".stripMargin
  }

  /** gr20's oracle: [[kTruss]] (k=3) support peeling unrolled as 5
    * generated rounds — ordered-triangle join (u<v<w via canonical
    * edges), per-edge support, keep support >= k-2. Same idempotent-
    * past-fixpoint argument as [[kcoreUnrolledOracle]] (measured 2
    * rounds at every oracle SF); the final round's support column IS
    * the output, exactly as [[kTruss]] returns the support computed on
    * the converged edge set. */
  private[graft] lazy val ktrussUnrolledOracle: String = {
    val R = 5
    val rounds = (1 to R).map { i =>
      s"""tri$i AS MATERIALIZED (
         |  SELECT ab.u, ab.v, bc.v AS w
         |  FROM e${i - 1} ab
         |  JOIN e${i - 1} bc ON bc.u = ab.v
         |  JOIN e${i - 1} ac ON ac.u = ab.u AND ac.v = bc.v),
         |supp$i AS MATERIALIZED (
         |  SELECT a, b, CAST(count(*) AS BIGINT) AS support FROM (
         |    SELECT u AS a, v AS b FROM tri$i
         |    UNION ALL SELECT u, w FROM tri$i
         |    UNION ALL SELECT v, w FROM tri$i)
         |  GROUP BY 1, 2),
         |e$i AS MATERIALIZED (
         |  SELECT e.u, e.v, coalesce(p.support, 0) AS support
         |  FROM e${i - 1} e LEFT JOIN supp$i p ON p.a = e.u AND p.b = e.v
         |  WHERE coalesce(p.support, 0) >= 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS (
       |  SELECT doc_id AS src,
       |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS dst
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*11 + 2) % (SELECT count(*) FROM documents)
       |  FROM documents),
       |e0 AS MATERIALIZED (
       |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
       |  FROM raw WHERE src <> dst),
       |$rounds
       |SELECT u, v, CAST(support AS BIGINT) AS support
       |FROM e$R ORDER BY u, v""".stripMargin
  }

  /** gr15's oracle: the k-pivot Brandes pass unrolled as generated plain
    * CTEs — forward BFS layers l1..lH (σ path counts as HUGEINT, new
    * (s,v) pairs only via anti-join against the growing seen set), then
    * the reverse accumulation ldH..ld1 with [[betweenness]]' EXACT
    * integral recurrence δ(v) = Σ_w σ_v·(10⁹+δ_w) // σ_w. H=24 is an
    * empty-tail bound: measured BFS depth from the 12 pivots is 11 at
    * the oracle SFs (15 at sf0.1), and layers past the fixpoint are
    * empty frames contributing nothing — so the unroll reproduces the
    * fixpoint exactly, per-layer CTEs MATERIALIZED to keep it linear
    * (the gr12 bring-up lesson). */
  private[graft] lazy val betweennessUnrolledOracle: String = {
    val S = 1000000000L
    val H = 24
    val forward = (1 to H).map { i =>
      s"""lr$i AS MATERIALIZED (
         |  SELECT l.s, e.dst AS v, CAST(sum(l.sigma) AS HUGEINT) AS sigma
         |  FROM l${i - 1} l JOIN e ON e.src = l.v GROUP BY 1, 2),
         |l$i AS MATERIALIZED (
         |  SELECT lr.s, lr.v, lr.sigma FROM lr$i lr
         |  WHERE NOT EXISTS (SELECT 1 FROM seen${i - 1} p
         |                    WHERE p.s = lr.s AND p.v = lr.v)),
         |seen$i AS MATERIALIZED (
         |  SELECT s, v FROM seen${i - 1} UNION ALL SELECT s, v FROM l$i)"""
        .stripMargin
    }.mkString(",\n")
    val backward = (H - 1) to 0 by -1
    val back = backward.map { i =>
      s"""dt$i AS MATERIALIZED (
         |  SELECT l.s, l.v,
         |    CAST(sum(CAST(CAST(l.sigma * ($S + dn.delta) AS HUGEINT)
         |                  // dn.sigma AS BIGINT)) AS BIGINT) AS delta
         |  FROM l$i l JOIN e ON e.src = l.v
         |  JOIN ld${i + 1} dn ON dn.s = l.s AND dn.v = e.dst
         |  GROUP BY 1, 2),
         |ld$i AS MATERIALIZED (
         |  SELECT l.s, l.v, l.sigma,
         |    CAST(coalesce(d.delta, 0) AS BIGINT) AS delta
         |  FROM l$i l LEFT JOIN dt$i d ON d.s = l.s AND d.v = l.v)"""
        .stripMargin
    }.mkString(",\n")
    // contributions: every non-pivot layer's δ (layers 1..H; layer 0 is
    // the pivot itself, excluded exactly as [[betweenness]] does)
    val contribs = (1 to H)
      .map(i => s"SELECT v, delta FROM ld$i").mkString("\n  UNION ALL ")
    s"""WITH raw AS (
       |  SELECT doc_id AS src,
       |         (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS dst
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*3 + 5) % (SELECT count(*) FROM documents)
       |  FROM documents),
       |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
       |l0 AS MATERIALIZED (
       |  SELECT doc_id AS s, doc_id AS v, CAST(1 AS HUGEINT) AS sigma
       |  FROM documents WHERE doc_id < 12),
       |seen0 AS MATERIALIZED (SELECT s, v FROM l0),
       |$forward,
       |ld$H AS MATERIALIZED (
       |  SELECT s, v, sigma, CAST(0 AS BIGINT) AS delta FROM l$H),
       |$back,
       |c AS ($contribs)
       |SELECT v AS node, CAST(sum(delta) AS BIGINT) AS btw_e9
       |FROM c GROUP BY 1
       |ORDER BY btw_e9 DESC, node LIMIT 20""".stripMargin
  }

  /** Shared unrolled-round oracle generator for the PageRank family
    * (gr2 / gr17) — the gr12 HITS recipe applied to [[pageRank]] /
    * [[personalizedPageRank]]: the fixed `nIter` rounds of their EXACT
    * integer algebra as generated plain CTEs, so DuckDB reproduces the
    * fixed point bit for bit. One generator serves both because
    * seeds = all nodes makes personalized PageRank identical to
    * pageRank (GraphSpec pins that equivalence on the Spark side, this
    * SQL encodes the same CASE collapse).
    *
    * `preludeCtes` (optional, trailing comma handled here) lets the
    * edge set be built from its own CTE chain (gr17's dd15 pair
    * generator); `edges0Sql` yields (src, dst); `seeds0Sql` yields
    * (node); `finalSql` projects from r$nIter / seeds.
    * MATERIALIZED per round: r_{i-1} feeds both the dangling sum and
    * the inflow join — inlining would re-evaluate the upstream chain
    * 2^rounds times (the gr12 bring-up lesson).
    */
  private[graft] def pprUnrolledOracle(preludeCtes: String, edges0Sql: String,
                                       seeds0Sql: String, finalSql: String,
                                       nIter: Int = 8,
                                       dampingPpm: Long = 850000L): String = {
    val Scale = 1000000000000L
    // Scala-side truncating division mirrors pageRank's driver constants
    val baseNum = Scale * (1000000L - dampingPpm) / 1000000L
    val rounds = (1 to nIter).map { i =>
      s"""dg$i AS MATERIALIZED (
         |  SELECT CAST(coalesce(sum(r.r), 0) AS BIGINT) AS s
         |  FROM r${i - 1} r LEFT JOIN outdeg d ON d.node = r.node
         |  WHERE d.deg IS NULL),
         |inf$i AS MATERIALIZED (
         |  SELECT e.dst AS node, CAST(sum(r.r // d.deg) AS BIGINT) AS inflow
         |  FROM e JOIN r${i - 1} r ON r.node = e.src
         |         JOIN outdeg d ON d.node = e.src
         |  GROUP BY 1),
         |r$i AS MATERIALIZED (
         |  SELECT n.node,
         |    CASE WHEN sd.node IS NOT NULL
         |      THEN ($baseNum // sc.ns)
         |           + ($dampingPpm * (coalesce(i.inflow, 0) + (dg.s // sc.ns))) // 1000000
         |      ELSE ($dampingPpm * coalesce(i.inflow, 0)) // 1000000 END AS r
         |  FROM nodes n
         |  LEFT JOIN inf$i i ON i.node = n.node
         |  LEFT JOIN seeds sd ON sd.node = n.node
         |  CROSS JOIN dg$i dg CROSS JOIN scnt sc)""".stripMargin
    }.mkString(",\n")
    val prelude = if (preludeCtes.isEmpty) "" else preludeCtes + ",\n"
    s"""WITH $prelude
       |e0 AS ($edges0Sql),
       |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM e0
       |  WHERE src IS NOT NULL AND dst IS NOT NULL),
       |nodes AS MATERIALIZED (SELECT DISTINCT node FROM (
       |  SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
       |outdeg AS MATERIALIZED (
       |  SELECT src AS node, count(*) AS deg FROM e GROUP BY 1),
       |seeds0 AS ($seeds0Sql),
       |seeds AS MATERIALIZED (
       |  SELECT DISTINCT s.node FROM seeds0 s JOIN nodes n ON n.node = s.node),
       |scnt AS (SELECT count(*) AS ns FROM seeds),
       |r0 AS MATERIALIZED (
       |  SELECT n.node, CASE WHEN sd.node IS NOT NULL
       |    THEN $Scale // sc.ns ELSE CAST(0 AS BIGINT) END AS r
       |  FROM nodes n LEFT JOIN seeds sd ON sd.node = n.node CROSS JOIN scnt sc),
       |$rounds
       |$finalSql""".stripMargin
  }

  /** gr2's oracle: 8 pageRank rounds unrolled; seeds = all nodes makes
    * the personalized CASE collapse to the plain update. */
  private[graft] lazy val pagerankUnrolledOracle: String = pprUnrolledOracle(
    preludeCtes = "",
    edges0Sql =
      """SELECT doc_id AS src,
        |       (doc_id*7 + 13) % (SELECT count(*) FROM documents) AS dst
        |  FROM documents""".stripMargin,
    seeds0Sql = "SELECT node FROM nodes",
    finalSql =
      """SELECT CAST(r.node AS BIGINT) AS node, CAST(r.r AS BIGINT) AS rank_e12
        |FROM r8 r ORDER BY rank_e12 DESC, node LIMIT 50""".stripMargin)

  /** gr17's oracle: dd15's sorted-neighborhood pairs as undirected
    * edges, seeds = the curated source's docs, 8 personalized rounds,
    * non-seed top-30. */
  private[graft] lazy val seedExpansionUnrolledOracle: String = pprUnrolledOracle(
    preludeCtes =
      """t AS (SELECT doc_id, lang,
        |    list_distinct(string_split(text, ' ')) AS ts,
        |    string_split(text, ' ')[1] AS w1,
        |    string_split(text, ' ')[2] AS w2
        |  FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |nb AS (SELECT doc_id, ts,
        |    lead(doc_id, 1) OVER wd AS id1, lead(ts, 1) OVER wd AS ts1,
        |    lead(doc_id, 2) OVER wd AS id2, lead(ts, 2) OVER wd AS ts2
        |  FROM t WINDOW wd AS (PARTITION BY lang, w1 ORDER BY w2, doc_id)),
        |cand AS (
        |  SELECT doc_id AS id_a, id1 AS id_b, ts, ts1 AS tsb
        |  FROM nb WHERE id1 IS NOT NULL
        |  UNION ALL
        |  SELECT doc_id, id2, ts, ts2 FROM nb WHERE id2 IS NOT NULL),
        |pr AS MATERIALIZED (
        |  SELECT id_a, id_b FROM cand
        |  WHERE (CAST(len(list_intersect(ts, tsb)) AS BIGINT) * 1000) //
        |    CAST(len(ts) + len(tsb) - len(list_intersect(ts, tsb)) AS BIGINT)
        |    >= 400)""".stripMargin,
    edges0Sql =
      """SELECT id_a AS src, id_b AS dst FROM pr
        |  UNION ALL SELECT id_b, id_a FROM pr""".stripMargin,
    seeds0Sql = "SELECT doc_id AS node FROM documents WHERE source = 'src1'",
    finalSql =
      """SELECT CAST(r.node AS BIGINT) AS node, CAST(r.r AS BIGINT) AS rank_e12
        |FROM r8 r LEFT JOIN seeds sd ON sd.node = r.node
        |WHERE sd.node IS NULL
        |ORDER BY rank_e12 DESC, node LIMIT 30""".stripMargin)

  /** R126's walk generator: 4-step deterministic walks from seeds
    * doc_id < 50 over the indexed 3-out adjacency, step choice from the
    * engine-portable md5 stream keyed by (seed, node, step). */
  private def deterministicWalks(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    val n = docs.count()
    def es(mult: Int, add: Int, idx: Int) = docs.select(
      col("doc_id").as("src"), lit(idx).as("idx"),
      ((col("doc_id") * mult + add) % n).as("dst"))
    val e = es(7, 13, 1).unionByName(es(31, 5, 2)).unionByName(es(101, 2, 3))
      .transform(graft.plans.Lineage.truncate)
    var cur = docs.filter(col("doc_id") < 50)
      .select(col("doc_id").as("seed"), lit(0L).as("step"),
        col("doc_id").as("node"))
    val levels = scala.collection.mutable.ArrayBuffer(cur)
    for (_ <- 1 to 4) {
      cur = cur
        .withColumn("pick", expr(
          """1 + CAST(conv(substr(md5(concat(CAST(seed AS STRING), ':',
            |  CAST(node AS STRING), ':', CAST(step AS STRING))), 1, 8),
            |  16, 10) AS BIGINT) % 3""".stripMargin))
        .join(e, col("node") === col("src") && col("idx") === col("pick"))
        .select(col("seed"), (col("step") + 1).as("step"),
          col("dst").as("node"))
      levels += cur
    }
    levels.reduce(_ unionByName _)
  }

  /** R147 — Borůvka minimum spanning forest: THE distributed MST
    * algorithm (GHS lineage) — every component picks its cheapest
    * outgoing edge simultaneously, chosen edges contract, and the
    * component count at least halves per round, so ≤ log₂(n) rounds
    * regardless of graph size. Each round is two label joins + one
    * min(struct) aggregate (map-side combinable; the struct's (w,u,v)
    * field order IS the deterministic total order, so distinct weights
    * make the forest unique); contraction reuses dd5's pointer-jumping
    * CC on the CHOSEN-EDGE frame (component-count-sized, never the
    * edge count). The driver loop iterates rounds, never rows;
    * localCheckpoint truncates lineage per round (BFS/CC discipline).
    *
    * Input: (`u`, `v`, `w`) undirected weighted edges; output: the
    * forest's (`u`, `v`, `w`) rows.
    */
  def mstBoruvka(edgesIn: DataFrame, maxRounds: Int = 20): DataFrame = {
    // The loop's frames are component-sized METADATA that halve every
    // round; what dominates wall time is per-job planning latency, not
    // data. AQE's stage-by-stage re-planning buys nothing on such
    // frames and costs a pause per stage — run the loop with AQE off
    // and a small fixed shuffle width (restored in finally). On a
    // cluster the same setting is what AQE would coalesce to anyway;
    // results are partition-count-invariant (hash/orderBy outputs).
    val spark = edgesIn.sparkSession
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val partsBefore = spark.conf.get("spark.sql.shuffle.partitions", "32")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try mstBoruvkaLoop(edgesIn, maxRounds)
    finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set("spark.sql.shuffle.partitions", partsBefore)
    }
  }

  /** gr26's ORACLE: Borůvka replayed as 10 generated rounds (idempotent
    * past the fixpoint — an empty round is a no-op through the left
    * joins, the gr6 k-core license). Each round: cross-component edges
    * under the current labels, per-component argmin by WEIGHT ALONE
    * (the md5 weights are globally distinct, so min(w) determines the
    * edge — no struct order needed), then contraction as a RECURSIVE
    * min-label closure over the chosen-edge component graph (gr14's
    * pattern; label VALUES may differ from the Spark side's
    * pointer-jumping roots, but the PARTITION — all that matters for
    * the next round's argmin — is identical, and the output is edges
    * only). The MST is unique under distinct weights, so matching
    * edge sets IS full certification. */
  private[graft] lazy val mstUnrolledOracle: String = {
    val R = 10
    val rounds = (1 to R).map { i =>
      val prev = s"lab${i - 1}"
      s"""ce$i AS (SELECT e.u, e.v, e.w, lu.comp AS cu, lv.comp AS cv
         |  FROM e JOIN $prev lu ON lu.id = e.u
         |         JOIN $prev lv ON lv.id = e.v
         |  WHERE lu.comp <> lv.comp),
         |hf$i AS (SELECT cu AS comp, u, v, w, cu AS ecu, cv AS ecv FROM ce$i
         |  UNION ALL SELECT cv, u, v, w, cu, cv FROM ce$i),
         |mw$i AS (SELECT comp, min(w) AS w FROM hf$i GROUP BY 1),
         |me$i AS MATERIALIZED (
         |  SELECT h.comp, h.u, h.v, h.w, h.ecu, h.ecv
         |  FROM hf$i h JOIN mw$i m ON m.comp = h.comp AND m.w = h.w),
         |g$i AS (
         |  SELECT comp AS a, CASE WHEN comp = ecu THEN ecv ELSE ecu END AS b
         |  FROM me$i
         |  UNION
         |  SELECT CASE WHEN comp = ecu THEN ecv ELSE ecu END, comp FROM me$i),
         |reach$i AS (
         |  SELECT DISTINCT a, a AS lab FROM g$i
         |  UNION
         |  SELECT g.a, r.lab FROM g$i g JOIN reach$i r ON g.b = r.a),
         |nl$i AS (SELECT a AS comp, min(lab) AS newcomp
         |         FROM reach$i GROUP BY 1),
         |lab$i AS MATERIALIZED (
         |  SELECT l.id, coalesce(n.newcomp, l.comp) AS comp
         |  FROM $prev l LEFT JOIN nl$i n ON n.comp = l.comp)"""
        .stripMargin
    }.mkString(",\n")
    val fes = (1 to R).map(i => s"SELECT u, v, w FROM me$i")
      .mkString(" UNION ALL ")
    s"""WITH RECURSIVE raw AS (
       |  SELECT doc_id AS a, (doc_id*7+13) % (SELECT count(*) FROM documents) AS b
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*3+5) % (SELECT count(*) FROM documents)
       |  FROM documents
       |  UNION ALL
       |  SELECT doc_id, (doc_id*11+2) % (SELECT count(*) FROM documents)
       |  FROM documents),
       |e AS MATERIALIZED (
       |  SELECT u, v,
       |    CAST('0x' || substr(md5(CAST(u AS VARCHAR) || ':'
       |      || CAST(v AS VARCHAR)), 1, 15) AS BIGINT) AS w
       |  FROM (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v
       |        FROM raw WHERE a <> b)),
       |lab0 AS MATERIALIZED (
       |  SELECT node AS id, node AS comp FROM (
       |    SELECT DISTINCT u AS node FROM e UNION SELECT v FROM e)),
       |$rounds
       |SELECT DISTINCT u, v, w FROM ($fes) ORDER BY u, v""".stripMargin
  }

  private def mstBoruvkaLoop(edgesIn: DataFrame, maxRounds: Int): DataFrame = {
    val edges = graft.plans.Lineage.truncate(
      edgesIn.select(col("u"), col("v"), col("w")))
    var labels = graft.plans.Lineage.truncate(
      edges.select(col("u").as("id"))
        .unionByName(edges.select(col("v").as("id")))
        .distinct().withColumn("comp", col("id")))
    // forest edges accumulate as plans over LEAF frames and union ONCE
    // at the end — a per-round checkpoint of the growing forest would
    // cost a job per round for a frame nothing reads until the return.
    val forest = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      val ce = edges
        .join(labels.select(col("id").as("u"), col("comp").as("cu")), "u")
        .join(labels.select(col("id").as("v"), col("comp").as("cv")), "v")
        .filter(col("cu") =!= col("cv"))
      def half(c: String) = ce.select(col(c).as("comp"),
        struct(col("w"), col("u"), col("v"), col("cu"), col("cv")).as("e"))
      // one row per component: its cheapest outgoing edge (the argmin
      // the struct total order makes deterministic)
      val me = graft.plans.Lineage.truncate(
        half("cu").unionByName(half("cv"))
          .groupBy("comp").agg(min("e").as("e"))
          .select(col("comp"), col("e.w").as("w"), col("e.u").as("u"),
            col("e.v").as("v"), col("e.cu").as("cu"), col("e.cv").as("cv")))
      if (me.isEmpty) done = true
      else {
        forest += me.select("u", "v", "w").distinct()
        // Contraction, specialized to Borůvka's structure: succ(c) =
        // the other endpoint of c's argmin edge is a FUNCTIONAL map
        // whose only cycles are mutual pairs (distinct weights — the
        // classic lemma), so rooting each 2-cycle at its smaller id
        // turns succ into a forest pointing rootward, and pure pointer
        // COMPOSITION (p <- p∘p) flattens every chain in O(log chain)
        // one-join rounds — leaner than the generic CC (no edge-frame
        // rebuild, no neighbor-min aggregate per iteration).
        val succ = me.select(col("comp"),
          when(col("comp") === col("cu"), col("cv")).otherwise(col("cu"))
            .as("s"))
        val p0 = succ
          .join(succ.select(col("comp").as("s"), col("s").as("ss")), Seq("s"))
          .select(col("comp"),
            when(col("ss") === col("comp") && col("comp") < col("s"),
              col("comp")).otherwise(col("s")).as("p"))
        // fuse the first composition into the same checkpoint: most
        // rounds' chains are ≤2 long, so p1 = p0∘p0 is already flat and
        // the loop below settles in one (job-cheap) check
        var p = graft.plans.Lineage.truncate(
          p0.join(p0.select(col("comp").as("p"), col("p").as("pp")), Seq("p"))
            .select(col("comp"), col("pp").as("p")))
        var flat = false
        while (!flat) {
          // compute the next composition UNCHECKPOINTED: when it proves
          // flat (the usual case) it is discarded after one action
          val next = p
            .join(p.select(col("comp").as("p"), col("p").as("pp")), Seq("p"))
            .select(col("comp"), col("pp").as("p"))
          flat = next.join(p.withColumnRenamed("p", "old"), Seq("comp"))
            .filter(col("p") =!= col("old")).isEmpty
          if (!flat) p = graft.plans.Lineage.truncate(next)
        }
        labels = graft.plans.Lineage.truncate(
          labels.join(p.select(col("comp"), col("p").as("newcomp")),
              Seq("comp"), "left")
            .select(col("id"), coalesce(col("newcomp"), col("comp")).as("comp")))
      }
      round += 1
    }
    if (forest.isEmpty) edges.filter(lit(false))
    else forest.reduce(_ unionByName _)
  }


}
