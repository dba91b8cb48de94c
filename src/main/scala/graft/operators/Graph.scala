package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph traversal — recursive-query semantics (WITH RECURSIVE)
  * that Spark has no built-in for, expressed as a frontier-expansion loop
  * of hash joins. Like [[Dedup.connectedComponents]], the driver loop
  * iterates HOPS, never rows, and each round localCheckpoints to keep
  * plan depth constant.
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
      .localCheckpoint(true)
    val levels = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var frontier = seeds.select(col("node")).filter(col("node").isNotNull)
      .distinct().withColumn("dist", lit(0L)).localCheckpoint(true)
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
        .localCheckpoint(true)
      levels += next
      frontier = next
    }
    // Note: Dataset.unpersist is a no-op for localCheckpoint'd frames
    // (their blocks live at the RDD layer, not the CacheManager); the
    // level/edge blocks are reclaimed by the ContextCleaner once these
    // local references drop out of scope.
    levels.reduce(_ union _).localCheckpoint(true)
  }

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
    }
  )
}
