package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable + incremental connected components (SURVEY.md §2 L4e) — the
  * cluster-label index that grows with the dedup pair stream. dd5
  * recomputes labels from ALL pairs; at 100 TB the pair history is
  * unbounded, while each ingest only ever NEEDS the new pairs and the
  * current labels: map the batch's endpoints to their current roots
  * (left join — absent node = its own root), contract the batch to a
  * ROOT GRAPH (≤ one node per touched component, bounded by batch
  * size, never corpus size), run the O(log d) min-label CC on that
  * contracted graph, and push the resulting root remap back down —
  * only members of components that actually MERGED rewrite, through
  * the T7b bucketed upsert (O(touched buckets), untouched label
  * buckets keep their files byte-for-byte).
  *
  * Labels stay canonical (component = min member id, dd5's
  * convention): every stored root is the min of its members, so the
  * min over merged roots is the min over the union — the invariant
  * survives every merge, and incremental ≡ full-recompute is spec'd
  * as EXACT equality under adversarial batch splits (bridges landing
  * after both sides are already large).
  *
  * Replay safety needs no marker here: re-applying a batch whose
  * merges are already in the labels finds every endpoint sharing a
  * root, contracts to an EMPTY root graph, and upserts only identity
  * rows — a no-op by construction (spec'd). Single writer, monotonic
  * batch ids, like every rename-published state in this repo.
  */
object CcIndex {

  private def labelsPath(dir: String) = s"$dir/labels"

  /** Current labels `(id, component)`; empty frame before any update. */
  def snapshot(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(labelsPath(dir))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBuckets = fs.exists(p) &&
      fs.listStatus(p).exists(_.getPath.getName.startsWith("__kb="))
    if (!hasBuckets) {
      import spark.implicits._
      Seq.empty[(Long, Long)].toDF("id", "component")
    } else
      spark.read.parquet(labelsPath(dir)).select("id", "component")
  }

  /** Merge a batch of near-dup pairs `(id_a, id_b)` into the label
    * state. Work is O(batch + members-of-merged-components); label
    * buckets without touched members are not rewritten. */
  def update(spark: SparkSession, dir: String, pairs: DataFrame,
             batchId: Long, numBuckets: Int = 64): Unit = {
    val e = pairs.select(col("id_a"), col("id_b"))
      .filter(col("id_a").isNotNull && col("id_b").isNotNull)
      .distinct()
      .localCheckpoint(true) // root mapping + isolated-node rows consume it
    val labels = snapshot(spark, dir)
      .localCheckpoint(true) // root lookup + member remap consume it
    // batch endpoints → current roots (absent node roots itself)
    val withRoots = e
      .join(labels.select(col("id").as("id_a"), col("component").as("ra")),
        Seq("id_a"), "left")
      .join(labels.select(col("id").as("id_b"), col("component").as("rb")),
        Seq("id_b"), "left")
      .select(col("id_a"), col("id_b"),
        coalesce(col("ra"), col("id_a")).as("ra"),
        coalesce(col("rb"), col("id_b")).as("rb"))
      .localCheckpoint(true) // root graph + per-node root rows consume it
    // contracted root graph: one node per touched component
    val rootEdges = withRoots.filter(col("ra") =!= col("rb"))
      .select(col("ra").as("id_a"), col("rb").as("id_b")).distinct()
    // O(log d) min-label CC on the contracted graph — (oldRoot, newRoot)
    val remap = Dedup.connectedComponents(rootEdges)
      .select(col("id").as("old_root"), col("component").as("new_root"))
      .localCheckpoint(true) // existing-member remap + batch rows consume it
    // rows to upsert: existing members of components that merged...
    val movedExisting = labels
      .join(remap.filter(col("old_root") =!= col("new_root"))
        .withColumnRenamed("old_root", "component"), Seq("component"))
      .select(col("id"), col("new_root").as("component"))
    // ...plus every batch endpoint under its final root
    val batchNodes = withRoots
      .select(col("id_a").as("id"), col("ra").as("component"))
      .unionByName(withRoots.select(col("id_b").as("id"), col("rb").as("component")))
      .distinct()
      .join(remap.withColumnRenamed("old_root", "component"), Seq("component"), "left")
      .select(col("id"), coalesce(col("new_root"), col("component")).as("component"))
    val upserts = movedExisting.unionByName(batchNodes).distinct()
      .withColumn("__v", lit(batchId))
    graft.streaming.EventStream.upsertSinkBucketed(
      upserts, batchId, labelsPath(dir), keyCol = "id", versionCol = "__v",
      numBuckets = numBuckets)
  }
}
