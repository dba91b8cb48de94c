package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregation maintenance (SURVEY.md §2 L39): a durable
  * materialized per-group aggregate that new batches MERGE into, instead
  * of re-scanning history — batch cost is O(batch + |groups|),
  * independent of how much data the state already summarizes. This is
  * the batch-side twin of the streaming agg's state store: at 100 TB a
  * daily "recompute the running totals" job is a full-history scan, but
  * the mergeable-state form touches only the new partition. Mirrors the
  * reference's materialized aggregate views over federated sources
  * (reference: README.md query surface).
  *
  * State layout: `<stateDir>/agg` (one row per group: count/sum/min/max
  * partials — every classic algebraic aggregate is derivable, avg
  * included) plus `<stateDir>/batches` (applied batch ids). Both live
  * under ONE directory published by the shared backup-rename protocol
  * ([[graft.streaming.EventStream.publishWithBackup]]), so the merged
  * aggregates and the replay marker commit ATOMICALLY: unlike the
  * per-key upsert sinks, an additive merge is NOT naturally idempotent —
  * a marker that could land without its merge (or vice versa) would
  * lose or double-count a batch. A crash at any point leaves the old or
  * the new state, never a mix (recovery-first restore, same as
  * [[Layout.compact]]).
  *
  * Values are aggregated as LONGS (callers micro-quantize floats, the
  * repo-wide convention): the merged sums are then bit-identical to a
  * from-scratch aggregation under ANY batch split or partitioning —
  * float partial sums would drift by reassociation and the
  * incremental-≡-full contract (spec'd, plus the oracle-checked
  * `iv1_incremental_agg` entry) could not be exact.
  */
object IncrementalAgg {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def partials(batch: DataFrame, key: String, value: String): DataFrame =
    batch.groupBy(col(key).as("k"))
      .agg(count(lit(1)).as("cnt"), sum(col(value).cast("long")).as("sm"),
        min(col(value).cast("long")).as("mn"), max(col(value).cast("long")).as("mx"))

  /** Merge `batch` into the state at `stateDir`, creating it if absent.
    * Replayed batch ids are no-ops (exactly-once against at-least-once
    * delivery). Returns true iff the batch was applied.
    *
    * SINGLE WRITER by contract (like every rename-published state in
    * this repo — the bucketed sink, compaction, the ANN indexes): two
    * concurrent updaters could both read the same base state and the
    * second publish would silently drop the first batch's merge. Batch
    * pipelines serialize naturally (one scheduler slot per table); a
    * multi-writer deployment needs a lock or a log-structured table
    * format, which is out of scope here. */
  def update(spark: SparkSession, stateDir: String, batch: DataFrame,
             batchId: Long, key: String, value: String): Boolean = {
    import spark.implicits._
    val hfs = fs(spark, stateDir)
    val main = new org.apache.hadoop.fs.Path(stateDir)
    val backup = new org.apache.hadoop.fs.Path(stateDir + ".__backup")
    val staging = new org.apache.hadoop.fs.Path(stateDir + ".__staging")
    // recovery first: a crash between the publish renames leaves the
    // backup as the only copy — restore before reading anything
    graft.streaming.EventStream.recoverFirst(hfs, main, backup)
    hfs.delete(staging, true)

    val exists = hfs.exists(main)
    // marker table is one long per applied batch — read it ONCE to the
    // driver (bounded by batch count); a second lazy scan at write time
    // could in principle observe a different listing
    val appliedIds: Seq[Long] =
      if (!exists) Seq.empty
      else spark.read.parquet(s"$stateDir/batches").as[Long].collect().toSeq
    if (appliedIds.contains(batchId)) return false // replay — already committed
    val newPart = partials(batch, key, value)
    val merged =
      if (!exists) newPart
      else spark.read.parquet(s"$stateDir/agg").union(newPart)
        .groupBy("k")
        .agg(sum("cnt").as("cnt"), sum("sm").as("sm"),
          min("mn").as("mn"), max("mx").as("mx"))
    val batches = (appliedIds :+ batchId).toDF("batch_id")
    // stage the WHOLE next state (agg + marker), then one atomic swap
    merged.write.parquet(s"$staging/agg")
    batches.write.parquet(s"$staging/batches")
    try graft.streaming.EventStream.publishWithBackup(hfs, staging, main, backup)
    catch { case e: java.io.IOException =>
      if (!hfs.exists(main) && hfs.exists(backup)) hfs.rename(backup, main)
      throw e
    }
    true
  }

  /** MV-layout variant of [[update]]: state rows are
    * `(dims..., __cnt, __sum_<c>...)` — the EXACT summary layout
    * [[MaterializedView.build]] writes and [[graft.plans.RewriteToMv]]
    * serves, so an advisor-recommended MV can be maintained per ingest
    * batch instead of rebuilt (the [[graft.plans.MvAutoPilot]] loop).
    * Same atomic staging/backup publish + replay guard as [[update]];
    * merge cost is O(batch + |dim tuples|), never a base re-scan. */
  def updateMv(spark: SparkSession, stateDir: String, batch: DataFrame,
               batchId: Long, dims: Seq[String], sums: Seq[String]): Boolean = {
    import spark.implicits._
    require(dims.nonEmpty, "updateMv: at least one dimension")
    val hfs = fs(spark, stateDir)
    val main = new org.apache.hadoop.fs.Path(stateDir)
    val backup = new org.apache.hadoop.fs.Path(stateDir + ".__backup")
    val staging = new org.apache.hadoop.fs.Path(stateDir + ".__staging")
    graft.streaming.EventStream.recoverFirst(hfs, main, backup)
    hfs.delete(staging, true)

    val exists = hfs.exists(main)
    val appliedIds: Seq[Long] =
      if (!exists) Seq.empty
      else spark.read.parquet(s"$stateDir/batches").as[Long].collect().toSeq
    if (appliedIds.contains(batchId)) return false
    val aggCols = Seq(count(lit(1)).as("__cnt")) ++
      sums.map(c => sum(col(c).cast("long")).as(s"__sum_$c"))
    val newPart = batch.groupBy(dims.map(col): _*)
      .agg(aggCols.head, aggCols.tail: _*)
    val reAgg = Seq(sum("__cnt").as("__cnt")) ++
      sums.map(c => sum(s"__sum_$c").as(s"__sum_$c"))
    val merged =
      if (!exists) newPart
      else spark.read.parquet(s"$stateDir/agg").union(newPart)
        .groupBy(dims.map(col): _*)
        .agg(reAgg.head, reAgg.tail: _*)
    val batches = (appliedIds :+ batchId).toDF("batch_id")
    merged.write.parquet(s"$staging/agg")
    batches.write.parquet(s"$staging/batches")
    try graft.streaming.EventStream.publishWithBackup(hfs, staging, main, backup)
    catch { case e: java.io.IOException =>
      if (!hfs.exists(main) && hfs.exists(backup)) hfs.rename(backup, main)
      throw e
    }
    true
  }

  /** The maintained MV summary, in the layout the rewrite serves. */
  def snapshotMv(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/agg")

  /** The maintained aggregates: every algebraic aggregate the partials
    * derive — count, sum, min, max, and avg as the exact-integer
    * division (double of two exact longs, engine-portable). */
  def snapshot(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(s"$stateDir/agg")
      .select(col("k"), col("cnt"), col("sm"), col("mn"), col("mx"),
        (col("sm").cast("double") / col("cnt").cast("double")).as("avg"))
      .orderBy("k")

  val catalog: Seq[Q] = Seq(
    // L39 — the incremental maintenance contract, oracle-checked: three
    // deterministic hash-split batches of orders merged one at a time
    // (plus one REPLAYED batch proving the no-op guard) must equal the
    // from-scratch SQL aggregate exactly.
    Q(
      "iv1_incremental_agg",
      """SELECT o_orderpriority AS k, count(*) AS cnt,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sm,
        |  min(CAST(round(o_totalprice*100) AS BIGINT)) AS mn,
        |  max(CAST(round(o_totalprice*100) AS BIGINT)) AS mx,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)
        |    / count(*) AS avg
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val dir = java.nio.file.Files.createTempDirectory("incragg").toString + "/state"
      val o = Tables.orders(s, d)
        .withColumn("cents", round(col("o_totalprice") * 100).cast("long"))
      (0 until 3).foreach { b =>
        update(s, dir, o.filter(pmod(xxhash64(col("o_orderkey")), lit(3)) === b),
          batchId = b, key = "o_orderpriority", value = "cents")
      }
      // replayed batch: must be a committed-marker no-op, not a double-count
      update(s, dir, o.filter(pmod(xxhash64(col("o_orderkey")), lit(3)) === 1),
        batchId = 1, key = "o_orderpriority", value = "cents")
      snapshot(s, dir)
    }
  )
}
