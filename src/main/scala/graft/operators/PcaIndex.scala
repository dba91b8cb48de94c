package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable + incremental PCA fit (SURVEY.md §2 L50c) — the moment-index
  * twin of L2b/L7c/L39: covariance is algebraic in exact integer
  * moments (pair-product sums, dim sums, counts — all 1e6-quantized
  * longs), so a new embedding batch MERGES into a ≤d(d+1)/2 + d row
  * state instead of re-scanning the corpus. Re-fitting the components
  * after an ingest costs O(batch + d²), independent of corpus size —
  * at 100 TB the difference between "update the projection nightly"
  * and "re-run a full-corpus fit nightly".
  *
  * State layout mirrors [[IncrementalAgg]]: `<dir>/pair` (i, j, ss, n),
  * `<dir>/dim` (i, s, n), `<dir>/batches` (applied batch ids), all
  * staged and published atomically by the shared backup-rename protocol
  * ([[graft.streaming.EventStream.publishWithBackup]]) — an additive
  * merge is not idempotent, so the moments and the replay marker must
  * commit together; a crash leaves old or new state, never a mix.
  * SINGLE WRITER by contract, like every rename-published state here.
  *
  * Because the moments are exact and the merge is integer addition,
  * the stored state after any batch split equals the one-shot moments
  * BIT FOR BIT, and the derived covariance/components/projection are
  * identical to [[Similarity.pcaProject]]'s — the spec asserts exact
  * equality, not tolerance.
  */
object PcaIndex {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Merge an embedding batch `(vec_id, embedding)` into the moment
    * state at `stateDir`, creating it if absent. Replayed batch ids are
    * no-ops. Returns true iff the batch was applied. */
  /** Recovery-first, on EVERY entry point (reads included): a crash
    * inside the publish can leave the backup as the only copy. */
  private def recover(spark: SparkSession, stateDir: String): Unit =
    graft.streaming.EventStream.recoverFirst(fs(spark, stateDir),
      new org.apache.hadoop.fs.Path(stateDir),
      new org.apache.hadoop.fs.Path(stateDir + ".__backup"))

  def update(spark: SparkSession, stateDir: String, batch: DataFrame,
             batchId: Long): Boolean = {
    import spark.implicits._
    val hfs = fs(spark, stateDir)
    val main = new org.apache.hadoop.fs.Path(stateDir)
    val backup = new org.apache.hadoop.fs.Path(stateDir + ".__backup")
    val staging = new org.apache.hadoop.fs.Path(stateDir + ".__staging")
    recover(spark, stateDir)
    hfs.delete(staging, true)

    val exists = hfs.exists(main)
    val appliedIds: Seq[Long] =
      if (!exists) Seq.empty
      else spark.read.parquet(s"$stateDir/batches").as[Long].collect().toSeq
    if (appliedIds.contains(batchId)) return false // replay — already committed

    val (bp, bm) = Similarity.covMoments(batch)
    val (pair, dim) =
      if (!exists) (bp, bm)
      else (
        spark.read.parquet(s"$stateDir/pair").unionByName(bp)
          .groupBy("i", "j").agg(sum("ss").as("ss"), sum("n").as("n")),
        spark.read.parquet(s"$stateDir/dim").unionByName(bm)
          .groupBy("i").agg(sum("s").as("s"), sum("n").as("n")))
    pair.write.parquet(s"$staging/pair")
    dim.write.parquet(s"$staging/dim")
    (appliedIds :+ batchId).toDF("batch_id").write.parquet(s"$staging/batches")
    try graft.streaming.EventStream.publishWithBackup(hfs, staging, main, backup)
    catch { case e: java.io.IOException =>
      if (!hfs.exists(main) && hfs.exists(backup)) hfs.rename(backup, main)
      throw e
    }
    true
  }

  /** Covariance derived from the stored moments — same expression tree
    * as the inline fit ([[Similarity.covFromMoments]]). */
  def covariance(spark: SparkSession, stateDir: String): DataFrame = {
    recover(spark, stateDir)
    Similarity.covFromMoments(
      spark.read.parquet(s"$stateDir/pair"),
      spark.read.parquet(s"$stateDir/dim"))
  }

  /** Project `(vec_id, label, embedding)` rows onto the top-k components
    * of the STORED fit — one scan-local pass, no corpus re-fit. */
  def project(spark: SparkSession, stateDir: String, e: DataFrame,
              k: Int = 4): DataFrame = {
    recover(spark, stateDir)
    val (evecs, mu) = Similarity.fitFromMoments(
      spark.read.parquet(s"$stateDir/pair"),
      spark.read.parquet(s"$stateDir/dim"))
    Similarity.projectWith(e, evecs, mu, k)
  }
}
