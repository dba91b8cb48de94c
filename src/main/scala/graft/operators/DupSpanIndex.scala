package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable + incremental duplicated-gram index (SURVEY.md §2 L48b) —
  * dd14's ingest path. The corpus-wide state is gram-hash occurrence
  * counts, which are ADDITIVE, but unlike [[PcaIndex]] the state is
  * corpus-sized (one row per distinct gram), so a read-modify-rewrite
  * merge would cost O(state) per batch. This index is LOG-STRUCTURED
  * instead: each ingest appends its partial counts as a delta
  * directory (`<dir>/delta/batch=<id>/`), committed by ONE atomic
  * rename — O(batch) work and IO, state never rewritten; readers sum
  * across deltas (merge-on-read), and [[compact]] folds the deltas
  * back to one (the amortized maintenance op, crash-safe via the
  * shared backup-rename publish).
  *
  * Replay guard: the committed delta directory IS the marker — a
  * retried batch sees `batch=<id>` present and no-ops, and a crash
  * before the rename leaves only staging garbage (cleaned on the next
  * append), never a half-commit. SINGLE WRITER per batch id by
  * contract, like every rename-published state in this repo.
  *
  * Ingest-time semantics (the L2b shape): [[reportBatch]] flags a
  * just-appended batch against EVERYTHING SEEN SO FAR — a batch doc's
  * gram is duplicated iff its total count across all deltas (its own
  * included) is ≥ 2. For the latest batch that equals the one-shot
  * dd14 answer restricted to the batch's docs (spec'd exactly); docs
  * ingested EARLIER keep their at-ingest-time report, which cannot see
  * later arrivals — re-run [[Corpus.dupSpanCoverage]] (or re-report
  * batches) after a backfill when retrospective coverage is needed.
  */
object DupSpanIndex {

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def deltaRoot(dir: String) = s"$dir/delta"

  /** Recovery-first (every entry point): a crash between compaction's
    * publish renames can leave the backup as the only copy. */
  private def recover(hfs: org.apache.hadoop.fs.FileSystem, dir: String): Unit =
    graft.streaming.EventStream.recoverFirst(hfs,
      new org.apache.hadoop.fs.Path(deltaRoot(dir)),
      new org.apache.hadoop.fs.Path(dir + "/.delta_backup"))

  /** Append `batchDocs`' gram partial counts as one delta commit.
    * Returns true iff the batch was applied (false = replay no-op). */
  def append(spark: SparkSession, dir: String, batchDocs: DataFrame,
             batchId: Long, n: Int = 8): Boolean = {
    val hfs = fs(spark, dir)
    recover(hfs, dir)
    val committed = new org.apache.hadoop.fs.Path(s"${deltaRoot(dir)}/batch=$batchId")
    if (hfs.exists(committed)) return false // replay — already committed
    // clean any staging debris from a crashed earlier attempt
    val root = new org.apache.hadoop.fs.Path(deltaRoot(dir))
    if (hfs.exists(root)) {
      hfs.listStatus(root).filter(_.getPath.getName.startsWith(".tmp-"))
        .foreach(st => hfs.delete(st.getPath, true))
    } else hfs.mkdirs(root)
    val staging = new org.apache.hadoop.fs.Path(s"${deltaRoot(dir)}/.tmp-$batchId")
    Corpus.gramFrame(Corpus.gramBase(batchDocs, n, checkpoint = false), n)
      .groupBy("ph").agg(count(lit(1)).as("cnt"))
      .write.parquet(staging.toString)
    if (!hfs.rename(staging, committed))
      throw new java.io.IOException(s"dup-span index: commit rename failed for batch $batchId")
    true
  }

  /** Total gram occurrence counts across all committed deltas
    * (merge-on-read). */
  def occCounts(spark: SparkSession, dir: String): DataFrame = {
    recover(fs(spark, dir), dir)
    spark.read.parquet(deltaRoot(dir))
      .groupBy("ph").agg(sum("cnt").as("occ"))
  }

  /** At-ingest-time coverage report for a batch already appended: its
    * docs' spans flagged against the merged counts (batch included). */
  def reportBatch(spark: SparkSession, dir: String, batchDocs: DataFrame,
                  n: Int = 8): DataFrame = {
    val base = Corpus.gramBase(batchDocs, n)
    val dup = Corpus.gramFrame(base, n)
      .join(occCounts(spark, dir), Seq("ph"))
      .filter(col("occ") >= 2)
      .select(col("doc_id"), col("i"))
    Corpus.coverageFromDup(dup, base, n)
  }

  /** Fold all deltas into one (amortized maintenance — readers touch
    * one file set again). Crash-safe: the whole delta root swaps via
    * the shared backup-rename protocol. Compaction PRESERVES the
    * applied-batch replay guard: merged counts land under the first
    * applied id and every later id keeps an empty committed directory,
    * so a replayed append still no-ops after compaction. */
  def compact(spark: SparkSession, dir: String): Unit = {
    val hfs = fs(spark, dir)
    recover(hfs, dir)
    val root = new org.apache.hadoop.fs.Path(deltaRoot(dir))
    val applied = hfs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith("batch=")).sorted
    if (applied.length <= 1) return
    val merged = occCounts(spark, dir)
      .select(col("ph"), col("occ").as("cnt"))
    val staging = new org.apache.hadoop.fs.Path(dir + "/.delta_staging")
    val backup = new org.apache.hadoop.fs.Path(dir + "/.delta_backup")
    hfs.delete(staging, true)
    // compacted counts live under the FIRST applied id; later ids stay
    // as empty marker dirs so their replay guard survives compaction
    merged.write.parquet(s"$staging/${applied.head}")
    applied.tail.foreach(b =>
      hfs.mkdirs(new org.apache.hadoop.fs.Path(s"$staging/$b")))
    try graft.streaming.EventStream.publishWithBackup(hfs, staging, root, backup)
    catch { case e: java.io.IOException =>
      if (!hfs.exists(root) && hfs.exists(backup)) hfs.rename(backup, root)
      throw e
    }
  }
}
