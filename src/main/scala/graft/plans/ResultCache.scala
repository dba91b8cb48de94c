package graft.plans

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Semantic result cache (SURVEY §2 R127): re-running a query whose
  * PLAN and INPUTS are unchanged re-reads the stored answer instead of
  * recomputing it — the engine-side memo a dashboard fleet hammers at
  * 100 TB, where the same daily aggregate is replanned thousands of
  * times per hour.
  *
  * Keying: entries are content-addressed by
  * `md5(canonicalized logical plan ‖ sorted input-file fingerprints)`.
  * The canonicalized plan normalizes expression IDs, so two
  * independently-built but structurally identical DataFrames share one
  * key; the fingerprint (path, length, modification time of every
  * input file) invalidates the entry the moment ANY input changes —
  * correctness never depends on a TTL. The fingerprint listing is the
  * same driver-side file metadata scan planning already performs, so
  * the cache adds no new scale term.
  *
  * Publish: results are immutable once written, so the protocol is
  * write-to-staging → atomic rename to the digest dir; the rename
  * loser simply discards its staging and reads the winner. A marker
  * file written INTO the staging dir before the rename carries the
  * result schema, making zero-row results (a parquet dir with no data
  * files) readable on hit and making a half-written dir (no marker —
  * only possible for a crashed non-atomic copy) detectably invalid.
  * Eviction is an ops policy (age/LRU sweep of digest dirs), not a
  * correctness concern, and is intentionally not implemented here.
  */
object ResultCache {

  private val MARKER = "_graft_result_cache"

  /** Content address of `df`: canonical plan text + input fingerprints. */
  def digestOf(df: DataFrame): String = {
    val spark = df.sparkSession
    val planText = df.queryExecution.analyzed.canonicalized.toString()
    val conf = spark.sparkContext.hadoopConfiguration
    val files = df.inputFiles.sorted.map { f =>
      val p = new Path(f)
      val st = p.getFileSystem(conf).getFileStatus(p)
      s"$f:${st.getLen}:${st.getModificationTime}"
    }
    val md = MessageDigest.getInstance("MD5")
    md.update(planText.getBytes(StandardCharsets.UTF_8))
    files.foreach(f => md.update(f.getBytes(StandardCharsets.UTF_8)))
    md.digest().map("%02x".format(_)).mkString
  }

  /** Run `df` through the cache rooted at `cacheRoot`. Returns the
    * result frame and whether it was served from the cache. On a hit
    * the returned frame SCANS THE CACHE DIR — the original plan is not
    * re-executed.
    */
  def through(df: DataFrame, cacheRoot: String): (DataFrame, Boolean) = {
    val spark = df.sparkSession
    val root = new Path(cacheRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entry = new Path(root, digestOf(df))
    val marker = new Path(entry, MARKER)
    if (fs.exists(marker)) (readEntry(spark, fs, entry, marker), true)
    else {
      val staging =
        new Path(root, s".staging-${java.util.UUID.randomUUID().toString}")
      df.write.mode("overwrite").parquet(staging.toString)
      // marker (with the result schema) lands INSIDE staging before the
      // publish rename: after the rename the entry is atomically either
      // absent or complete-with-marker.
      val out = fs.create(new Path(staging, MARKER))
      out.write(df.schema.json.getBytes(StandardCharsets.UTF_8))
      out.close()
      // Re-check before publishing: a concurrent writer may have won
      // since the miss-check. On a local FS, rename into an EXISTING
      // destination dir can "succeed" by moving the staging dir INSIDE
      // the entry (POSIX move-into-dir fallback) — hidden from Spark
      // reads by the dot prefix, but permanently out of sweepStaging's
      // reach. Treating a published entry as a hit avoids that path.
      if (fs.exists(marker)) {
        fs.delete(staging, true)
        (readEntry(spark, fs, entry, marker), true)
      } else {
        if (!fs.rename(staging, entry)) {
          // lost the publish race (or a previous run published first):
          // the winner's entry is complete — drop ours and read theirs.
          fs.delete(staging, true)
          require(fs.exists(marker),
            s"result cache: rename to $entry failed but no published entry exists")
        } else {
          // Belt-and-braces for the remaining race window: if the rename
          // landed our staging dir NESTED inside a concurrently-published
          // entry, remove the embedded junk dir.
          val nested = new Path(entry, staging.getName)
          if (fs.exists(nested)) fs.delete(nested, true)
        }
        (readEntry(spark, fs, entry, marker), false)
      }
    }
  }

  private def readEntry(spark: SparkSession, fs: org.apache.hadoop.fs.FileSystem,
                        entry: Path, marker: Path): DataFrame = {
    val in = fs.open(marker)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    val schema = DataType.fromJson(json).asInstanceOf[StructType]
    val hasData = fs.listStatus(entry)
      .exists(st => st.getPath.getName.endsWith(".parquet"))
    if (hasData) spark.read.schema(schema).parquet(entry.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  /** Drop leftover staging dirs (crashed writers). Safe any time: a
    * staging dir is never read by anyone. */
  def sweepStaging(spark: SparkSession, cacheRoot: String): Unit = {
    val root = new Path(cacheRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root))
      fs.listStatus(root)
        .filter(_.getPath.getName.startsWith(".staging-"))
        .foreach(st => fs.delete(st.getPath, true))
  }
}
