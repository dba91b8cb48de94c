package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable spatial grid index — the geospatial member of the durable-
  * index family (AnnIndex/SketchIndex): points stored as parquet
  * PARTITIONED BY their grid cell, so a radius or box query prunes to
  * the covered cells at PLANNING time (Hive-style partition pruning —
  * the same trick AnnIndex's IVF lists use with centroid ids). A
  * 1000-executor probe of a city-sized disc touches a handful of cell
  * directories, not the planet.
  *
  * Layout: `<dir>/pts/batch=<id>/cx=<n>/cy=<m>/…` + a
  * `_graft_cell_size` marker pinning the grid constant (a query or
  * append with a different cell size would silently probe the wrong
  * directories — the marker makes the mismatch loud), and one
  * `_graft_batch_<id>` commit marker per ingest.
  *
  * Ingest atomicity: a parquet append is NOT atomic — a crash mid-job
  * can leave partial part-files, and a dedup-by-id replay would then
  * see the partial batch as "already stored" and silently drop the
  * rest (the first cut of this index had exactly that hole). Instead
  * every ingest writes under its own `batch=<id>` partition and
  * commits by writing the batch marker LAST; readers union only
  * MARKED batches (a tiny marker listing + an `isin` partition filter,
  * pruned with the rest). Replays of a committed id are no-ops; a
  * crashed, unmarked batch is overwritten wholesale by its retry.
  * Build deletes old data FIRST and writes the cell-size marker LAST,
  * so a crashed rebuild can never pair a fresh marker with
  * stale-layout data. SINGLE WRITER by contract.
  */
object GeoIndex {

  private def ptsDir(indexDir: String) = s"$indexDir/pts"
  private def markerPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(s"$indexDir/_graft_cell_size")
  private def batchMarker(indexDir: String, batchId: Long) =
    new org.apache.hadoop.fs.Path(s"$indexDir/_graft_batch_$batchId")

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def touch(spark: SparkSession, p: org.apache.hadoop.fs.Path,
                    body: String): Unit = {
    val out = fs(spark, p.toString).create(p, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** The cell size the index was built with; loud if absent. */
  def cellSize(spark: SparkSession, indexDir: String): Long = {
    val p = markerPath(indexDir)
    val hfs = fs(spark, indexDir)
    require(hfs.exists(p), s"no geo index at $indexDir (marker missing)")
    val in = hfs.open(p)
    val s = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    s.trim.toLong
  }

  /** Ids of committed ingest batches (marker files — O(batches)). */
  def committedBatches(spark: SparkSession, indexDir: String): Seq[Long] = {
    val hfs = fs(spark, indexDir)
    val root = new org.apache.hadoop.fs.Path(indexDir)
    if (!hfs.exists(root)) Seq.empty
    else hfs.listStatus(root).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("_graft_batch_"))
      .map(_.stripPrefix("_graft_batch_").toLong).sorted
  }

  private def withCells(points: DataFrame, cell: Long, batchId: Long): DataFrame =
    points.select(col("id"), col("px"), col("py"),
      lit(batchId).as("batch"),
      expr(s"px DIV $cell").as("cx"), expr(s"py DIV $cell").as("cy"))

  /** Build the index from `points` (id, px, py non-negative) as
    * batch 0. */
  def build(spark: SparkSession, points: DataFrame, indexDir: String,
            cell: Long): Unit = {
    val hfs = fs(spark, indexDir)
    // old data (and markers) go first: a crash mid-rebuild must never
    // leave a fresh marker over stale-layout directories
    hfs.delete(new org.apache.hadoop.fs.Path(indexDir), true)
    withCells(points, cell, 0L).write.partitionBy("batch", "cx", "cy")
      .parquet(ptsDir(indexDir))
    touch(spark, batchMarker(indexDir, 0L), "")
    touch(spark, markerPath(indexDir), cell.toString)
  }

  /** Append a batch (id, px, py) under `batchId`. Committed ids are
    * no-ops; a crashed (unmarked) attempt is overwritten wholesale by
    * the retry — exactly-once without any id dedup scan. Batches are
    * DELTAS by producer contract: replaying a batchId is always safe,
    * but resubmitting the same point under a NEW batchId duplicates it
    * (same contract as TableLog.append). */
  def append(spark: SparkSession, indexDir: String, batch: DataFrame,
             batchId: Long): Boolean = {
    val cell = cellSize(spark, indexDir)
    require(batchId > 0, "batch 0 is the build; appends start at 1")
    val hfs = fs(spark, indexDir)
    if (hfs.exists(batchMarker(indexDir, batchId))) return false // replay
    val dir = new org.apache.hadoop.fs.Path(s"${ptsDir(indexDir)}/batch=$batchId")
    hfs.delete(dir, true) // clear a crashed partial attempt
    withCells(batch, cell, batchId).drop("batch")
      .write.partitionBy("cx", "cy").parquet(dir.toString)
    touch(spark, batchMarker(indexDir, batchId), "")
    true
  }

  /** The indexed points (committed batches only). */
  def points(spark: SparkSession, indexDir: String): DataFrame = {
    val committed = committedBatches(spark, indexDir)
    spark.read.option("basePath", ptsDir(indexDir)).parquet(ptsDir(indexDir))
      .filter(col("batch").isin(committed: _*))
  }

  /** All indexed points within planar distance `r` of (qx, qy) — the
    * scan is restricted to the covered cells via the cx/cy PARTITION
    * columns (pruned at planning, pinned by GeoIndexSpec), exact d2
    * filter after. */
  def queryRadius(spark: SparkSession, indexDir: String,
                  qx: Long, qy: Long, r: Long): DataFrame = {
    val cell = cellSize(spark, indexDir)
    points(spark, indexDir)
      .filter(col("cx").between((qx - r) / cell, (qx + r) / cell) &&
              col("cy").between((qy - r) / cell, (qy + r) / cell))
      .withColumn("d2",
        (col("px") - qx) * (col("px") - qx) +
        (col("py") - qy) * (col("py") - qy))
      .filter(col("d2") <= r * r)
      .select("id", "px", "py", "d2")
  }

  /** All indexed points inside the half-open box [x0,x1)×[y0,y1). */
  def queryBox(spark: SparkSession, indexDir: String,
               x0: Long, y0: Long, x1: Long, y1: Long): DataFrame = {
    val cell = cellSize(spark, indexDir)
    points(spark, indexDir)
      .filter(col("cx").between(x0 / cell, (x1 - 1) / cell) &&
              col("cy").between(y0 / cell, (y1 - 1) / cell))
      .filter(col("px") >= x0 && col("px") < x1 &&
              col("py") >= y0 && col("py") < y1)
      .select("id", "px", "py")
  }
}
