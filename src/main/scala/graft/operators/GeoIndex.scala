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
  * Layout: `<dir>/pts/cx=<n>/cy=<m>/…` + a `_graft_cell_size` marker
  * pinning the grid constant (a query or append with a different cell
  * size would silently probe the wrong directories — the marker makes
  * the mismatch loud). Build deletes the old data FIRST and writes the
  * marker LAST, so a crashed rebuild can never pair old-layout data
  * with a new marker (the r3-advisory lesson from the LSH index).
  *
  * Appends anti-join on stored ids (column-pruned scan), so replayed
  * batches are no-ops — same replay discipline as AnnIndex.append.
  * SINGLE WRITER by contract.
  */
object GeoIndex {

  private def ptsDir(indexDir: String) = s"$indexDir/pts"
  private def markerPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(s"$indexDir/_graft_cell_size")

  private def fs(spark: SparkSession, dir: String) =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeMarker(spark: SparkSession, indexDir: String, cell: Long): Unit = {
    val out = fs(spark, indexDir).create(markerPath(indexDir), true)
    try out.write(cell.toString.getBytes("UTF-8")) finally out.close()
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

  private def withCells(points: DataFrame, cell: Long): DataFrame =
    points.select(col("id"), col("px"), col("py"),
      expr(s"px DIV $cell").as("cx"), expr(s"py DIV $cell").as("cy"))

  /** Build the index from `points` (id, px, py non-negative). */
  def build(spark: SparkSession, points: DataFrame, indexDir: String,
            cell: Long): Unit = {
    val hfs = fs(spark, indexDir)
    // old data (and marker) go first: a crash mid-rebuild must never
    // leave a fresh marker over stale-layout directories
    hfs.delete(markerPath(indexDir), false)
    hfs.delete(new org.apache.hadoop.fs.Path(ptsDir(indexDir)), true)
    withCells(points, cell).write.partitionBy("cx", "cy")
      .parquet(ptsDir(indexDir))
    writeMarker(spark, indexDir, cell)
  }

  /** Append a batch (id, px, py); already-indexed ids are skipped, so a
    * replayed batch appends nothing. */
  def append(spark: SparkSession, indexDir: String, batch: DataFrame): Unit = {
    val cell = cellSize(spark, indexDir)
    val stored = spark.read.parquet(ptsDir(indexDir)).select("id")
    withCells(batch, cell)
      .join(stored, Seq("id"), "left_anti")
      .write.mode("append").partitionBy("cx", "cy").parquet(ptsDir(indexDir))
  }

  /** All indexed points within planar distance `r` of (qx, qy) — the
    * scan is restricted to the covered cells via the cx/cy PARTITION
    * columns (pruned at planning, pinned by GeoIndexSpec), exact d2
    * filter after. */
  def queryRadius(spark: SparkSession, indexDir: String,
                  qx: Long, qy: Long, r: Long): DataFrame = {
    val cell = cellSize(spark, indexDir)
    spark.read.parquet(ptsDir(indexDir))
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
    spark.read.parquet(ptsDir(indexDir))
      .filter(col("cx").between(x0 / cell, (x1 - 1) / cell) &&
              col("cy").between(y0 / cell, (y1 - 1) / cell))
      .filter(col("px") >= x0 && col("px") < x1 &&
              col("py") >= y0 && col("py") < y1)
      .select("id", "px", "py")
  }
}
