package graft

import graft.operators.GeoIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import java.nio.file.Files

/** Pins the durable grid index: query ≡ brute force, PLANNING-time
  * partition pruning (the scan's partitionFilters — not a post-scan
  * filter), replay-safe append, and the loud missing-marker path.
  */
class GeoIndexSpec extends SparkSpecBase {

  private def pts() = Tables.customer(spark, sf0001).select(
    col("c_custkey").as("id"),
    ((col("c_custkey") * 2654435761L) % 360000001L).as("px"),
    ((((col("c_custkey") * col("c_custkey")) % 179424673L) * 48271L)
      % 180000001L).as("py"))

  private def tmp(): String = Files.createTempDirectory("geoidx").toString + "/idx"

  test("queryRadius and queryBox equal brute-force scans") {
    val dir = tmp()
    GeoIndex.build(spark, pts(), dir, cell = 10000000L)
    val all = pts().collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val (qx, qy, r) = (all.head._2, all.head._3, 30000000L)
    val got = GeoIndex.queryRadius(spark, dir, qx, qy, r)
      .collect().map(_.getLong(0)).toSet
    val want = all.filter { case (_, px, py) =>
      val (dx, dy) = (px - qx, py - qy); dx * dx + dy * dy <= r * r
    }.map(_._1).toSet
    assert(want.nonEmpty && got == want)

    val box = GeoIndex.queryBox(spark, dir, qx - r, qy - r, qx + r, qy + r)
      .collect().map(_.getLong(0)).toSet
    val wantBox = all.filter { case (_, px, py) =>
      px >= qx - r && px < qx + r && py >= qy - r && py < qy + r }.map(_._1).toSet
    assert(wantBox.nonEmpty && box == wantBox)
  }

  test("radius query prunes partitions at planning time") {
    val dir = tmp()
    GeoIndex.build(spark, pts(), dir, cell = 10000000L)
    val q = GeoIndex.queryRadius(spark, dir, 100000000L, 100000000L, 15000000L)
    val scans = q.queryExecution.executedPlan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan.collect {
        case f: FileSourceScanExec => f }
      case f: FileSourceScanExec => Seq(f)
    }.flatten
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "cx/cy restrictions must land in partitionFilters")
    // and the pruning actually bites: selected partitions < total cells
    val total = spark.read.parquet(s"$dir/pts")
      .select("cx", "cy").distinct().count()
    val selected = scans.map(_.selectedPartitions.partitionCount.toLong).sum
    assert(selected < total, s"$selected of $total cells scanned")
  }

  test("append skips already-indexed ids (replay no-op)") {
    val dir = tmp()
    val p = pts()
    GeoIndex.build(spark, p.filter(col("id") % 2 === 0), dir, cell = 10000000L)
    GeoIndex.append(spark, dir, p.filter(col("id") % 2 === 1))
    val n1 = spark.read.parquet(s"$dir/pts").count()
    GeoIndex.append(spark, dir, p.filter(col("id") % 2 === 1)) // replay
    val n2 = spark.read.parquet(s"$dir/pts").count()
    assert(n1 == p.count() && n2 == n1)
    // incremental content equals a one-shot build
    val inc = spark.read.parquet(s"$dir/pts")
      .select("id", "px", "py").collect().map(_.toSeq).toSet
    val dir2 = tmp()
    GeoIndex.build(spark, p, dir2, cell = 10000000L)
    val full = spark.read.parquet(s"$dir2/pts")
      .select("id", "px", "py").collect().map(_.toSeq).toSet
    assert(inc == full)
  }

  test("querying a dir without a marker is loud") {
    val e = intercept[IllegalArgumentException] {
      GeoIndex.queryRadius(spark, tmp(), 0, 0, 1000)
    }
    assert(e.getMessage.contains("marker missing"))
  }
}
