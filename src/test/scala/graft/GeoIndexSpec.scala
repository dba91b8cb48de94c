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

  test("append commits by marker: replay no-op, crashed partials invisible") {
    val dir = tmp()
    val p = pts()
    GeoIndex.build(spark, p.filter(col("id") % 2 === 0), dir, cell = 10000000L)
    assert(GeoIndex.append(spark, dir, p.filter(col("id") % 2 === 1), batchId = 1))
    val n1 = GeoIndex.points(spark, dir).count()
    assert(!GeoIndex.append(spark, dir, p.filter(col("id") % 2 === 1), batchId = 1))
    assert(n1 == p.count() && GeoIndex.points(spark, dir).count() == n1)
    // incremental content equals a one-shot build
    val inc = GeoIndex.points(spark, dir)
      .select("id", "px", "py").collect().map(_.toSeq).toSet
    val dir2 = tmp()
    GeoIndex.build(spark, p, dir2, cell = 10000000L)
    val full = GeoIndex.points(spark, dir2)
      .select("id", "px", "py").collect().map(_.toSeq).toSet
    assert(inc == full)
    // crash simulation: a partial batch dir WITHOUT its marker must be
    // invisible to queries, and the retry must overwrite + commit it.
    // Batches are DELTAS (fresh ids) by producer contract — replaying a
    // batchId is safe, resubmitting a point under a new id is not.
    val fresh = p.select((col("id") + 1000000L).as("id"), col("px"), col("py"))
    fresh.withColumn("cx", expr("px DIV 10000000"))
      .withColumn("cy", expr("py DIV 10000000"))
      .limit(5).write.partitionBy("cx", "cy").parquet(s"$dir/pts/batch=2")
    assert(GeoIndex.points(spark, dir).count() == n1, "unmarked batch leaked")
    assert(GeoIndex.append(spark, dir, fresh, batchId = 2))
    // multiset check: every id exactly once, no partial-file double-count
    val afterRetry = GeoIndex.points(spark, dir).groupBy("id").count()
      .filter(col("count") =!= 1).count()
    assert(afterRetry == 0, "duplicate ids after crashed-retry commit")
    assert(GeoIndex.points(spark, dir).count() == n1 + fresh.count())
  }

  test("querying a dir without a marker is loud") {
    val e = intercept[IllegalArgumentException] {
      GeoIndex.queryRadius(spark, tmp(), 0, 0, 1000)
    }
    assert(e.getMessage.contains("marker missing"))
  }
}
