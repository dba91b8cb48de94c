package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._

/** L22/L23: write-side layout — Z-order clustering and small-file
  * compaction. The Z-order test measures the property that matters: the
  * fraction of files a point lookup must read under per-file min-max
  * pruning, on BOTH clustered dimensions, against a single-key-sorted
  * baseline layout of the same data.
  */
class LayoutSpec extends SparkSpecBase {

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString + "/t"

  test("z-order clustering prunes point lookups on BOTH dimensions; lead-key sort only on one") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val nFiles = 16

    // baseline: classic single-lead-key sorted layout
    val sortedDir = tmp("lead_sorted")
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(sortedDir)

    val zDir = tmp("zordered")
    Layout.zorderWrite(li, Seq("l_partkey", "l_suppkey"), zDir, nFiles)

    // identical content, different bytes layout
    assert(spark.read.parquet(zDir).exceptAll(li).isEmpty
      && li.exceptAll(spark.read.parquet(zDir)).isEmpty)

    import spark.implicits._
    val parts = li.select(col("l_partkey").cast("double")).distinct().as[Double]
      .collect().sorted
    val supps = li.select(col("l_suppkey").cast("double")).distinct().as[Double]
      .collect().sorted
    def avgFrac(dir: String, c: String, vs: Array[Double]): Double =
      vs.map(Layout.pruneFraction(spark, dir, c, _)).sum / vs.length

    // probe a spread of real key values on each dimension
    val probeParts = parts.indices.by(math.max(1, parts.length / 8)).map(parts).toArray
    val probeSupps = supps

    val zPart = avgFrac(zDir, "l_partkey", probeParts)
    val zSupp = avgFrac(zDir, "l_suppkey", probeSupps)
    val sPart = avgFrac(sortedDir, "l_partkey", probeParts)
    val sSupp = avgFrac(sortedDir, "l_suppkey", probeSupps)
    info(f"avg files read: zorder part=$zPart%.2f supp=$zSupp%.2f | lead-sorted part=$sPart%.2f supp=$sSupp%.2f")

    // lead-key sort: great on the lead key, useless on the other
    assert(sPart < 0.35, s"lead-sorted layout should prune its lead key, got $sPart")
    assert(sSupp > 0.9, s"lead-sorted layout cannot prune the second key, got $sSupp")
    // z-order: strictly useful on BOTH dimensions
    assert(zPart < 0.7, s"zorder must prune dim 1, got $zPart")
    assert(zSupp < 0.7, s"zorder must prune dim 2, got $zSupp")
  }

  test("compaction bin-packs a fragmented directory and preserves content") {
    val dir = tmp("fragmented")
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    li.repartition(64).write.mode("overwrite").parquet(dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def nParquet = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .count(_.getPath.getName.endsWith(".parquet"))
    assert(nParquet === 64)
    val before = li.orderBy("l_orderkey", "l_quantity").collect()

    val n = Layout.compact(spark, dir, targetBytes = 512 * 1024)
    assert(nParquet === n && n < 64, s"expected far fewer files, got $n")
    // no staging/backup debris, content bit-identical
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".__compact_staging")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".__compact_backup")))
    val after = spark.read.parquet(dir).orderBy("l_orderkey", "l_quantity").collect()
    assert(after.sameElements(before))
  }

  test("compaction recovers a crash that left the backup as the only copy") {
    val dir = tmp("crash")
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity")
    li.repartition(8).write.mode("overwrite").parquet(dir)
    val before = li.orderBy("l_orderkey", "l_quantity").collect()
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate dying between the two publish renames: live moved aside,
    // staged never promoted
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".__compact_backup")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    Layout.compact(spark, dir, targetBytes = 512 * 1024)
    val after = spark.read.parquet(dir).orderBy("l_orderkey", "l_quantity").collect()
    assert(after.sameElements(before), "recovery-first must restore, then compact")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir + ".__compact_backup")))
  }

  test("compaction refuses hive-partitioned directories instead of flattening them") {
    val dir = tmp("parted")
    Tables.orders(spark, sf0001)
      .withColumn("o_year", org.apache.spark.sql.functions.year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    val ex = intercept[IllegalArgumentException] {
      Layout.compact(spark, dir, targetBytes = 1024 * 1024)
    }
    assert(ex.getMessage.contains("hive-partitioned"))
    // table untouched
    assert(spark.read.parquet(dir).count() === Tables.orders(spark, sf0001).count())
  }

  test("partitioned compaction bin-packs every leaf partition and preserves the layout") {
    val dir = tmp("compactpart")
    // fragmented: 6 files per partition
    Tables.orders(spark, sf0001)
      .withColumn("p", (col("o_orderkey") % 3).cast("int"))
      .repartition(6)
      .write.partitionBy("p").parquet(dir)
    def filesPer(p: Int) =
      Option(new java.io.File(s"$dir/p=$p").listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    assert((0 to 2).forall(filesPer(_) > 1), "fixture must be fragmented")
    val before = spark.read.parquet(dir).orderBy("o_orderkey", "p")
      .collect().map(_.toString).toSeq

    val (nParts, nFiles) = Layout.compactPartitioned(spark, dir, targetBytes = 1L << 30)
    assert(nParts === 3 && nFiles === 3, s"expected 1 file per partition, got $nFiles")
    assert((0 to 2).forall(filesPer(_) === 1))
    // partition dirs survive (pruning still works) and content is identical
    val after = spark.read.parquet(dir).orderBy("o_orderkey", "p")
      .collect().map(_.toString).toSeq
    assert(after === before)
    val pruned = spark.read.parquet(dir).filter(col("p") === 1)
    val scan = pruned.queryExecution.executedPlan.toString
    assert(pruned.count() > 0 && scan.contains("PartitionFilters"),
      s"partition pruning must survive compaction:\n$scan")
  }

  test("z-order refuses bit budgets beyond a long instead of silently corrupting the curve") {
    val li0 = Tables.lineitem(spark, sf0001)
    // 11 dims x 6 bits = 66 interleaved bits > 63
    val wide = (8 to 10).foldLeft(li0)((d, i) =>
      d.withColumn(s"extra_$i", col("l_partkey") * i))
    val cols = Seq("l_partkey", "l_suppkey", "l_orderkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_linenumber",
      "extra_8", "extra_9", "extra_10")
    val ex = intercept[IllegalArgumentException] {
      Layout.zvalue(wide, cols)
    }
    assert(ex.getMessage.contains("63"))
    val li = li0
    // and a >31-bit (but ≤63) budget interleaves on longs without wrapping:
    // 6 dims x 6 bits = 36 bits — distinct z-values must reflect all dims
    val z6 = Layout.zvalue(li, Seq("l_partkey", "l_suppkey", "l_orderkey",
      "l_quantity", "l_extendedprice", "l_discount"))
    val distinct6 = li.select(z6.as("z")).distinct().count()
    val z1 = Layout.zvalue(li, Seq("l_partkey"))
    val distinct1 = li.select(z1.as("z")).distinct().count()
    assert(distinct6 > distinct1,
      s"36-bit morton must separate more than one dim alone ($distinct6 vs $distinct1)")
  }

  /** Sequential xy2d reference — the exact per-level walk hilbertIndex
    * unrolls, kept independent so the Column port can't self-confirm. */
  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("hilbertIndex is the sequential curve: bijective with UNIT grid steps") {
    import spark.implicits._
    val bits = 5
    val n = 1 << bits
    val grid = (0 until n).flatMap(x => (0 until n).map(y => (x.toLong, y.toLong)))
    val got = grid.toDF("x", "y")
      .select(col("x"), col("y"),
        Layout.hilbertIndex(col("x"), col("y"), bits).as("h"))
      .as[(Long, Long, Long)].collect()
    // matches the sequential reference cell by cell
    got.foreach { case (x, y, h) =>
      assert(h === hilbertRef(bits, x, y), s"($x,$y)")
    }
    // bijection onto 0..n*n-1
    assert(got.map(_._3).sorted.toSeq === (0L until n.toLong * n).toSeq)
    // the property Morton lacks: SUCCESSIVE curve cells are grid-adjacent
    val byH = got.sortBy(_._3)
    byH.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"curve jump between ($x1,$y1) and ($x2,$y2)")
    }
    // the write path's projection-chain walk computes the SAME curve
    val walked = Layout.hilbertWalk(
      grid.toDF("x", "y")
        .withColumn("__hx", col("x")).withColumn("__hy", col("y")),
      bits, "h")
      .select("x", "y", "h").as[(Long, Long, Long)].collect()
    walked.foreach { case (x, y, h) =>
      assert(h === hilbertRef(bits, x, y), s"walk ($x,$y)")
    }
    // the contrast: the Z-curve over the same grid jumps at seams —
    // sequential morton interleave, max successive Manhattan step > 1
    def morton(x: Long, y: Long): Long =
      (0 until bits).map(b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).reduce(_ | _)
    val byZ = grid.map { case (x, y) => (x, y, morton(x, y)) }.sortBy(_._3)
    val maxZStep = byZ.sliding(2).map { case Seq((x1, y1, _), (x2, y2, _)) =>
      math.abs(x1 - x2) + math.abs(y1 - y2)
    }.max
    assert(maxZStep > 1L, "morton should jump at power-of-two seams")
  }

  test("hilbertWrite prunes point lookups on BOTH dimensions like z-order") {
    val li = Tables.lineitem(spark, sf0001)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity")
    val nFiles = 16
    val hDir = tmp("hilbert")
    Layout.hilbertWrite(li, Seq("l_partkey", "l_suppkey"), hDir, nFiles)
    // identical content
    assert(spark.read.parquet(hDir).count() === li.count())
    assert(spark.read.parquet(hDir).exceptAll(li).isEmpty
      && li.exceptAll(spark.read.parquet(hDir)).isEmpty)
    def avgFrac(dir: String, c: String, vs: Seq[Double]): Double =
      vs.map(Layout.pruneFraction(spark, dir, c, _)).sum / vs.length
    val probes = Seq(5.0, 42.0, 99.0, 150.0)
    val hPart = avgFrac(hDir, "l_partkey", probes)
    val hSupp = avgFrac(hDir, "l_suppkey", probes)
    info(f"hilbert avg files read: part=$hPart%.2f supp=$hSupp%.2f")
    assert(hPart < 0.7, s"hilbert must prune dim 1, got $hPart")
    assert(hSupp < 0.7, s"hilbert must prune dim 2, got $hSupp")
  }
}
