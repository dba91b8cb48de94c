package graft

import graft.operators.{SketchIndex, Sketches}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Pins the durable incremental sketch state: exact equality with the
  * one-shot sketches under a batch split (both sketches are exactly
  * mergeable — no tolerance), replay idempotence, and the estimator
  * guarantees read from the stored state.
  */
class SketchIndexSpec extends SparkSpecBase {

  private def tmp(): String =
    Files.createTempDirectory("sketchidx").toString + "/state"

  test("incremental CMS+KMV state equals the one-shot sketch bit for bit") {
    val dir = tmp()
    val li = Tables.lineitem(spark, sf0001).select("l_partkey")
    // interleaved-id split (the adversarial shape from DedupSpec): no
    // batch is a clean prefix of the key space
    val b1 = li.filter(col("l_partkey") % 2 === 0)
    val b2 = li.filter(col("l_partkey") % 2 =!= 0)
    assert(SketchIndex.update(spark, dir, b1, "l_partkey", 1L))
    assert(SketchIndex.update(spark, dir, b2, "l_partkey", 2L))

    val storedCms = spark.read.parquet(s"$dir/cms")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShotCms = SketchIndex.cmsOf(li, "l_partkey")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(storedCms == oneShotCms)

    val storedKmv = spark.read.parquet(s"$dir/kmv")
      .collect().map(_.getLong(0)).toSet
    val oneShotKmv = SketchIndex.kmvOf(li, "l_partkey")
      .collect().map(_.getLong(0)).toSet
    assert(storedKmv == oneShotKmv)
  }

  test("replayed batch ids are exact no-ops") {
    val dir = tmp()
    val li = Tables.lineitem(spark, sf0001).select("l_partkey")
    assert(SketchIndex.update(spark, dir, li.limit(100), "l_partkey", 7L))
    val before = spark.read.parquet(s"$dir/cms")
      .agg(sum("c")).head().getLong(0)
    assert(!SketchIndex.update(spark, dir, li.limit(100), "l_partkey", 7L))
    val after = spark.read.parquet(s"$dir/cms")
      .agg(sum("c")).head().getLong(0)
    assert(before == after)
  }

  test("stored-state estimates keep the one-shot guarantees") {
    val dir = tmp()
    val li = Tables.lineitem(spark, sf0001).select("l_partkey")
    li.count() // force
    // three uneven batches
    assert(SketchIndex.update(spark, dir, li.filter(col("l_partkey") % 3 === 0), "l_partkey", 1L))
    assert(SketchIndex.update(spark, dir, li.filter(col("l_partkey") % 3 === 1), "l_partkey", 2L))
    assert(SketchIndex.update(spark, dir, li.filter(col("l_partkey") % 3 === 2), "l_partkey", 3L))

    val exact = li.groupBy(col("l_partkey").cast("string").as("k"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val probes = li.select(col("l_partkey").cast("string").as("k")).distinct()
    val est = SketchIndex.cmsEstimate(spark, dir, probes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // CMS from merged state must still never underestimate
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"key $k: est ${est(k)} < exact $n") }

    val nd = li.select("l_partkey").distinct().count().toDouble
    val dEst = SketchIndex.distinctEstimate(spark, dir).head().getLong(0).toDouble
    assert(math.abs(dEst - nd) / nd < 0.3, s"distinct est $dEst vs $nd")
  }
}
