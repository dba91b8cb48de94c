package graft

import graft.operators.IncrementalAgg
import org.apache.spark.sql.functions._

/** Incremental aggregation maintenance (SURVEY.md §2 L39): merged state
  * must equal the from-scratch aggregate exactly, replays must be
  * committed no-ops, and the atomic publish must survive a crash window
  * between the two renames.
  */
class IncrementalAggSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("incraggspec").toString + "/state"

  private def lineitems = Tables.lineitem(spark, sf0001)
    .withColumn("qty", round(col("l_quantity")).cast("long"))

  private def fullAgg = lineitems.groupBy(col("l_returnflag").as("k"))
    .agg(count(lit(1)).as("cnt"), sum("qty").as("sm"),
      min("qty").as("mn"), max("qty").as("mx"))
    .select(col("k"), col("cnt"), col("sm"), col("mn"), col("mx"),
      (col("sm").cast("double") / col("cnt").cast("double")).as("avg"))
    .as[(String, Long, Long, Long, Long, Double)].collect().toSet

  test("five interleaved batches merge to exactly the full aggregate") {
    val dir = tmp()
    (0 until 5).foreach { b =>
      val applied = IncrementalAgg.update(spark, dir,
        lineitems.filter(pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(5)) === b),
        batchId = b, key = "l_returnflag", value = "qty")
      assert(applied)
    }
    val snap = IncrementalAgg.snapshot(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    assert(snap === fullAgg)
  }

  test("a replayed batch is a committed no-op") {
    val dir = tmp()
    val b0 = lineitems.filter(col("l_linenumber") === 1)
    val b1 = lineitems.filter(col("l_linenumber") =!= 1)
    assert(IncrementalAgg.update(spark, dir, b0, 10, "l_returnflag", "qty"))
    assert(IncrementalAgg.update(spark, dir, b1, 11, "l_returnflag", "qty"))
    val before = IncrementalAgg.snapshot(spark, dir).collect().toSeq
    assert(!IncrementalAgg.update(spark, dir, b1, 11, "l_returnflag", "qty"),
      "replay must report not-applied")
    assert(IncrementalAgg.snapshot(spark, dir).collect().toSeq === before)
    assert(before.toSet === IncrementalAgg.snapshot(spark, dir).collect().toSet)
  }

  test("recovery restores a state stranded mid-publish, then the merge proceeds") {
    val dir = tmp()
    val b0 = lineitems.filter(col("l_linenumber") === 1)
    assert(IncrementalAgg.update(spark, dir, b0, 0, "l_returnflag", "qty"))
    // simulate a crash after "move main aside", before "promote staging":
    // the backup is the only surviving copy
    val hfs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(hfs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + ".__backup")))
    val b1 = lineitems.filter(col("l_linenumber") =!= 1)
    assert(IncrementalAgg.update(spark, dir, b1, 1, "l_returnflag", "qty"))
    val snap = IncrementalAgg.snapshot(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSet
    assert(snap === fullAgg, "recovered state must contain batch 0 and batch 1")
  }
}
