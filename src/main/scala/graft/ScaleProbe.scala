package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: scale-sanity probe. Replicates the fact tables N× (with
  * shifted keys so join fan-out stays realistic) and times the heaviest
  * catalog shapes, to check that runtimes grow ~linearly — the local
  * stand-in for "does this plan survive 100×" (SURVEY.md §6).
  * Usage: runMain graft.ScaleProbe [replication]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val rep = if (args.nonEmpty) args(0).toInt else 8
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.maxFields", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df: DataFrame, keyCols: Seq[String], shift: Long): DataFrame = {
      val copies = (0 until rep).map { i =>
        keyCols.foldLeft(df)((acc, k) => acc.withColumn(k, col(k) + lit(i * shift)))
      }
      copies.reduce(_ union _)
    }

    val li = replicate(Tables.lineitem(spark, d), Seq("l_orderkey"), 10000000L)
      .localCheckpoint(true)
    val or = replicate(Tables.orders(spark, d), Seq("o_orderkey"), 10000000L)
      .localCheckpoint(true)
    println(s"SCALE rep=$rep lineitem=${li.count()} orders=${or.count()}")

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"SCALE $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("q1_agg_shape") {
      li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast("long")), count(lit(1))).count()
    }
    time("factfact_join_agg") {
      li.join(or, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)), sum(round(col("l_extendedprice") * 100).cast("long")))
        .count()
    }
    time("window_topk") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
      or.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3).count()
    }
    time("topk_agg_custom") {
      or.groupBy("o_custkey")
        .agg(call_function("topk_pairs", col("o_totalprice"), col("o_orderkey"), lit(3)))
        .count()
    }
    spark.stop()
  }
}
