package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

/** Dynamic partition pruning (DPP) over a hive-partitioned fact: at
  * 100 TB the fact lake is partitioned by a time/dim key, and a join
  * against a FILTERED dimension must only read the partitions the dim
  * rows can reach — Spark injects the dim-side values as a runtime
  * subquery filter on the fact's partition column. This spec pins (a)
  * the `dynamicpruning` expression in the plan and (b) the executed
  * scan metric: partitions actually read < partitions on disk. Static
  * pruning (literal predicate on the partition column) is pinned too —
  * both must hold for the partitioned layout to pay off at scale.
  *
  * AQE is disabled for the metric reads (query stages hide executed
  * metrics from plan collects — same recipe as PlanGuardSpec's q38
  * check); the dim lives in PARQUET, not a local relation — Catalyst
  * constant-folds a filtered LocalRelation, and without a surviving
  * selective Filter node DPP never fires.
  */
class PartitionPruningSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val base = java.nio.file.Files.createTempDirectory("dpp").toString
  private lazy val factDir: String = {
    val dir = base + "/orders_by_year"
    Tables.orders(spark, sf0001)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(dir)
    dir
  }
  private lazy val dimDir: String = {
    val dir = base + "/year_dim"
    val years = spark.read.parquet(factDir).select("o_year").distinct()
      .as[Int].collect().sorted
    years.map(y => (y, s"label_$y")).toSeq.toDF("d_year", "d_label")
      .write.mode("overwrite").parquet(dir)
    dir
  }

  private def nPartitionsOnDisk: Int =
    new java.io.File(factDir).listFiles().count(_.getName.startsWith("o_year="))

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def partitionsRead(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute so SQL metrics populate
    val reads = df.queryExecution.executedPlan.collectWithSubqueries {
      case f: FileSourceScanExec if f.metadata.get("Location").exists(_.contains("orders_by_year")) =>
        f.metrics("numPartitions").value
    }
    assert(reads.nonEmpty, s"no fact scan found in:\n${df.queryExecution.executedPlan}")
    reads.head
  }

  test("static pruning: a literal partition predicate reads only matching partition dirs") {
    withConf("spark.sql.adaptive.enabled" -> "false") {
      val fact = spark.read.parquet(factDir)
      val years = fact.select("o_year").distinct().as[Int].collect().sorted
      assert(years.length >= 3, s"need several year partitions, got ${years.toSeq}")
      val read = partitionsRead(fact.filter(col("o_year") === years.head))
      assert(read === 1L, s"expected exactly 1 partition read, got $read of $nPartitionsOnDisk")
    }
  }

  test("dynamic pruning: a filtered-dim join reads only the partitions the dim reaches") {
    withConf(
      "spark.sql.adaptive.enabled" -> "false",
      // tiny test data defeats the broadcast-reuse heuristic; allow DPP
      // to run its own subquery like it would against a real dim table
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false") {
      val fact = spark.read.parquet(factDir)
      val years = fact.select("o_year").distinct().as[Int].collect().sorted
      val cutoff = years(1)
      val dim = spark.read.parquet(dimDir).filter(col("d_year") <= cutoff)
      val q = fact.join(dim, col("o_year") === col("d_year"))
        .groupBy("d_label").agg(count(lit(1)).as("n"))
      val planStr = q.queryExecution.executedPlan.toString
      assert(planStr.toLowerCase.contains("dynamicpruning"),
        s"expected a dynamicpruning filter on the fact scan:\n${planStr.take(3000)}")
      val read = partitionsRead(q)
      assert(read === 2L,
        s"DPP must read exactly the 2 dim-reachable partitions, got $read of $nPartitionsOnDisk")
      assert(q.collect().map(_.getLong(1)).sum ===
        fact.filter(col("o_year") <= cutoff).count())
    }
  }
}
