package graft

import org.apache.spark.sql.functions._

/** Cost-based optimization over ANALYZE'd tables (SURVEY.md §2 R74):
  * collected statistics feed plan decisions — the catalog-table side of
  * what AQE does at runtime. At 100 TB, ANALYZE + CBO is how Catalyst
  * sizes filtered dimensions it cannot see through at plan time.
  */
class CboSpec extends SparkSpecBase {

  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val dir = new java.io.File(s"spark-warehouse/$name")
    if (dir.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(dir)
    }
  }

  test("ANALYZE TABLE statistics land in the catalog and drive size estimates") {
    resetTable("cbo_orders")
    Tables.orders(spark, sf0001).write.saveAsTable("cbo_orders")
    spark.sql("ANALYZE TABLE cbo_orders COMPUTE STATISTICS FOR COLUMNS o_custkey, o_totalprice")
    val described = spark.sql("DESCRIBE EXTENDED cbo_orders")
      .collect().map(_.mkString("|")).mkString("\n")
    assert(described.contains("Statistics"), s"expected table statistics in:\n$described")
    // column-level stats visible
    val colStats = spark.sql("DESCRIBE EXTENDED cbo_orders o_custkey")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(colStats.get("distinct_count").exists(_ != "NULL"),
      s"expected NDV for o_custkey in: $colStats")

    val saved = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
      .map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // with stats, the optimized plan carries row-count estimates the
      // optimizer can act on (join reorder, broadcast decisions)
      val q = spark.table("cbo_orders").filter(col("o_totalprice") > 400000)
      val stats = q.queryExecution.optimizedPlan.stats
      assert(stats.rowCount.isDefined,
        "CBO must derive a row-count estimate from ANALYZE stats")
      val est = stats.rowCount.get.toLong
      val actual = q.count()
      // the estimate is an estimate — but it must be in the right order
      // of magnitude, not the un-stats default of "whole table"
      val total = spark.table("cbo_orders").count()
      assert(est < total, s"filter selectivity must shrink the estimate: $est vs table $total")
      assert(actual < total)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
