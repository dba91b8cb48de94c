package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S20 — the from-scratch DSv2 connector: correctness of the generated
  * rows, REAL pushdown (narrowed scan range visible in the plan, not a
  * post-filter), column pruning, residual-filter semantics, and the
  * partitions option.
  */
class SeqSourceSpec extends SparkSpecBase {
  import spark.implicits._

  private def seq(rows: Long, parts: Int = 4): DataFrame =
    spark.read.format("graft.sources.v2.SeqDataSource")
      .option("rows", rows.toString).option("partitions", parts.toString).load()

  private def scanDesc(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("generates the deterministic sequence") {
    val rows = seq(10).as[(Long, Long, String)].collect().sortBy(_._1)
    assert(rows.length === 10)
    assert(rows(3) === ((3L, 3L * 37 % 101, "t3")))
    assert(rows(7) === ((7L, 7L * 37 % 101, "t2")))
  }

  test("id range predicates are pushed: the scan range narrows in the plan") {
    val df = seq(100000).filter($"id" >= 1000 && $"id" < 4000)
    assert(scanDesc(df).contains("range=[1000,4000)"),
      s"expected a narrowed scan range, got:\n${scanDesc(df)}")
    assert(df.count() === 3000L)
    // contradictory range → empty scan, no rows produced
    assert(seq(100).filter($"id" > 50L && $"id" < 10L).count() === 0L)
  }

  test("column pruning reaches the reader") {
    val df = seq(1000).select("id")
    assert(scanDesc(df).contains("cols=[id]"),
      s"expected a pruned reader schema, got:\n${scanDesc(df)}")
  }

  test("non-range filters stay residual and still apply") {
    val df = seq(1000).filter($"tag" === "t0" && $"id" < 100)
    assert(scanDesc(df).contains("range=[0,100)"))
    val ids = df.select("id").as[Long].collect().sorted.toSeq
    assert(ids === (0L until 100L by 5L).toSeq,
      "residual tag filter must still be evaluated post-scan")
  }

  test("partitions option controls scan parallelism") {
    assert(seq(1000, parts = 7).rdd.getNumPartitions === 7)
  }

  test("point lookup pushes EqualTo to a single-row range") {
    val df = seq(100000).filter($"id" === 42L)
    assert(scanDesc(df).contains("range=[42,43)"),
      s"expected a single-row scan range, got:\n${scanDesc(df)}")
    assert(df.as[(Long, Long, String)].head() === ((42L, 42L * 37 % 101, "t2")))
  }
}
