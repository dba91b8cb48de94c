package graft

import graft.operators.Scd
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SCD2 operators: one-shot history build vs incremental change
  * application — the same equivalence contract the incremental dedup
  * (L2b) and ANN (L7c) specs pin. */
class ScdSpec extends SparkSpecBase {

  private def ordersLog: DataFrame =
    Tables.orders(spark, sf0001).select(
      col("o_custkey").as("custkey"), col("o_orderstatus").as("status"),
      col("o_orderdate"), col("o_orderkey"))

  private def rows(df: DataFrame) =
    df.select("custkey", "run", "status", "valid_from", "valid_to", "is_current")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        String.valueOf(r.get(3)), String.valueOf(r.get(4)), r.getBoolean(5)))
      .sortBy(t => (t._1, t._2))

  test("buildHistory collapses consecutive equal values with correct validity ranges") {
    val hist = Scd.buildHistory(ordersLog, "custkey", "status", "o_orderdate", "o_orderkey")
    // exactly one current version per key
    val perKey = hist.groupBy("custkey")
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("cur"),
        count(lit(1)).as("n"), max("run").as("maxRun"))
    assert(perKey.filter(col("cur") =!= 1L).count() === 0)
    // runs are dense 1..maxRun
    assert(perKey.filter(col("n") =!= col("maxRun")).count() === 0)
    // adjacent versions never share a status (the collapse actually collapsed)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("custkey").orderBy("run")
    val adj = hist.withColumn("nxt", lead(col("status"), 1).over(w))
      .filter(col("nxt").isNotNull && col("nxt") === col("status"))
    assert(adj.count() === 0)
    // valid_to chains to the next version's valid_from
    val chain = hist.withColumn("nvf", lead(col("valid_from"), 1).over(w))
      .filter((col("valid_to").isNotNull || col("nvf").isNotNull)
        && !(col("valid_to") <=> col("nvf")))
    assert(chain.count() === 0)
  }

  test("applyChanges(incremental) ≡ one-shot buildHistory on a date-split log") {
    val log = ordersLog.localCheckpoint(true)
    val t = log.agg(expr("percentile(unix_timestamp(o_orderdate), 0.5)")).head().getDouble(0)
    val split = to_timestamp(lit(t.toLong))
    val pre = log.filter(col("o_orderdate") <= split)
    val post = log.filter(col("o_orderdate") > split)
    assert(pre.count() > 0 && post.count() > 0)
    val dim1 = Scd.buildHistory(pre, "custkey", "status", "o_orderdate", "o_orderkey")
      .localCheckpoint(true)
    val incr = Scd.applyChanges(dim1, post, "custkey", "status", "o_orderdate", "o_orderkey")
      .localCheckpoint(true)
    val full = Scd.buildHistory(log, "custkey", "status", "o_orderdate", "o_orderkey")
    assert(rows(incr).sameElements(rows(full)),
      "incremental apply must equal the one-shot rebuild")
    // keys whose orders are all pre-split pass through byte-identical
    val postKeys = post.select("custkey").distinct()
    val untouchedIncr = incr.join(postKeys, Seq("custkey"), "left_anti")
    val untouchedDim1 = dim1.join(postKeys, Seq("custkey"), "left_anti")
    assert(rows(untouchedIncr).sameElements(rows(untouchedDim1)))
  }

  test("replaying an already-applied batch is an exact no-op") {
    val log = ordersLog.localCheckpoint(true)
    val t = log.agg(expr("percentile(unix_timestamp(o_orderdate), 0.5)")).head().getDouble(0)
    val split = to_timestamp(lit(t.toLong))
    val pre = log.filter(col("o_orderdate") <= split)
    val post = log.filter(col("o_orderdate") > split)
    val dim1 = Scd.buildHistory(pre, "custkey", "status", "o_orderdate", "o_orderkey")
    val once = Scd.applyChanges(dim1, post, "custkey", "status", "o_orderdate", "o_orderkey")
      .localCheckpoint(true)
    val twice = Scd.applyChanges(once, post, "custkey", "status", "o_orderdate", "o_orderkey")
    assert(rows(twice).sameElements(rows(once)))
  }
}
