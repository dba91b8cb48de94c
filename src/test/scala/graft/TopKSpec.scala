package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpecBase {
  import spark.implicits._

  test("topk_pairs matches the window row_number formulation, ties included") {
    // deterministic data with duplicate scores to exercise tie-breaks
    val df = (1 to 2000).map(i => (i % 7L, (i % 13).toDouble, i.toLong))
      .toDF("g", "score", "id")
    val viaAgg = df.groupBy("g")
      .agg(call_function("topk_pairs", col("score"), col("id"), lit(5)).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("g"), col("t.score").as("score"), col("t.id").as("id"),
        (col("pos") + 1).as("rk"))
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val viaWindow = df.withColumn("rk", row_number().over(w)).filter(col("rk") <= 5)
      .select("g", "score", "id", "rk")
    assert(viaAgg.count() === viaWindow.count())
    assert(viaAgg.except(viaWindow).isEmpty && viaWindow.except(viaAgg).isEmpty)
  }

  test("topk_pairs works in SQL and survives partial/final merge across partitions") {
    val df = (1 to 10000).map(i => (1L, i.toDouble, i.toLong)).toDF("g", "score", "id")
      .repartition(16) // force many partial buffers to merge
    df.createOrReplaceTempView("topk_spec")
    val top = spark.sql(
      "SELECT topk_pairs(score, id, 3) AS t FROM topk_spec GROUP BY g")
      .selectExpr("inline(t)")
      .as[(Double, Long)].collect()
    assert(top.toSeq === Seq((10000.0, 10000L), (9999.0, 9999L), (9998.0, 9998L)))
  }
}
