package graft

import org.apache.spark.sql.functions._

class ViewsSpec extends SparkSpecBase {
  import spark.implicits._

  test("SQL over registered views matches the DataFrame catalog result") {
    val viaSql = Views.sql(spark, sf0001,
      """SELECT l_returnflag, count(*) AS n
        |FROM lineitem WHERE l_quantity > 25
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
      .as[(String, Long)].collect().toSeq
    val viaDf = Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") > 25)
      .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .as[(String, Long)].collect().toSeq
    assert(viaSql === viaDf && viaSql.nonEmpty)
  }

  test("graft native functions are usable from SQL over the views") {
    val out = Views.sql(spark, sf0001,
      """SELECT vec_id, vec_dot(CAST(embedding AS ARRAY<DOUBLE>),
        |                       CAST(embedding AS ARRAY<DOUBLE>)) AS sq_norm
        |FROM embeddings ORDER BY vec_id LIMIT 5""".stripMargin)
      .as[(Long, Double)].collect()
    assert(out.length === 5 && out.forall(_._2 > 0.0))
  }

  test("all ten tables register and are queryable") {
    Views.register(spark, sf0001)
    Views.tableNames.foreach { t =>
      assert(spark.sql(s"SELECT count(*) FROM $t").as[Long].head() > 0, s"$t empty")
    }
  }
}
