package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL surface: register every dataset as a temp view so the full engine
  * is usable from plain `spark.sql` — the way the reference's users
  * actually query (declarative SQL over registered heterogeneous
  * sources), with graft's native functions (`vec_dot`, `topk_pairs`)
  * available in-dialect once [[GraftExtensions]] is on the session.
  */
object Views {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // last (session, dir) registered — skips 10 parquet footer reads per
  // sql() call in the common repeated-query case
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register all tables of an sf dir as temp views (idempotent). */
  def register(spark: SparkSession, dir: String): Unit =
    if (registered.get(spark) != dir) {
      tableNames.foreach { t =>
        val df = if (t == "events") Tables.events(spark, dir) else Tables.table(spark, dir, t)
        df.createOrReplaceTempView(t)
      }
      registered.put(spark, dir)
    }

  /** One-call SQL entry point over a data dir. */
  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }
}
