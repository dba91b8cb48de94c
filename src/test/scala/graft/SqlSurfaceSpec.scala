package graft

import org.apache.spark.sql.functions._

/** S23 — the warehouse SQL surface the reference exposes to users
  * (reference: README.md query surface; DistributedQueryEngine.diff
  * registers vendor tables into a catalog): DDL round trip against the
  * session catalog, procedural SQL scripting (Spark 4), and
  * parameterized statements — all through plain `spark.sql`.
  */
class SqlSurfaceSpec extends SparkSpecBase {
  import spark.implicits._

  private def tmp(p: String) = java.nio.file.Files.createTempDirectory(p).toString

  test("DDL round trip: database, external table, insert, alter, CTAS, drop") {
    val dbLoc = tmp("graftdb")
    val tLoc = tmp("graftt")
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graftdb LOCATION '$dbLoc'")
    spark.sql(
      s"""CREATE TABLE graftdb.regions (rk INT, rname STRING)
         |USING parquet LOCATION '$tLoc'""".stripMargin)
    // insert from a REAL table through the registered-views surface
    Views.register(spark, sf0001)
    spark.sql(
      "INSERT INTO graftdb.regions SELECT r_regionkey, r_name FROM region")
    assert(spark.sql("SELECT count(*) AS n FROM graftdb.regions")
      .as[Long].head() === 5L)
    // overwrite is idempotent, not additive
    spark.sql(
      "INSERT OVERWRITE graftdb.regions SELECT r_regionkey, r_name FROM region")
    assert(spark.table("graftdb.regions").count() === 5L)
    // additive column evolution through DDL
    spark.sql("ALTER TABLE graftdb.regions ADD COLUMNS (added BIGINT)")
    assert(spark.table("graftdb.regions").columns.toSeq
      === Seq("rk", "rname", "added"))
    assert(spark.table("graftdb.regions").where(col("added").isNull).count() === 5L)
    // catalog introspection (the DESCRIBE path the reference's Hive
    // inferrer consumes — see sources/Databases.scala)
    assert(spark.sql("SHOW TABLES IN graftdb").where(col("tableName") === "regions")
      .count() === 1L)
    assert(spark.sql("DESCRIBE graftdb.regions")
      .where(col("col_name") === "rname").count() === 1L)
    // CTAS derived table
    spark.sql(
      s"""CREATE TABLE graftdb.top_regions USING parquet
         |LOCATION '${tmp("graftctas")}'
         |AS SELECT rk, upper(rname) AS uname FROM graftdb.regions
         |WHERE rk >= 2""".stripMargin)
    assert(spark.table("graftdb.top_regions").count() === 3L)
    spark.sql("DROP TABLE graftdb.top_regions")
    spark.sql("DROP TABLE graftdb.regions")
    spark.sql("DROP DATABASE graftdb")
    assert(spark.sql("SHOW DATABASES").where(col("namespace") === "graftdb")
      .count() === 0L)
  }

  test("SQL scripting: DECLARE/WHILE/IF control flow over real tables") {
    spark.conf.set("spark.sql.scripting.enabled", "true")
    Views.register(spark, sf0001)
    // a loop that consults a real table each iteration: count regions
    // one key at a time and accumulate
    val script =
      """BEGIN
        |  DECLARE total BIGINT DEFAULT 0;
        |  DECLARE k INT DEFAULT 0;
        |  WHILE k < 5 DO
        |    SET total = total +
        |      (SELECT count(*) FROM region WHERE r_regionkey = k);
        |    SET k = k + 1;
        |  END WHILE;
        |  IF total = 5 THEN
        |    SELECT 'all-counted' AS verdict, total;
        |  ELSE
        |    SELECT 'missing-rows' AS verdict, total;
        |  END IF;
        |END""".stripMargin
    val row = spark.sql(script).collect().head
    assert(row.getString(0) === "all-counted")
    assert(row.getLong(1) === 5L)
  }

  test("parameterized SQL: named markers bind without string splicing") {
    Views.register(spark, sf0001)
    val df = spark.sql(
      "SELECT count(*) AS n FROM lineitem WHERE l_quantity <= :q AND l_suppkey = :s",
      Map("q" -> 10, "s" -> 1))
    val direct = Tables.lineitem(spark, sf0001)
      .where(col("l_quantity") <= 10 && col("l_suppkey") === 1).count()
    assert(df.as[Long].head() === direct)
  }
}
