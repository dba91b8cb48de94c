package graft

import graft.sources.{AnsiDialect, Pred, SqlDialect}
import java.sql.DriverManager

/** Live JDBC round trip against an embedded Derby database (S4–S5): the
  * vendor-SQL pushdown subquery actually executes on the source, and the
  * `java.sql.Types` mapping is exercised against real JDBC metadata — the
  * end-to-end form of the reference's RDBMS source path (reference:
  * DistributedQueryEngine.diff, RDBMSPushdown/RDBMSInferrer hunks).
  */
class JdbcSpec extends SparkSpecBase {
  import Pred._

  private val url = "jdbc:derby:memory:graftspec;create=true"

  private lazy val seeded: Unit = {
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute(
      """CREATE TABLE emp (
        |  id INT NOT NULL, name VARCHAR(40), dept VARCHAR(20),
        |  salary DOUBLE, hired DATE)""".stripMargin)
    Seq(
      "(1, 'ada', 'eng', 120000.0, '2020-01-15')",
      "(2, 'bob', 'eng', 95000.0, '2021-03-01')",
      "(3, 'cy', 'sales', 70000.0, '2019-07-20')",
      "(4, 'dee', 'eng', 130000.0, '2022-11-05')"
    ).foreach(v => st.execute(s"INSERT INTO emp VALUES $v"))
    conn.close()
  }

  test("pushed-down vendor SQL executes on the source and bounds the read") {
    seeded
    val df = SqlDialect.jdbcScan(spark, url, "EMP",
      columns = Seq("ID", "NAME", "SALARY"),
      preds = Seq(Eq("DEPT", "eng"), Gt("SALARY", 100000)),
      dialect = AnsiDialect)
    // only the projected columns come back...
    assert(df.columns.toSeq === Seq("ID", "NAME", "SALARY"))
    // ...and only the filtered rows ever left the database
    val rows = df.orderBy("ID").collect().map(r => (r.getInt(0), r.getString(1)))
    assert(rows.toSeq === Seq((1, "ada"), (4, "dee")))
  }

  test("DSv2 JDBC pushes the AGGREGATE itself to the source (reference: RDBMSPushdown)") {
    seeded
    // the reference's pushdown rewrites relational SUBTREES — not just
    // filters — into vendor SQL; Spark's DSv2 JDBC does the same when
    // pushDownAggregate is on: the GROUP BY runs inside the database and
    // only |groups| rows cross the wire, the economics the reference's
    // RDBMSPushdown.scala exists for
    // plain format("jdbc") is the V1 source (filter/column pushdown
    // only); WHOLE-SUBTREE pushdown lives in the DSv2 JDBCTableCatalog
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq("spark.sql.catalog.derby",
      "spark.sql.catalog.derby.url",
      "spark.sql.catalog.derby.pushDownAggregate",
      "spark.sql.catalog.derby.pushDownLimit").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.catalog.derby",
        "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCTableCatalog")
      conf.set("spark.sql.catalog.derby.url", url)
      conf.set("spark.sql.catalog.derby.pushDownAggregate", "true")
      conf.set("spark.sql.catalog.derby.pushDownLimit", "true")
      val df = spark.table("derby.APP.EMP")
        .filter(col("SALARY") > 80000)
        .groupBy("DEPT")
        .agg(count(lit(1)).as("n"), max(col("SALARY")).as("top"))
      val rows = df.orderBy("DEPT").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      assert(rows.toSeq === Seq(("eng", 3L, 130000.0)))
      val p = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      assert(p.contains("PushedAggregates"),
        s"expected the aggregate pushed into the JDBC scan in:\n$p")
      assert(p.contains("PushedFilters") && p.contains("SALARY"),
        s"expected the filter pushed beneath the pushed aggregate in:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("schema inferred through JDBC metadata matches the sqlTypeToSpark mapping") {
    seeded
    import org.apache.spark.sql.types._
    val df = spark.read.jdbc(url, "EMP", new java.util.Properties())
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // what Spark's JDBC inference produced...
    assert(byName("ID") === IntegerType)
    assert(byName("NAME") === StringType)
    assert(byName("SALARY") === DoubleType)
    assert(byName("HIRED") === DateType)
    // ...agrees with graft's java.sql.Types lattice for the same columns
    val conn = DriverManager.getConnection(url)
    val rs = conn.getMetaData.getColumns(null, null, "EMP", null)
    while (rs.next()) {
      val name = rs.getString("COLUMN_NAME")
      val jdbcType = rs.getInt("DATA_TYPE")
      val precision = rs.getInt("COLUMN_SIZE")
      val scale = rs.getInt("DECIMAL_DIGITS")
      assert(SqlDialect.sqlTypeToSpark(jdbcType, precision, scale) === byName(name),
        s"type lattice disagrees with Spark inference for $name")
    }
    conn.close()
  }

  test("ANSI limit clause executes on Derby (FETCH FIRST, not LIMIT)") {
    seeded
    val sub = "(" + SqlDialect.scanSql("EMP", Seq("ID"), Seq(NotNull("ID")),
      AnsiDialect, limit = Some(2)) + ") lim_scan"
    val df = spark.read.jdbc(url, sub, new java.util.Properties())
    assert(df.count() === 2)
  }

  test("JDBC write round-trips a DataFrame into Derby and back (S4 sink side)") {
    seeded
    import spark.implicits._
    val out = Seq((10L, "widget", 9.99), (11L, "gizmo", 24.50))
      .toDF("item_id", "item_name", "price")
    out.write.mode("overwrite")
      .jdbc(url, "catalog_out", new java.util.Properties())
    // appends fold into the same table (the incremental-load shape)
    Seq((12L, "doohickey", 1.25)).toDF("item_id", "item_name", "price")
      .write.mode("append").jdbc(url, "catalog_out", new java.util.Properties())
    val back = spark.read.jdbc(url, "catalog_out", new java.util.Properties())
      .orderBy("item_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(back.toSeq === Seq((10L, "widget", 9.99), (11L, "gizmo", 24.50),
      (12L, "doohickey", 1.25)))
    // and the written table is queryable with pushdown like any source.
    // Stored-case matters under quoting: Spark's writer passed the TABLE
    // name unquoted (Derby folded it upper) but CREATEd the columns
    // quoted (stored lowercase) — the scan must use each as stored.
    val filtered = SqlDialect.jdbcScan(spark, url, "CATALOG_OUT",
      columns = Seq("item_id"), preds = Seq(Gt("price", 5)),
      dialect = AnsiDialect)
    assert(filtered.count() === 2)
  }

  test("partitioned JDBC read splits the source scan") {
    seeded
    val df = SqlDialect.jdbcScan(spark, url, "EMP",
      columns = Seq("ID", "SALARY"), preds = Seq(NotNull("ID")),
      dialect = AnsiDialect,
      partitionColumn = Some("ID"), lowerBound = 0L, upperBound = 5L,
      numPartitions = 2)
    assert(df.rdd.getNumPartitions === 2)
    assert(df.count() === 4)
  }
}
