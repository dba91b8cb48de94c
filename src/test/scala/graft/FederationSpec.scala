package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._

/** The reference's flagship shape end to end (S-rows composed): ONE
  * declarative plan federating three heterogeneous source systems — a
  * live JDBC database (embedded Derby), a schema-inferred CSV file, and
  * parquet — each scanned with its own pushdown, joined and aggregated
  * by Catalyst. The result must equal the same query run single-source
  * from the parquet tables, proving federation is a source concern, not
  * a semantics change.
  */
class FederationSpec extends SparkSpecBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftfed;create=true"

  test("one plan joins JDBC + CSV + parquet, with pushdown into every source") {
    // -- source 1: nation lives in a DATABASE
    val conn = DriverManager.getConnection(url)
    val st = conn.createStatement()
    st.execute("CREATE TABLE nation_t (n_nationkey INT, n_name VARCHAR(40), n_regionkey INT)")
    Tables.nation(spark, sf0001)
      .select("n_nationkey", "n_name", "n_regionkey")
      .collect()
      .foreach(r => st.execute(
        s"INSERT INTO nation_t VALUES (${r.get(0)}, '${r.getString(1)}', ${r.get(2)})"))
    conn.close()
    // -- source 2: region lives in a CSV landing zone (schema inferred)
    val csvDir = java.nio.file.Files.createTempDirectory("fed_csv").toString
    Tables.region(spark, sf0001).select("r_regionkey", "r_name")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(csvDir)
    // -- source 3: customer stays parquet (the lake)
    val nations = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "nation_t").load()
      .filter($"n_regionkey" === 1)
    val regions = graft.sources.Inference.csv(spark, csvDir)
      .select($"r_regionkey", $"r_name")
    val customers = Tables.customer(spark, sf0001)
      .filter($"c_acctbal" > 0)
      .select($"c_custkey", $"c_nationkey", $"c_acctbal")

    val fed = customers
      .join(broadcast(nations), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(regions), $"n_regionkey" === $"r_regionkey")
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"),
        sum(round($"c_acctbal" * 100).cast("long")).as("bal_cents"))
      .orderBy("r_name", "n_name")

    // pushdown reached each source: Derby got the WHERE, parquet got
    // PushedFilters, and the CSV scan reads only the two used columns
    val plan = fed.queryExecution.executedPlan.toString
    // the PushedFilters must be ON THE JDBC SCAN LINE — a bare
    // contains("PushedFilters") would be satisfied by the parquet scan
    // and let a JDBC-pushdown regression pass silently
    assert(plan.matches("(?si).*JDBCRelation[^\\n]*PushedFilters: \\[[^\\]]*regionkey.*"),
      s"expected the regionkey predicate pushed into the JDBC scan in:\n$plan")
    assert(plan.contains("Format: CSV"), s"expected a CSV scan in:\n$plan")
    assert(plan.matches("(?s).*Format: Parquet.*PushedFilters: \\[.*c_acctbal.*"),
      "expected the acctbal predicate pushed into the parquet scan")

    // same query, single-source truth
    val truth = Tables.customer(spark, sf0001).filter($"c_acctbal" > 0)
      .join(broadcast(Tables.nation(spark, sf0001).filter($"n_regionkey" === 1)),
        $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(spark, sf0001)), $"n_regionkey" === $"r_regionkey")
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_cust"),
        sum(round($"c_acctbal" * 100).cast("long")).as("bal_cents"))
      .orderBy("r_name", "n_name")

    val got = fed.as[(String, String, Long, Long)].collect().toSeq
    val want = truth.as[(String, String, Long, Long)].collect().toSeq
    assert(got === want, "federated answer diverges from single-source truth")
    assert(got.nonEmpty, "degenerate fixture: no customers in region 1")
  }
}
