package graft

import org.apache.spark.sql.Row

/** S24: the TableLog V2 catalog plugin — the full SQL warehouse surface
  * (CREATE / INSERT / INSERT OVERWRITE / SELECT / VERSION AS OF / SHOW /
  * DROP) over graft's own versioned table format, with pushdown reaching
  * the inner parquet scan and every INSERT an atomic manifest commit.
  */
class TableLogCatalogSpec extends SparkSpecBase {

  private lazy val root: String = {
    val r = java.nio.file.Files.createTempDirectory("graft_cat").toString
    spark.conf.set("spark.sql.catalog.graftsql",
      "graft.sources.v2.TableLogCatalog")
    spark.conf.set("spark.sql.catalog.graftsql.root", r)
    r
  }

  private def sql(q: String) = { root; spark.sql(q) }

  test("CREATE + INSERT + SELECT round trip, each INSERT a versioned commit") {
    sql("CREATE NAMESPACE IF NOT EXISTS graftsql.ns")
    sql("CREATE TABLE graftsql.ns.t (k BIGINT, v STRING)")
    sql("INSERT INTO graftsql.ns.t VALUES (1, 'a'), (2, 'b')")
    sql("INSERT INTO graftsql.ns.t VALUES (3, 'c')")
    assert(sql("SELECT k, v FROM graftsql.ns.t ORDER BY k").collect().toSeq
      === Seq(Row(1L, "a"), Row(2L, "b"), Row(3L, "c")))
    // create=v0, two appends → v1, v2
    assert(graft.sources.TableLog.versions(spark, s"$root/ns/t") === Seq(0L, 1L, 2L))
  }

  test("VERSION AS OF reads historical snapshots; bad versions are loud") {
    assert(sql("SELECT count(*) AS n FROM graftsql.ns.t VERSION AS OF 0")
      .head.getLong(0) === 0L) // the empty CREATE commit
    assert(sql("SELECT k FROM graftsql.ns.t VERSION AS OF 1 ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val e = intercept[Exception](
      sql("SELECT * FROM graftsql.ns.t VERSION AS OF 99").collect())
    assert(e.getMessage.toLowerCase.contains("table"))
  }

  test("INSERT OVERWRITE truncates into a new commit, history intact") {
    sql("INSERT OVERWRITE graftsql.ns.t VALUES (7, 'z')")
    assert(sql("SELECT k, v FROM graftsql.ns.t").collect().toSeq
      === Seq(Row(7L, "z")))
    // pre-overwrite snapshot still readable
    assert(sql("SELECT count(*) AS n FROM graftsql.ns.t VERSION AS OF 2")
      .head.getLong(0) === 3L)
  }

  test("pushed and residual filters compose without changing answers") {
    sql("CREATE TABLE graftsql.ns.f (k BIGINT, s STRING)")
    sql("""INSERT INTO graftsql.ns.f
          |SELECT id AS k, concat('row', CAST(id % 10 AS STRING)) AS s
          |FROM range(1000)""".stripMargin)
    // k >= 990 translates and is applied inside the snapshot plan;
    // the contains() shape is NOT translated and stays a residual
    val got = sql("""SELECT k FROM graftsql.ns.f
                    |WHERE k >= 990 AND contains(s, 'ow3') ORDER BY k""".stripMargin)
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(993L))
    // the physical scan reports the handled filter as pushed
    val plan = sql("SELECT k FROM graftsql.ns.f WHERE k >= 990")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual"),
      s"pushdown missing from plan:\n$plan")
  }

  test("column pruning: single-column SELECT sees the pruned schema") {
    val df = sql("SELECT s FROM graftsql.ns.f WHERE k < 3 ORDER BY s")
    assert(df.columns.toSeq === Seq("s"))
    assert(df.collect().map(_.getString(0)).toSeq === Seq("row0", "row1", "row2"))
  }

  test("CTAS lands schema + data through the same commit protocol") {
    sql("""CREATE TABLE graftsql.ns.c AS
          |SELECT k * 2 AS dk FROM graftsql.ns.f WHERE k < 4""".stripMargin)
    assert(sql("SELECT dk FROM graftsql.ns.c ORDER BY dk")
      .collect().map(_.getLong(0)).toSeq === Seq(0L, 2L, 4L, 6L))
  }

  test("SHOW TABLES lists log tables; DROP removes them") {
    val tables = sql("SHOW TABLES IN graftsql.ns")
      .collect().map(_.getString(1)).toSet
    assert(Set("t", "f", "c").subsetOf(tables))
    sql("DROP TABLE graftsql.ns.c")
    assert(!sql("SHOW TABLES IN graftsql.ns")
      .collect().map(_.getString(1)).toSet.contains("c"))
  }

  test("unsupported surfaces refuse loudly (never silent drift)") {
    val alter = intercept[Exception](
      sql("ALTER TABLE graftsql.ns.t ADD COLUMNS (x BIGINT)"))
    assert(alter.getMessage.contains("evolveAppend"))
    val part = intercept[Exception](
      sql("CREATE TABLE graftsql.ns.p (k BIGINT) PARTITIONED BY (k)"))
    assert(part.getMessage.contains("ZORDER"))
    val ren = intercept[Exception](
      sql("ALTER TABLE graftsql.ns.t RENAME TO graftsql.ns.t2"))
    assert(ren.getMessage.contains("CTAS"))
  }

  test("DELETE FROM commits a copy-on-write delete; untranslatable predicates refuse") {
    sql("CREATE TABLE graftsql.ns.d (k BIGINT, s STRING)")
    sql("INSERT INTO graftsql.ns.d SELECT id AS k, CAST(id % 3 AS STRING) AS s FROM range(30)")
    val vBefore = graft.sources.TableLog.versions(spark, s"$root/ns/d").max
    sql("DELETE FROM graftsql.ns.d WHERE k >= 20 OR s = '1'")
    val left = sql("SELECT k FROM graftsql.ns.d ORDER BY k")
      .collect().map(_.getLong(0)).toSeq
    assert(left === (0L until 20L).filter(_ % 3 != 1))
    // one new commit, prior snapshot still time-travelable
    assert(graft.sources.TableLog.versions(spark, s"$root/ns/d").max === vBefore + 1)
    assert(sql(s"SELECT count(*) AS n FROM graftsql.ns.d VERSION AS OF $vBefore")
      .head.getLong(0) === 30L)
    // contains() doesn't translate → the statement must fail, not misdelete
    intercept[Exception](sql("DELETE FROM graftsql.ns.d WHERE contains(s, '2')"))
    assert(sql("SELECT count(*) AS n FROM graftsql.ns.d").head.getLong(0)
      === left.size.toLong)
  }

  test("TIMESTAMP AS OF resolves to the last commit at-or-before the instant") {
    sql("CREATE TABLE graftsql.ns.tt (k BIGINT)")
    sql("INSERT INTO graftsql.ns.tt VALUES (1)")      // v1
    Thread.sleep(1100)                                 // separate mtimes
    sql("INSERT INTO graftsql.ns.tt VALUES (2)")      // v2
    val t1 = graft.sources.TableLog.manifestModTime(spark, s"$root/ns/tt", 1L)
    val t2 = graft.sources.TableLog.manifestModTime(spark, s"$root/ns/tt", 2L)
    assert(t2 > t1, "commits must have distinct mtimes for this fixture")
    val midIso = java.time.Instant.ofEpochMilli((t1 + t2) / 2)
      .toString.replace("T", " ").replace("Z", "")
    assert(sql(s"SELECT count(*) AS n FROM graftsql.ns.tt TIMESTAMP AS OF '$midIso'")
      .head.getLong(0) === 1L)
    // before the first commit → loud refusal, never an empty frame
    val early = java.time.Instant.ofEpochMilli(t1 - 3600000L)
      .toString.replace("T", " ").replace("Z", "")
    val e = intercept[Exception](
      sql(s"SELECT * FROM graftsql.ns.tt TIMESTAMP AS OF '$early'").collect())
    assert(e.getMessage.contains("no commit"))
  }

  test("native API and SQL surface see the same table") {
    // SQL-written table, native read (and vice versa write)
    val native = graft.sources.TableLog.read(spark, s"$root/ns/t")
    assert(native.collect().toSeq === Seq(Row(7L, "z")))
    graft.sources.TableLog.append(spark,
      native.sparkSession.sql("SELECT CAST(8 AS BIGINT) AS k, 'y' AS v"),
      s"$root/ns/t")
    assert(sql("SELECT k, v FROM graftsql.ns.t ORDER BY k").collect().toSeq
      === Seq(Row(7L, "z"), Row(8L, "y")))
  }
}
