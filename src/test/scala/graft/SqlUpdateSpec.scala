package graft

import org.apache.spark.sql.functions._

/** SQL UPDATE over the versioned table log (ResolveGraftUpdate + the
  * TableLog.update copy-on-write commit): semantics, history, and the
  * loud-refusal contract.
  */
class SqlUpdateSpec extends SparkSpecBase {

  private var n = 0
  private def freshTable(): (String, String) = {
    n += 1
    val cat = s"upd_spec_$n"
    val root = java.nio.file.Files.createTempDirectory("updspec").toString
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.v2.TableLogCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.ns")
    spark.sql(s"CREATE TABLE $cat.ns.t (k BIGINT, grp STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $cat.ns.t VALUES " +
      "(1, 'a', 10), (2, 'b', 20), (3, 'a', 30), (4, 'b', 40)")
    (cat, root)
  }

  test("UPDATE with WHERE rewrites only matching rows, as one commit") {
    val (cat, root) = freshTable()
    spark.sql(s"UPDATE $cat.ns.t SET v = v + 100 WHERE grp = 'a'")
    val got = spark.sql(s"SELECT k, v FROM $cat.ns.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 110L), (2L, 20L), (3L, 130L), (4L, 40L)))
    // one UPDATE = one commit; history still shows the pre-update rows
    val dir = s"$root/ns/t"
    val vs = graft.sources.TableLog.versions(spark, dir)
    assert(graft.sources.TableLog.readManifest(spark, dir, vs.max).op === "update")
    val before = graft.sources.TableLog
      .readVersion(spark, dir, vs.max - 1)
      .orderBy("k").collect().map(_.getLong(2)).toSeq
    assert(before === Seq(10L, 20L, 30L, 40L))
  }

  test("UPDATE without WHERE touches every row; multi-column SET works") {
    val (cat, _) = freshTable()
    spark.sql(s"UPDATE $cat.ns.t SET v = 0, grp = 'z'")
    val got = spark.sql(s"SELECT DISTINCT grp, v FROM $cat.ns.t").collect()
    assert(got.length === 1 && got.head.getString(0) === "z" &&
      got.head.getLong(1) === 0L)
  }

  test("SET value is cast to the manifest column type (schema contract)") {
    val (cat, _) = freshTable()
    // integer literal 5 against BIGINT column — aligned, not rejected
    spark.sql(s"UPDATE $cat.ns.t SET v = 5 WHERE k = 1")
    assert(spark.sql(s"SELECT v FROM $cat.ns.t WHERE k = 1")
      .collect().head.getLong(0) === 5L)
  }

  test("subquery in WHERE or SET refuses loudly") {
    val (cat, _) = freshTable()
    val e1 = intercept[Exception] {
      spark.sql(s"UPDATE $cat.ns.t SET v = 0 " +
        s"WHERE k IN (SELECT k FROM $cat.ns.t WHERE v > 20)")
    }
    assert(e1.getMessage.contains("subquery"))
    val e2 = intercept[Exception] {
      spark.sql(s"UPDATE $cat.ns.t SET v = (SELECT max(v) FROM $cat.ns.t)")
    }
    assert(e2.getMessage.contains("subquery"))
  }

  test("non-deterministic SET value refuses loudly") {
    val (cat, _) = freshTable()
    val e = intercept[Exception] {
      spark.sql(s"UPDATE $cat.ns.t SET v = CAST(rand() * 100 AS BIGINT)")
    }
    assert(e.getMessage.contains("non-deterministic"))
  }

  test("UPDATE on an unknown column fails in analysis, not with wrong data") {
    val (cat, _) = freshTable()
    intercept[Exception] {
      spark.sql(s"UPDATE $cat.ns.t SET nope = 1")
    }
    // table unchanged
    assert(spark.sql(s"SELECT sum(v) FROM $cat.ns.t")
      .collect().head.getLong(0) === 100L)
  }

  test("DELETE keeps its SupportsDelete fast path beside the UPDATE rule") {
    val (cat, _) = freshTable()
    spark.sql(s"DELETE FROM $cat.ns.t WHERE grp = 'b'")
    assert(spark.sql(s"SELECT count(*) FROM $cat.ns.t")
      .collect().head.getLong(0) === 2L)
  }
}
