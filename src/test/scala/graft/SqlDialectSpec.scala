package graft

import graft.sources.{AnsiDialect, HiveDialect, Pred, SqlDialect}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Vendor SQL generation + JDBC type inference (SURVEY.md §2 S4–S5) —
  * no live DB in the container, so the generated SQL and the type lattice
  * are checked directly (reference behavior: RDBMSPushdown.scala /
  * HiveSqlPrettyPrinter.scala / RDBMSInferrer.scala hunks).
  */
class SqlDialectSpec extends AnyFunSuite {
  import Pred._

  test("ANSI dialect quotes with double quotes, Hive with backticks") {
    assert(AnsiDialect.quote("col") === "\"col\"")
    assert(HiveDialect.quote("col") === "`col`")
    assert(AnsiDialect.quote("we\"ird") === "\"we\"\"ird\"")
    assert(HiveDialect.quote("we`ird") === "`we``ird`")
  }

  test("scan SQL prints projection, conjunctive filters, limit") {
    val sql = SqlDialect.scanSql("orders", Seq("o_orderkey", "o_totalprice"),
      Seq(Gt("o_totalprice", 1000), Eq("o_orderstatus", "F")),
      AnsiDialect, limit = Some(10))
    assert(sql ===
      """SELECT "o_orderkey", "o_totalprice" FROM "orders" WHERE "o_totalprice" > 1000 AND "o_orderstatus" = 'F' FETCH FIRST 10 ROWS ONLY""")
    val hiveSql = SqlDialect.scanSql("orders", Seq("a"), Nil, HiveDialect, limit = Some(5))
    assert(hiveSql === "SELECT `a` FROM `orders` LIMIT 5")
  }

  test("Hive scan SQL uses backtick quoting") {
    val sql = SqlDialect.scanSql("db_tbl", Seq("a"), Seq(IsNull("b")), HiveDialect)
    assert(sql === "SELECT `a` FROM `db_tbl` WHERE `b` IS NULL")
  }

  test("string literals are escaped") {
    val sql = SqlDialect.printPred(Eq("name", "O'Brien"), AnsiDialect)
    assert(sql === "\"name\" = 'O''Brien'")
  }

  test("Hive literals backslash-escape (its lexer interprets escapes)") {
    assert(SqlDialect.printPred(Eq("path", "C:\\temp"), HiveDialect) ===
      "`path` = 'C:\\\\temp'")
    assert(SqlDialect.printPred(Eq("name", "O'Brien"), HiveDialect) ===
      "`name` = 'O\\'Brien'")
  }

  test("decimal scale/precision are clamped to Spark's invariant") {
    assert(SqlDialect.sqlTypeToSpark(java.sql.Types.NUMERIC, 5, 10) === DecimalType(10, 10))
    assert(SqlDialect.sqlTypeToSpark(java.sql.Types.NUMERIC, 5, -2) === DecimalType(5, 0))
  }

  test("compound predicates parenthesize") {
    val p = Or(And(Gt("a", 1), Lt("a", 10)), Not(In("b", Seq("x", "y"))))
    assert(SqlDialect.printPred(p, AnsiDialect) ===
      """(("a" > 1 AND "a" < 10) OR (NOT "b" IN ('x', 'y')))""")
  }

  test("java.sql.Types map to Catalyst types") {
    import java.sql.Types._
    assert(SqlDialect.sqlTypeToSpark(INTEGER) === IntegerType)
    assert(SqlDialect.sqlTypeToSpark(BIGINT) === LongType)
    assert(SqlDialect.sqlTypeToSpark(VARCHAR) === StringType)
    assert(SqlDialect.sqlTypeToSpark(DOUBLE) === DoubleType)
    assert(SqlDialect.sqlTypeToSpark(REAL) === FloatType)
    assert(SqlDialect.sqlTypeToSpark(BOOLEAN) === BooleanType)
    assert(SqlDialect.sqlTypeToSpark(TIMESTAMP) === TimestampType)
    assert(SqlDialect.sqlTypeToSpark(DATE) === DateType)
    assert(SqlDialect.sqlTypeToSpark(DECIMAL, 12, 2) === DecimalType(12, 2))
    assert(SqlDialect.sqlTypeToSpark(BLOB) === BinaryType)
  }
}
