package graft.sources.pgwire

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, Driver, DriverPropertyInfo, PreparedStatement, ResultSet, ResultSetMetaData, SQLException, SQLFeatureNotSupportedException, Statement, Types}
import java.util.Properties
import java.util.logging.Logger

/** A minimal JDBC driver over [[PgWireClient]] — just enough of the
  * java.sql surface for Spark's JDBC source (schema probe, partitioned
  * reads with pushdown, transactional batched writes) to run against a
  * LIVE PostgreSQL server with no pgjdbc on the classpath. URL shape:
  * `jdbc:postgresql://host:port/db` (the stock shape, so Spark's own
  * PostgresDialect engages for type mapping).
  *
  * Honest bounds, stated loudly:
  *  - trust auth only (no SCRAM) — the sandbox cluster's mode;
  *  - simple-query protocol: PreparedStatement renders parameters as
  *    SQL literals client-side (strings '' -escaped under
  *    standard_conforming_strings, bytea as '\x..', timestamps/dates as
  *    typed literals) instead of Parse/Bind — semantically equivalent
  *    for Spark's read/write paths, NOT a general injection-safe pool;
  *  - executeBatch ships the rendered statements as ONE multi-statement
  *    simple query (single round trip, one implicit transaction — the
  *    batch-atomicity Spark's writer expects inside its explicit txn).
  *
  * Built on the protocol surface only — interface shims are reflective
  * proxies so the (huge) java.sql interfaces stay maintainable: every
  * method Spark exercises is implemented, anything else fails loudly
  * with the method name rather than silently misbehaving.
  */
final class PgWireDriver extends Driver {

  override def acceptsURL(url: String): Boolean =
    url != null && url.startsWith("jdbc:postgresql://")

  override def connect(url: String, info: Properties): Connection = {
    if (!acceptsURL(url)) return null
    val m = "jdbc:postgresql://([^:/]+)(?::(\\d+))?/([^?]+)".r.findFirstMatchIn(url)
      .getOrElse(throw new SQLException(s"pgwire: bad url $url"))
    val user = Option(info.getProperty("user")).getOrElse("graft")
    val client = new PgWireClient(m.group(1),
      Option(m.group(2)).map(_.toInt).getOrElse(5432), m.group(3), user)
    PgWireDriver.connection(client, url, user)
  }

  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 1
  override def getPropertyInfo(url: String, info: Properties): Array[DriverPropertyInfo] = Array.empty
  override def jdbcCompliant(): Boolean = false
  override def getParentLogger: Logger = throw new SQLFeatureNotSupportedException()
}

object PgWireDriver {

  /** OID → (java.sql.Types, pg type name). Only types the test tables
    * and Spark's writer produce; unknown OIDs map to VARCHAR/text so a
    * SELECT of an exotic type degrades to its text form, not a crash. */
  private val typeMap: Map[Int, (Int, String)] = Map(
    16 -> (Types.BIT, "bool"), 17 -> (Types.BINARY, "bytea"),
    20 -> (Types.BIGINT, "int8"), 21 -> (Types.SMALLINT, "int2"),
    23 -> (Types.INTEGER, "int4"), 25 -> (Types.VARCHAR, "text"),
    700 -> (Types.REAL, "float4"), 701 -> (Types.DOUBLE, "float8"),
    1042 -> (Types.CHAR, "bpchar"), 1043 -> (Types.VARCHAR, "varchar"),
    1082 -> (Types.DATE, "date"), 1114 -> (Types.TIMESTAMP, "timestamp"),
    1184 -> (Types.TIMESTAMP, "timestamptz"), 1700 -> (Types.NUMERIC, "numeric"))

  private def proxy[T](cls: Class[T])(pf: PartialFunction[(String, Array[AnyRef]), AnyRef]): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
      new InvocationHandler {
        override def invoke(p: AnyRef, method: Method, args: Array[AnyRef]): AnyRef = {
          val a = if (args == null) Array.empty[AnyRef] else args
          val key = (method.getName, a)
          if (pf.isDefinedAt(key)) pf(key)
          else method.getName match {
            case "toString" => s"pgwire-${cls.getSimpleName}"
            case "hashCode" => Int.box(System.identityHashCode(p))
            case "equals" => Boolean.box(p eq a(0))
            case "isWrapperFor" => Boolean.box(false)
            case n => throw new SQLFeatureNotSupportedException(
              s"pgwire ${cls.getSimpleName}.$n: not implemented by this shim")
          }
        }
      }).asInstanceOf[T]

  /** Render one JDBC parameter as a SQL literal (see class doc). */
  private def literal(v: AnyRef): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case b: java.lang.Boolean => if (b) "TRUE" else "FALSE"
    case t: java.sql.Timestamp => "TIMESTAMP '" + t.toString + "'"
    case d: java.sql.Date => "DATE '" + d.toString + "'"
    case b: Array[Byte] =>
      "'\\x" + b.map("%02x".format(_)).mkString + "'"
    case d: java.lang.Double if d.isNaN || d.isInfinite => s"'$d'::float8"
    case f: java.lang.Float if f.isNaN || f.isInfinite => s"'$f'::float4"
    case n: java.math.BigDecimal => n.toPlainString
    case other => other.toString // Int/Long/Short/Byte/Float/Double/BigInt
  }

  /** Positions of the top-level '?' placeholders. The scanner skips every
    * PostgreSQL lexical context where '?' is data, not a parameter:
    * single-quoted strings ('' doubling), E'' strings (backslash escapes),
    * `--` line comments, nested block comments, and $tag$ dollar-quoted
    * strings. An unterminated construct swallows the rest of the
    * statement — the same failure mode the server itself would report. */
  private[graft] def paramPositions(sql: String): Seq[Int] = {
    val n = sql.length
    def isIdent(c: Char) = Character.isLetterOrDigit(c) || c == '_'
    def skipQuoted(start: Int, escaped: Boolean): Int = {
      var i = start + 1 // past the opening quote
      while (i < n) {
        val c = sql.charAt(i)
        if (escaped && c == '\\') i += 2
        else if (c == '\'' && i + 1 < n && sql.charAt(i + 1) == '\'') i += 2
        else if (c == '\'') return i + 1
        else i += 1
      }
      n
    }
    def skipBlock(start: Int): Int = { // PG block comments NEST
      var i = start + 2; var depth = 1
      while (i < n && depth > 0) {
        if (i + 1 < n && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') {
          depth += 1; i += 2
        } else if (i + 1 < n && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') {
          depth -= 1; i += 2
        } else i += 1
      }
      i
    }
    def skipDollar(start: Int): Int = {
      // PG dollar-quote tags must START with a letter or underscore
      // (digits allowed only after) — '$1$' is positional-parameter
      // syntax, never a quote opener, so digit-leading tags fall
      // through to the plain-char path instead of swallowing the rest
      // of the statement.
      var j = start + 1
      if (j < n && (Character.isLetter(sql.charAt(j)) || sql.charAt(j) == '_')) {
        while (j < n && isIdent(sql.charAt(j))) j += 1
      }
      if (j < n && sql.charAt(j) == '$') { // a real $$ or $tag$ opener
        val tag = sql.substring(start, j + 1)
        val close = sql.indexOf(tag, j + 1)
        if (close < 0) n else close + tag.length
      } else start + 1 // lone '$' / '$1…' — plain chars
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') i = skipQuoted(i, escaped = false)
      else if ((c == 'E' || c == 'e') && i + 1 < n && sql.charAt(i + 1) == '\'' &&
               (i == 0 || !isIdent(sql.charAt(i - 1)))) i = skipQuoted(i + 1, escaped = true)
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        while (i < n && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') i = skipBlock(i)
      else if (c == '$') i = skipDollar(i)
      else { if (c == '?') out += i; i += 1 }
    }
    out.toSeq
  }

  /** Substitute rendered literals for the '?' placeholders (lexer-aware:
    * a '?' inside a string, comment, or dollar-quote is data). */
  private def render(sql: String, params: Array[AnyRef]): String = {
    val out = new java.lang.StringBuilder
    var last = 0
    paramPositions(sql).zipWithIndex.foreach { case (pos, k) =>
      out.append(sql, last, pos).append(literal(params(k)))
      last = pos + 1
    }
    out.append(sql.substring(last)).toString
  }

  private def countParams(sql: String): Int = paramPositions(sql).length

  private def updateCount(tag: String): Int = {
    val parts = tag.split(" ")
    // "INSERT 0 5" / "UPDATE 3" / "DELETE 2"; DDL tags carry no count
    parts.last.toIntOption.getOrElse(0)
  }

  private[pgwire] def connection(client: PgWireClient, url: String, user: String): Connection = {
    var autoCommit = true
    var inTxn = false
    def run(sql: String): PgWireClient.Result = {
      if (!autoCommit && !inTxn) { client.query("BEGIN"); inTxn = true }
      client.query(sql)
    }
    lazy val conn: Connection = proxy(classOf[Connection]) {
      case ("createStatement", _) => statement(conn, run)
      case ("prepareStatement", args) => prepared(conn, run, args(0).asInstanceOf[String])
      case ("setAutoCommit", args) =>
        val target = args(0).asInstanceOf[java.lang.Boolean].booleanValue()
        if (target && inTxn) { client.query("COMMIT"); inTxn = false }
        autoCommit = target; null
      case ("getAutoCommit", _) => Boolean.box(autoCommit)
      case ("commit", _) =>
        if (inTxn) { client.query("COMMIT"); inTxn = false }; null
      case ("rollback", _) =>
        if (inTxn) { client.query("ROLLBACK"); inTxn = false }; null
      case ("close", _) => client.close(); null
      case ("isClosed", _) => Boolean.box(client.isClosed)
      case ("isValid", _) => Boolean.box(!client.isClosed)
      case ("getMetaData", _) => metaData(conn, url, user)
      // pg has no READ UNCOMMITTED (it silently runs READ COMMITTED) —
      // accepting the set matches pgjdbc behavior
      case ("setTransactionIsolation", _) => null
      case ("getTransactionIsolation", _) => Int.box(Connection.TRANSACTION_READ_COMMITTED)
      case ("getCatalog", _) => "postgres"
      case ("setCatalog", _) | ("clearWarnings", _) | ("setReadOnly", _) => null
      case ("getWarnings", _) => null
      case ("isReadOnly", _) => Boolean.box(false)
      case ("getSchema", _) => "public"
      case ("setNetworkTimeout", _) => null
      case ("getNetworkTimeout", _) => Int.box(0)
    }
    conn
  }

  private def metaData(conn: Connection, url: String, user: String): DatabaseMetaData =
    proxy(classOf[DatabaseMetaData]) {
      case ("supportsTransactions", _) => Boolean.box(true)
      case ("getDefaultTransactionIsolation", _) => Int.box(Connection.TRANSACTION_READ_COMMITTED)
      case ("supportsTransactionIsolationLevel", args) =>
        Boolean.box(args(0).asInstanceOf[java.lang.Integer].intValue() !=
          Connection.TRANSACTION_NONE)
      case ("getDatabaseProductName", _) => "PostgreSQL"
      case ("getDatabaseMajorVersion", _) => Int.box(15)
      case ("getDatabaseMinorVersion", _) => Int.box(0)
      case ("getDriverName", _) => "graft-pgwire"
      case ("getDriverVersion", _) => "0.1"
      case ("getURL", _) => url
      case ("getUserName", _) => user
      case ("getConnection", _) => conn
      case ("getJDBCMajorVersion", _) => Int.box(4)
      case ("getJDBCMinorVersion", _) => Int.box(2)
      case ("getIdentifierQuoteString", _) => "\""
      case ("storesMixedCaseIdentifiers", _) => Boolean.box(false)
      case ("storesLowerCaseIdentifiers", _) => Boolean.box(true)
      case ("storesUpperCaseIdentifiers", _) => Boolean.box(false)
      case ("supportsMixedCaseIdentifiers", _) => Boolean.box(false)
    }

  private def statement(conn: Connection, run: String => PgWireClient.Result): Statement = {
    var last: PgWireClient.Result = null
    var lastRs: ResultSet = null
    lazy val stmt: Statement = proxy(classOf[Statement]) {
      case ("executeQuery", args) =>
        last = run(args(0).asInstanceOf[String])
        lastRs = resultSet(stmt, last); lastRs
      case ("executeUpdate", args) =>
        last = run(args(0).asInstanceOf[String])
        Int.box(last.tags.lastOption.map(updateCount).getOrElse(0))
      case ("execute", args) =>
        last = run(args(0).asInstanceOf[String])
        lastRs = if (last.cols.nonEmpty) resultSet(stmt, last) else null
        Boolean.box(last.cols.nonEmpty)
      case ("getResultSet", _) => lastRs
      case ("getUpdateCount", _) =>
        Int.box(if (last != null && last.cols.isEmpty)
          last.tags.lastOption.map(updateCount).getOrElse(-1) else -1)
      case ("getMoreResults", _) => Boolean.box(false)
      case ("setQueryTimeout", _) | ("setFetchSize", _) | ("setMaxRows", _) |
           ("cancel", _) | ("clearWarnings", _) | ("closeOnCompletion", _) => null
      case ("getFetchSize", _) => Int.box(0)
      case ("getWarnings", _) => null
      case ("close", _) => null
      case ("isClosed", _) => Boolean.box(false)
      case ("getConnection", _) => conn
    }
    stmt
  }

  private def prepared(conn: Connection, run: String => PgWireClient.Result,
                       sql: String): PreparedStatement = {
    val params = new Array[AnyRef](countParams(sql))
    val batch = scala.collection.mutable.ArrayBuffer.empty[String]
    var last: PgWireClient.Result = null
    def setP(args: Array[AnyRef]): AnyRef = {
      params(args(0).asInstanceOf[java.lang.Integer].intValue() - 1) = args(1); null
    }
    lazy val stmt: PreparedStatement = proxy(classOf[PreparedStatement]) {
      case ("executeQuery", Array()) =>
        last = run(render(sql, params)); resultSet(stmt, last)
      case ("executeUpdate", Array()) =>
        last = run(render(sql, params))
        Int.box(last.tags.lastOption.map(updateCount).getOrElse(0))
      case ("execute", Array()) =>
        last = run(render(sql, params)); Boolean.box(last.cols.nonEmpty)
      case ("addBatch", Array()) => batch += render(sql, params); null
      case ("clearBatch", _) => batch.clear(); null
      case ("clearParameters", _) =>
        java.util.Arrays.fill(params, null); null
      case ("executeBatch", _) =>
        if (batch.isEmpty) Array.emptyIntArray
        else {
          // one round trip, one implicit transaction for the whole batch
          val res = run(batch.mkString(";\n"))
          batch.clear()
          res.tags.map(updateCount).toArray
        }
      case ("setNull", args) => params(args(0).asInstanceOf[java.lang.Integer] - 1) = null; null
      case (n, args) if n.startsWith("set") && args.length == 2 &&
        args(0).isInstanceOf[java.lang.Integer] => setP(args)
      case ("setQueryTimeout", _) | ("setFetchSize", _) | ("setMaxRows", _) |
           ("cancel", _) | ("clearWarnings", _) => null
      case ("getWarnings", _) => null
      case ("close", _) => null
      case ("isClosed", _) => Boolean.box(false)
      case ("getConnection", _) => conn
      case ("getMoreResults", _) => Boolean.box(false)
      case ("getUpdateCount", _) => Int.box(-1)
    }
    stmt
  }

  private def parseTimestamp(s: String): java.sql.Timestamp = {
    // "2026-08-14 12:34:56.789" (timestamp) or "...+02" / "...+02:30"
    // (timestamptz under DateStyle=ISO)
    val tz = "([+-]\\d{2}(:\\d{2})?)$".r
    tz.findFirstMatchIn(s) match {
      case Some(m) =>
        val offset = if (m.group(1).length == 3) m.group(1) + ":00" else m.group(1)
        val odt = java.time.OffsetDateTime.parse(
          s.substring(0, m.start).replace(' ', 'T') + offset)
        java.sql.Timestamp.from(odt.toInstant)
      case None => java.sql.Timestamp.valueOf(s)
    }
  }

  private def resultSet(stmt: Statement, res: PgWireClient.Result): ResultSet = {
    var idx = -1
    var lastWasNull = false
    def cell(args: Array[AnyRef]): String = {
      val v = res.rows(idx)(args(0).asInstanceOf[java.lang.Integer].intValue() - 1)
      lastWasNull = v == null
      v
    }
    lazy val rs: ResultSet = proxy(classOf[ResultSet]) {
      case ("next", _) => idx += 1; Boolean.box(idx < res.rows.length)
      case ("close", _) => null
      case ("isClosed", _) => Boolean.box(false)
      case ("wasNull", _) => Boolean.box(lastWasNull)
      case ("getMetaData", _) => rsMetaData(res)
      case ("getStatement", _) => stmt
      case ("getString", args) => cell(args)
      case ("getLong", args) =>
        val v = cell(args); Long.box(if (v == null) 0L else v.toLong)
      case ("getInt", args) =>
        val v = cell(args); Int.box(if (v == null) 0 else v.toInt)
      case ("getShort", args) =>
        val v = cell(args); Short.box(if (v == null) 0 else v.toShort)
      case ("getByte", args) =>
        val v = cell(args); Byte.box(if (v == null) 0 else v.toByte)
      case ("getDouble", args) =>
        val v = cell(args); Double.box(if (v == null) 0d else v.toDouble)
      case ("getFloat", args) =>
        val v = cell(args); Float.box(if (v == null) 0f else v.toFloat)
      case ("getBoolean", args) =>
        val v = cell(args); Boolean.box(v == "t" || v == "true")
      case ("getBigDecimal", args) if args.length == 1 =>
        val v = cell(args); if (v == null) null else new java.math.BigDecimal(v)
      case ("getTimestamp", args) if args.length == 1 =>
        val v = cell(args); if (v == null) null else parseTimestamp(v)
      case ("getDate", args) if args.length == 1 =>
        val v = cell(args); if (v == null) null else java.sql.Date.valueOf(v)
      case ("getBytes", args) =>
        val v = cell(args)
        if (v == null) null
        else {
          require(v.startsWith("\\x"), s"pgwire: unexpected bytea form $v")
          v.drop(2).grouped(2).map(h => Integer.parseInt(h, 16).toByte).toArray
        }
      case ("getObject", args) if args.length == 1 => cell(args)
      case ("findColumn", args) =>
        Int.box(res.cols.indexWhere(_.name == args(0).asInstanceOf[String]) + 1)
    }
    rs
  }

  private def rsMetaData(res: PgWireClient.Result): ResultSetMetaData =
    proxy(classOf[ResultSetMetaData]) {
      case ("getColumnCount", _) => Int.box(res.cols.length)
      case (n, args) if n == "getColumnName" || n == "getColumnLabel" =>
        res.cols(args(0).asInstanceOf[java.lang.Integer] - 1).name
      case ("getColumnType", args) =>
        val c = res.cols(args(0).asInstanceOf[java.lang.Integer] - 1)
        Int.box(typeMap.get(c.typeOid).map(_._1).getOrElse(Types.VARCHAR))
      case ("getColumnTypeName", args) =>
        val c = res.cols(args(0).asInstanceOf[java.lang.Integer] - 1)
        typeMap.get(c.typeOid).map(_._2).getOrElse("text")
      case ("getPrecision", args) =>
        val c = res.cols(args(0).asInstanceOf[java.lang.Integer] - 1)
        Int.box(c.typeOid match {
          case 1700 if c.typmod >= 4 => ((c.typmod - 4) >> 16) & 0xffff
          case 1043 | 1042 if c.typmod >= 4 => c.typmod - 4
          case _ => 0
        })
      case ("getScale", args) =>
        val c = res.cols(args(0).asInstanceOf[java.lang.Integer] - 1)
        Int.box(if (c.typeOid == 1700 && c.typmod >= 4) (c.typmod - 4) & 0xffff else 0)
      case ("isSigned", args) =>
        val c = res.cols(args(0).asInstanceOf[java.lang.Integer] - 1)
        Boolean.box(Set(20, 21, 23, 700, 701, 1700).contains(c.typeOid))
      case ("isNullable", args) => Int.box(ResultSetMetaData.columnNullableUnknown)
      case ("isCaseSensitive", _) => Boolean.box(true)
      case ("isCurrency", _) => Boolean.box(false)
      case ("isAutoIncrement", _) => Boolean.box(false)
    }
}
