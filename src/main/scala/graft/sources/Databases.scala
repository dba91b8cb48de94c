package graft.sources

import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Vendor database registry (reference: DistributedQueryEngine.diff,
  * RDBMSDatabase.scala hunk — `PostgresqlDatabase` / `ApacheHiveDatabase`
  * with vendor-specific driver + connection string): the per-vendor
  * connection model the pushdown layer needs to pick a dialect.
  */
sealed abstract class DatabaseConfig {
  def name: String
  def host: String
  def port: Int
  def database: String
  def username: Option[String]
  def password: Option[String]
  def vendor: String
  def driver: String
  def connectionString: String
  def dialect: SqlDialect
}

final case class PostgresConfig(name: String, host: String, port: Int,
    database: String, username: Option[String] = None,
    password: Option[String] = None) extends DatabaseConfig {
  val vendor = DatabaseConfig.POSTGRESQL
  val driver = "org.postgresql.Driver"
  def connectionString = s"jdbc:postgresql://$host:$port/$database"
  def dialect: SqlDialect = PostgresDialect
}

final case class HiveConfig(name: String, host: String, port: Int,
    database: String, username: Option[String] = None,
    password: Option[String] = None) extends DatabaseConfig {
  val vendor = DatabaseConfig.HIVE
  val driver = "org.apache.hive.jdbc.HiveDriver"
  def connectionString = s"jdbc:hive2://$host:$port/$database"
  def dialect: SqlDialect = HiveDialect
}

final case class MySqlConfig(name: String, host: String, port: Int,
    database: String, username: Option[String] = None,
    password: Option[String] = None) extends DatabaseConfig {
  val vendor = DatabaseConfig.MYSQL
  val driver = "com.mysql.cj.jdbc.Driver"
  def connectionString = s"jdbc:mysql://$host:$port/$database"
  def dialect: SqlDialect = MySqlDialect
}

final case class OracleConfig(name: String, host: String, port: Int,
    database: String, username: Option[String] = None,
    password: Option[String] = None) extends DatabaseConfig {
  val vendor = DatabaseConfig.ORACLE
  val driver = "oracle.jdbc.OracleDriver"
  // service-name form — the modern shape Spark's OracleDialect expects
  def connectionString = s"jdbc:oracle:thin:@//$host:$port/$database"
  def dialect: SqlDialect = OracleDialect
}

object DatabaseConfig {
  final val POSTGRESQL = "postgresql"
  final val HIVE = "apache-hive"
  // the reference enumerates both and THROWS for each (diff :50-51,
  // :60) — implemented here instead: full config + dialect, exercised
  // by spec (no live server ships in-sandbox, matching the reference's
  // own evidence level for these vendors minus the throw)
  final val MYSQL = "mysql"
  final val ORACLE = "oracle"

  def apply(name: String, vendor: String, host: String, port: Int,
            database: String, username: Option[String],
            password: Option[String]): DatabaseConfig = vendor match {
    case POSTGRESQL => PostgresConfig(name, host, port, database, username, password)
    case HIVE       => HiveConfig(name, host, port, database, username, password)
    case MYSQL      => MySqlConfig(name, host, port, database, username, password)
    case ORACLE     => OracleConfig(name, host, port, database, username, password)
    case other      => throw new IllegalArgumentException(s"Unknown database vendor: $other")
  }

  /** Vendor token out of a JDBC URL (`jdbc:hive2://…` → `hive2`) —
    * reference: RDBMSPushdown.scala `vendorFromConnStr`. Malformed URLs
    * yield "" so [[dialectFor]] can fall back instead of throwing. */
  def vendorFromConnectionString(s: String): String = {
    val end = s.indexOf(":", 5)
    if (s.length < 5 || end < 0) "" else s.substring(5, end)
  }

  /** Dialect selection off the URL, as the reference's pushdown does when
    * choosing its pretty-printer. */
  def dialectFor(connectionString: String): SqlDialect =
    vendorFromConnectionString(connectionString) match {
      case "hive2" => HiveDialect
      case "postgresql" => PostgresDialect
      case "mysql" => MySqlDialect
      case "oracle" => OracleDialect
      case _ => AnsiDialect
    }

  /** Hive-side inference: map `DESCRIBE <table>` output (col_name,
    * data_type string) to a Spark schema — reference: RDBMSInferrer.scala
    * `getHiveType` hunk, which switches on the type-name string because
    * Hive's JDBC metadata is unreliable. Spark-first: Hive type DDL is a
    * subset of Spark's, so `DataType.fromDDL` covers the whole lattice
    * (primitives, decimal(p,s), array/map/struct) instead of the
    * reference's five-case partial match.
    */
  def hiveDescribeToSchema(rows: Seq[(String, String)]): StructType =
    StructType(rows
      // DESCRIBE repeats partition columns after a blank/'#' separator —
      // consume only the column section or partition cols appear twice
      .takeWhile { case (n, _) => n != null && n.nonEmpty && !n.startsWith("#") }
      .map { case (n, t) => StructField(n, DataType.fromDDL(t)) })
}
