package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark query over the sf-dir tables plus (when
  * SQL-expressible) the equivalent DuckDB oracle SQL. Column names/types
  * are aliased identically on both sides — the driver's compare hashes
  * values under sorted column names.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
