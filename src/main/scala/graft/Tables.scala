package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * Mirrors the reference's per-source inference step (reference:
  * DistributedQueryEngine.diff, RDBMSInferrer.scala hunk) — here parquet
  * carries its own schema, so "inference" is the DSv2 footer read; the
  * CSV/JSON inference path lives in [[graft.sources.Inference]].
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** The driver-generated events.parquet has shipped `ts` in two
    * encodings across rounds: TIMESTAMP(NANOS) (which Spark's vectorized
    * reader rejects — read nanos as long via the legacy conf and
    * floor-divide to micros, identical to DuckDB's ns→µs truncation) and
    * TIMESTAMP(MICROS) isAdjustedToUTC=false (which Spark reads as
    * TIMESTAMP_NTZ). Branch on the footer type and normalize both to
    * session-local TimestampType — the session runs in UTC everywhere
    * (builder conf), so the NTZ→LTZ cast is wall-time-preserving and the
    * values match DuckDB's TIMESTAMP exactly.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    try s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () } // already set via builder
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
}
