package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-on-read wrappers for self-describing and inferred sources
  * (SURVEY.md §2 S2–S3, S6).
  *
  * The reference infers a schema per heterogeneous source before planning
  * (reference: DistributedQueryEngine.diff, RDBMSInferrer.scala hunk —
  * RDBMS metadata; the RAW lineage does the same for files). Spark-first:
  * the DataFrameReader already implements sampling-based inference for
  * CSV/JSON; these wrappers pin the options that matter at scale
  * (samplingRatio — never full-scan 100 TB to infer a schema) and expose
  * an explicit infer-then-read path so the inferred schema can be
  * inspected, persisted, and re-applied without re-inference.
  */
object Inference {

  /** CSV with header + type inference. `samplingRatio < 1` bounds the
    * inference pass on large inputs. */
  def csv(spark: SparkSession, path: String, header: Boolean = true,
          delimiter: String = ",", samplingRatio: Double = 1.0): DataFrame =
    spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("inferSchema", "true")
      .option("samplingRatio", samplingRatio.toString)
      .csv(path)

  /** JSON-lines with schema inference (unions record shapes across rows). */
  def json(spark: SparkSession, path: String, samplingRatio: Double = 1.0): DataFrame =
    spark.read
      .option("samplingRatio", samplingRatio.toString)
      .json(path)

  /** Infer once, return the schema for persistence; re-reading with
    * [[withSchema]] then skips the inference scan entirely. */
  def inferCsvSchema(spark: SparkSession, path: String, header: Boolean = true,
                     delimiter: String = ",", samplingRatio: Double = 1.0): StructType =
    csv(spark, path, header, delimiter, samplingRatio).schema

  /** Schema-pinned CSV read — the production path once a schema is known:
    * single pass, no inference job. */
  def withSchema(spark: SparkSession, path: String, schema: StructType,
                 header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.option("header", header.toString).option("sep", delimiter)
      .schema(schema).csv(path)

  /** Hive-style partitioned parquet write (SURVEY.md §2 S6): partition
    * columns become directories, enabling partition pruning on read. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** JSON-lines read with explicit malformed-record policy (S11) — what
    * a 100 TB ingest of third-party data actually needs: `PERMISSIVE`
    * keeps bad lines, NULLs their fields, and captures the raw text in
    * `corruptCol` for quarantine/audit; `DROPMALFORMED` silently drops;
    * `FAILFAST` aborts the job on the first bad record. The corrupt
    * column must be part of the declared schema (Spark only populates
    * it when named), which is why this wrapper pins the whole contract.
    * Caveat: Spark refuses projections that touch ONLY the corrupt
    * column on a raw file scan — materialize (cache/write) the parsed
    * frame before quarantine-only queries.
    */
  def jsonWithPolicy(spark: SparkSession, path: String, schema: StructType,
                     mode: String = "PERMISSIVE",
                     corruptCol: String = "_corrupt_record"): DataFrame = {
    val withCorrupt =
      if (mode.equalsIgnoreCase("PERMISSIVE") && !schema.fieldNames.contains(corruptCol))
        schema.add(corruptCol, org.apache.spark.sql.types.StringType)
      else schema
    spark.read
      .option("mode", mode)
      .option("columnNameOfCorruptRecord", corruptCol)
      .schema(withCorrupt)
      .json(path)
  }

  /** XML with row-tag extraction + schema inference (S13) — Spark 4
    * ships the XML source natively (no spark-xml dependency): each
    * `rowTag` element becomes a row, nested elements become struct
    * fields, attributes surface with the `_` prefix. Rounds out the
    * reference's heterogeneous-file surface (CSV/JSON/parquet/ORC/XML).
    */
  def xml(spark: SparkSession, path: String, rowTag: String,
          samplingRatio: Double = 1.0): DataFrame =
    spark.read.format("xml")
      .option("rowTag", rowTag)
      .option("samplingRatio", samplingRatio.toString)
      .load(path)

  /** Parquet read across evolved schemas (S12): `mergeSchema` unions the
    * footers of every file, so files written before a column existed
    * read as NULL for it — additive schema evolution without a rewrite.
    * (Default reads take ONE footer — fast, but silently drops late
    * columns when the first-listed file predates them; evolution reads
    * must opt in, and at 100 TB you pay one footer per file for it.) */
  def parquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)
}
