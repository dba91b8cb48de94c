package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Avro container (OCF) ingestion WITHOUT the spark-avro module
  * (SURVEY.md §2 S17): only the core avro jars ship on this classpath,
  * so the source is composed from parts the engine already has — the
  * `binaryFile` lake source delivers whole container files partition-locally,
  * `DataFileReader` decodes them, and the writer schema embedded in the
  * container header drives both the Spark schema (the same
  * schema-from-source inference step the reference's RDBMSInferrer does
  * for JDBC types — reference: DistributedQueryEngine.diff,
  * RDBMSInferrer.scala hunk) and the per-record conversion.
  *
  * Scale shape: bounded driver-side HEADER reads for the schema (a few
  * KB per file via DataFileStream, capped file count — never a file
  * body, like parquet footer reads), then files decode in
  * parallel wherever their bytes land — payloads never shuffle. Avro
  * blocks inside one file are sequential by format; the parallel unit
  * is the file, which is what Avro data lakes look like (many
  * container files). No predicate pushdown exists in this path (Avro
  * is row-major) — at 100 TB this source is the INGEST step and the
  * first job converts to parquet, which is where scans get pushdown.
  *
  * Type mapping: primitives 1:1, `union(null, T)` → nullable T,
  * enum → string, fixed/bytes → binary, array/map/record recursive.
  * Multi-branch unions are refused loudly (no sane columnar mapping).
  */
object AvroSource {

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  private[graft] def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.STRING | Schema.Type.ENUM => StringType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"multi-branch Avro union has no columnar mapping: $s")
      sparkType(nonNull.head)
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType),
      containsNull = isNullable(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType),
      valueContainsNull = isNullable(s.getValueType))
    case Schema.Type.RECORD => StructType(s.getFields.asScala.toSeq.map(f =>
      StructField(f.name, sparkType(f.schema), nullable = isNullable(f.schema))))
    case other => throw new IllegalArgumentException(s"unsupported Avro type: $other")
  }

  /** Avro runtime value → Spark row value, schema-directed. */
  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (u: org.apache.avro.util.Utf8, StringType) => u.toString
    case (e: GenericData.EnumSymbol, StringType) => e.toString
    case (s: String, StringType) => s
    case (bb: java.nio.ByteBuffer, BinaryType) =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case (f: GenericData.Fixed, BinaryType) => f.bytes().clone()
    case (r: GenericRecord, st: StructType) =>
      Row.fromSeq(st.fields.toSeq.map(fd => convert(r.get(fd.name), fd.dataType)))
    case (c: java.util.Collection[_], ArrayType(et, _)) =>
      c.asScala.toSeq.map(convert(_, et))
    case (m: java.util.Map[_, _], MapType(_, vt, _)) =>
      m.asScala.map { case (k, value) => k.toString -> convert(value, vt) }.toMap
    case (x, _) => x
  }

  /** The reader schema for the `*.avro` files under `dir` (recursive,
    * matching [[read]]'s listing): container HEADERS are read through
    * the Hadoop FS — a few KB each, never the file bodies — from up to
    * `maxHeaderFiles` files, and the WIDEST schema (most leaf fields)
    * is chosen as the reader, required to contain every other header's
    * fields by name so Avro schema resolution cannot silently project a
    * newer file's columns away (an old-schema file listing first must
    * not decide the schema for the lake). Disagreement beyond
    * subset-evolution fails loudly. */
  def inferSchema(spark: SparkSession, dir: String,
                  maxHeaderFiles: Int = 100): (Schema, StructType) = {
    val paths = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select("path").head(maxHeaderFiles).map(_.getString(0))
    require(paths.nonEmpty, s"no *.avro files under $dir — nothing to infer from")
    val conf = spark.sparkContext.hadoopConfiguration
    val schemas = paths.map { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      val in = hp.getFileSystem(conf).open(hp)
      // DataFileStream reads only the header (magic + metadata block)
      val s = new org.apache.avro.file.DataFileStream(in,
        new GenericDatumReader[GenericRecord]())
      try s.getSchema finally { s.close(); in.close() }
    }.distinct
    val fieldNames: Schema => Set[String] = s => s.getFields.asScala.map(_.name).toSet
    val widest = schemas.maxBy(s => fieldNames(s).size)
    schemas.foreach { s =>
      require(fieldNames(s).subsetOf(fieldNames(widest)),
        s"Avro headers disagree beyond additive evolution: ${fieldNames(s)} " +
          s"vs widest ${fieldNames(widest)} — pass an explicit reader schema")
    }
    (widest, sparkType(widest).asInstanceOf[StructType])
  }

  /** Read every `*.avro` container under `dir` (recursively) as a
    * DataFrame. Files written under a LATER schema version still read:
    * each file decodes with ITS OWN writer schema resolved against the
    * inferred reader schema (Avro's standard schema-resolution rules —
    * the row-major cousin of parquet `mergeSchema`, S12). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val (avro, schema) = inferSchema(spark, dir)
    val readerJson = avro.toString
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select("content").as(Encoders.BINARY)
    files.mapPartitions { it =>
      val reader = new Schema.Parser().parse(readerJson)
      it.flatMap { bytes =>
        val rdr = new DataFileReader(new SeekableByteArrayInput(bytes),
          new GenericDatumReader[GenericRecord](null, reader))
        val rows = scala.collection.mutable.ArrayBuffer.empty[Row]
        try while (rdr.hasNext) {
          rows += convert(rdr.next(), schema).asInstanceOf[Row]
        } finally rdr.close()
        rows
      }
    }(Encoders.row(schema))
  }
}
