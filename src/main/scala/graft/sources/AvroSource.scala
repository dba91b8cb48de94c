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
  * Scale shape: one driver-side header read for the schema (a bounded
  * metadata fetch, like a parquet footer), then files decode in
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

  /** The container-embedded writer schema of the first `*.avro` file
    * under `dir` — the source's self-describing inference step. */
  def inferSchema(spark: SparkSession, dir: String): (Schema, StructType) = {
    val heads = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(dir)
      .select("content").head(1)
    require(heads.nonEmpty, s"no *.avro files under $dir — nothing to infer from")
    val first = heads.head.getAs[Array[Byte]](0)
    val rdr = new DataFileReader(new SeekableByteArrayInput(first),
      new GenericDatumReader[GenericRecord]())
    val avro = try rdr.getSchema finally rdr.close()
    (avro, sparkType(avro).asInstanceOf[StructType])
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
