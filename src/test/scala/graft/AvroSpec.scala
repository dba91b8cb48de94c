package graft

import graft.sources.AvroSource
import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord, GenericRecordBuilder}
import org.apache.spark.sql.types._
import java.nio.file.Files

/** S17: Avro container ingestion without the spark-avro module — the
  * container's writer schema drives inference, records decode
  * partition-locally, and Avro schema resolution covers files written
  * before a column existed (the row-major cousin of S12's parquet
  * mergeSchema).
  */
class AvroSpec extends SparkSpecBase {
  import spark.implicits._

  private def v1Schema: Schema = SchemaBuilder.record("doc").fields()
    .requiredLong("id")
    .name("title").`type`().unionOf().nullType().and().stringType().endUnion().nullDefault()
    .requiredDouble("score")
    .name("tags").`type`().array().items().stringType().noDefault()
    .endRecord()

  private def writeAvro(path: java.nio.file.Path, schema: Schema,
                        rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, path.toFile)
    try rows.foreach(w.append) finally w.close()
  }

  private def rec(schema: Schema, id: Long, title: String, score: Double,
                  tags: Seq[String]): GenericRecord = {
    val b = new GenericRecordBuilder(schema)
      .set("id", id).set("title", title).set("score", score)
      .set("tags", java.util.Arrays.asList(tags: _*))
    b.build()
  }

  test("Avro containers read with inferred schema, nullable unions, and arrays") {
    val dir = Files.createTempDirectory("avrolake")
    writeAvro(dir.resolve("a.avro"), v1Schema, Seq(
      rec(v1Schema, 1L, "alpha", 0.5, Seq("x", "y")),
      rec(v1Schema, 2L, null, 1.5, Seq.empty)))
    // nested shard directory: inference and read must both recurse
    val sub = Files.createDirectory(dir.resolve("shard0"))
    writeAvro(sub.resolve("b.avro"), v1Schema, Seq(
      rec(v1Schema, 3L, "gamma", 2.5, Seq("z"))))

    val df = AvroSource.read(spark, dir.toString)
    assert(df.schema === StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("title", StringType, nullable = true),
      StructField("score", DoubleType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = false))))
    val rows = df.orderBy("id")
      .as[(Long, Option[String], Double, Seq[String])].collect()
    assert(rows.toSeq === Seq(
      (1L, Some("alpha"), 0.5, Seq("x", "y")),
      (2L, None, 1.5, Seq.empty),
      (3L, Some("gamma"), 2.5, Seq("z"))))
    // and the frame is a full citizen of the engine: SQL over it works
    df.createOrReplaceTempView("avro_docs")
    assert(spark.sql("SELECT count(*) FROM avro_docs WHERE score > 1").head().getLong(0) === 2L)
  }

  test("Avro schema resolution reads old-schema files under the evolved schema") {
    // v2 adds a defaulted column; inference picks the WIDEST header
    // regardless of listing order (the old file deliberately sorts
    // FIRST here), and per-file writer-schema resolution fills the
    // old rows' missing column from its default
    val v2Schema = SchemaBuilder.record("doc").fields()
      .requiredLong("id")
      .name("title").`type`().unionOf().nullType().and().stringType().endUnion().nullDefault()
      .requiredDouble("score")
      .name("tags").`type`().array().items().stringType().noDefault()
      .name("lang").`type`().stringType().stringDefault("und")
      .endRecord()
    val dir = Files.createTempDirectory("avroevolve")
    // the OLD-schema file sorts first: the widest-header rule, not
    // listing order, must pick the evolved schema
    writeAvro(dir.resolve("0_old.avro"), v1Schema, Seq(
      rec(v1Schema, 11L, "old", 8.0, Seq("o"))))
    writeAvro(dir.resolve("1_new.avro"), v2Schema, Seq(
      new GenericRecordBuilder(v2Schema).set("id", 10L).set("title", "new")
        .set("score", 9.0).set("tags", java.util.Arrays.asList("n"))
        .set("lang", "en").build()))

    val df = AvroSource.read(spark, dir.toString)
    assert(df.columns.toSeq === Seq("id", "title", "score", "tags", "lang"))
    val byId = df.collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(byId(10L) === "en")
    assert(byId(11L) === "und", "old file must resolve the missing column to its default")
  }

  test("multi-branch unions are refused loudly") {
    val bad = SchemaBuilder.record("r").fields()
      .name("u").`type`().unionOf().intType().and().stringType().endUnion().noDefault()
      .endRecord()
    val e = intercept[IllegalArgumentException] { AvroSource.sparkType(bad) }
    assert(e.getMessage.contains("union"))
  }
}
