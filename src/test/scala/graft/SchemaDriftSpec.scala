package graft

import graft.sources.{Inference, SchemaDrift}
import org.apache.spark.sql.types._
import java.nio.file.Files

/** S18: landing-zone schema drift — classification, the additive gate,
  * and the end-to-end shape (a re-inferred JSON batch checked against
  * the registered schema before it lands).
  */
class SchemaDriftSpec extends SparkSpecBase {

  private val registered = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("lang", StringType, nullable = true))), nullable = true)))

  test("drift classifies added, dropped, and retyped fields by dotted path") {
    val incoming = StructType(Seq(
      StructField("id", StringType, nullable = false), // retyped
      StructField("score", DoubleType, nullable = true), // added
      StructField("meta", StructType(Seq(
        StructField("source", StringType, nullable = true))), nullable = true)))
    val d = SchemaDrift.diff(registered, incoming)
    assert(d.added.map(_._1) === Seq("score", "meta.source"))
    assert(d.dropped.map(_._1) === Seq("name", "meta.lang"))
    assert(d.retyped === Seq(("id", "bigint", "string")))
    assert(!d.isAdditive)
    assert(d.describe.contains("~ id: bigint -> string"))
  }

  test("additive gate evolves the schema for new fields, including nested ones") {
    val incoming = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = false), // new top-level
      StructField("meta", StructType(Seq(
        StructField("lang", StringType, nullable = true),
        StructField("source", StringType, nullable = false))), nullable = true)))
    val evolved = SchemaDrift.gateAdditive(registered, incoming)
    // registered fields keep their shape; new fields append as NULLABLE
    assert(evolved.fieldNames.toSeq === Seq("id", "name", "meta", "score"))
    assert(evolved("score").nullable, "history has no score values — must be nullable")
    val meta = evolved("meta").dataType.asInstanceOf[StructType]
    assert(meta.fieldNames.toSeq === Seq("lang", "source"))
    assert(meta("source").nullable)
  }

  test("nullability-only differences are not drift (JSON infers permissive flags)") {
    val reg = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StringType, containsNull = false), nullable = false)))
    val incoming = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("tags", ArrayType(StringType, containsNull = true), nullable = true)))
    val d = SchemaDrift.diff(reg, incoming)
    assert(d.isEmpty, s"nullability widening must not be drift: ${d.describe}")
    // and the gate passes the batch through unchanged
    assert(SchemaDrift.gateAdditive(reg, incoming) === reg)
  }

  test("additive gate refuses drops and retypes with the full report") {
    val dropped = StructType(registered.fields.filterNot(_.name == "name"))
    val e1 = intercept[IllegalArgumentException] {
      SchemaDrift.gateAdditive(registered, dropped)
    }
    assert(e1.getMessage.contains("- name"))
    val retyped = StructType(registered.fields.map(f =>
      if (f.name == "id") f.copy(dataType = StringType) else f))
    val e2 = intercept[IllegalArgumentException] {
      SchemaDrift.gateAdditive(registered, retyped)
    }
    assert(e2.getMessage.contains("~ id"))
  }

  test("end to end: a drifted JSON batch is caught at the landing zone") {
    val ok = Files.createTempFile("batch_ok", ".json")
    Files.writeString(ok, """{"id":1,"name":"a"}""" + "\n" + """{"id":2,"name":"b","score":0.5}""" + "\n")
    val bad = Files.createTempFile("batch_bad", ".json")
    Files.writeString(bad, """{"id":"oops","name":"c"}""" + "\n")
    val reg = StructType(Seq(
      StructField("id", LongType, nullable = true),
      StructField("name", StringType, nullable = true)))
    // additive batch evolves (score appended, nullable)
    val okSchema = Inference.json(spark, ok.toString).schema
    val evolved = SchemaDrift.gateAdditive(reg, okSchema)
    assert(evolved.fieldNames.contains("score"))
    // retyping batch is refused before landing
    val badSchema = Inference.json(spark, bad.toString).schema
    assert(intercept[IllegalArgumentException] {
      SchemaDrift.gateAdditive(reg, badSchema)
    }.getMessage.contains("~ id"))
  }
}
