package graft

import graft.sources.Inference
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** S11/S12: what ingest does when the data is wrong or old — malformed
  * third-party records under each policy, and additive parquet schema
  * evolution across files written at different times.
  */
class SourceRobustnessSpec extends SparkSpecBase {
  import spark.implicits._

  private def writeLines(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("badjson")
    java.nio.file.Files.write(dir.resolve("part-0.json"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    dir.toString
  }

  private val schema = new StructType().add("id", LongType).add("name", StringType)
  private val mixed = Seq(
    """{"id": 1, "name": "ok"}""",
    """{"id": "NOT_A_NUMBER", "name": "bad-type"}""",
    """{broken json""",
    """{"id": 4, "name": "ok2"}""")

  test("PERMISSIVE keeps malformed rows, NULLs fields, captures raw text for quarantine") {
    // cache before corrupt-only projections: Spark disallows querying
    // JUST the corrupt column off a raw file scan (QUERY_ONLY_CORRUPT_
    // RECORD_COLUMN) — the quarantine step materializes first anyway
    val df = Inference.jsonWithPolicy(spark, writeLines(mixed), schema).cache()
    try {
    assert(df.count() === 4, "permissive never drops rows")
    val good = df.filter(col("_corrupt_record").isNull)
      .select("id", "name").as[(Long, String)].collect().toSet
    assert(good === Set((1L, "ok"), (4L, "ok2")))
    val quarantined = df.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").as[String].collect()
    assert(quarantined.length === 2)
    assert(quarantined.exists(_.contains("NOT_A_NUMBER"))
      && quarantined.exists(_.contains("{broken json")),
      "the raw offending line must be preserved verbatim")
    } finally df.unpersist()
  }

  test("DROPMALFORMED silently drops; FAILFAST aborts the read") {
    val dir = writeLines(mixed)
    val dropped = Inference.jsonWithPolicy(spark, dir, schema, mode = "DROPMALFORMED")
    assert(dropped.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 4L))
    val ex = intercept[org.apache.spark.SparkException] {
      Inference.jsonWithPolicy(spark, dir, schema, mode = "FAILFAST").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed")
      || Option(ex.getCause).exists(_.getMessage.toLowerCase.contains("malformed")))
  }

  test("XML source: rowTag rows, nested structs, attributes, inferred types") {
    val dir = java.nio.file.Files.createTempDirectory("xmlsrc")
    java.nio.file.Files.write(dir.resolve("cat.xml"),
      """<catalog>
        |  <book id="b1"><title>Spark</title><price>10.5</price>
        |    <author><name>Ada</name></author></book>
        |  <book id="b2"><title>Query</title><price>7</price>
        |    <author><name>Lin</name></author></book>
        |</catalog>""".stripMargin.getBytes("UTF-8"))
    val df = Inference.xml(spark, dir.toString, rowTag = "book")
    assert(df.count() === 2)
    val rows = df.select(col("_id"), col("title"), col("price").cast("double"),
        col("author.name")).as[(String, String, Double, String)]
      .collect().toSet
    assert(rows === Set(("b1", "Spark", 10.5, "Ada"), ("b2", "Query", 7.0, "Lin")))
  }

  test("mergeSchema reads files written before a column existed (additive evolution)") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString + "/t"
    Seq((1L, "a")).toDF("id", "name").write.parquet(dir)          // v1 schema
    Seq((2L, "b", 9.5)).toDF("id", "name", "score")               // v2 adds score
      .write.mode("append").parquet(dir)
    val merged = Inference.parquetMerged(spark, dir)
    assert(merged.columns.sorted.toSeq === Seq("id", "name", "score"))
    val rows = merged.select("id", "score").as[(Long, Option[Double])]
      .collect().toMap
    assert(rows(1L).isEmpty, "pre-evolution file reads the new column as NULL")
    assert(rows(2L).contains(9.5))
  }
}
