package graft

import graft.sources.Inference
import org.apache.spark.sql.types._
import java.nio.file.Files

/** CSV/JSON schema-on-read inference (SURVEY.md §2 S2–S3, S6). */
class InferenceSpec extends SparkSpecBase {

  private def tmpFile(suffix: String, content: String): String = {
    val p = Files.createTempFile("inferspec", suffix)
    Files.writeString(p, content)
    p.toString
  }

  test("CSV inference detects long, double, string, and header names") {
    val path = tmpFile(".csv", "id,price,name\n1,1.5,alpha\n2,2.5,beta\n")
    val df = Inference.csv(spark, path)
    assert(df.schema === StructType(Seq(
      StructField("id", IntegerType, true),
      StructField("price", DoubleType, true),
      StructField("name", StringType, true))))
    assert(df.count() === 2)
  }

  test("inferred schema can be pinned for a no-inference re-read") {
    val path = tmpFile(".csv", "a,b\n1,x\n2,y\n")
    val schema = Inference.inferCsvSchema(spark, path)
    val df = Inference.withSchema(spark, path, schema)
    assert(df.schema === schema && df.count() === 2)
  }

  test("JSON-lines inference unions record shapes across rows") {
    val path = tmpFile(".json",
      """{"id":1,"name":"a"}
        |{"id":2,"name":"b","extra":true}
        |""".stripMargin)
    val df = Inference.json(spark, path)
    assert(df.columns.sorted === Array("extra", "id", "name"))
    assert(df.count() === 2)
  }

  test("CSV and JSON sinks round-trip through their own inference (S8)") {
    import spark.implicits._
    val base = Files.createTempDirectory("sinkspec").toString
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    df.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    df.write.mode("overwrite").json(s"$base/json")
    val csvBack = Inference.csv(spark, s"$base/csv")
    val jsonBack = Inference.json(spark, s"$base/json")
    assert(csvBack.orderBy("id").as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a", 1.5), (2L, "b", 2.5)))
    assert(jsonBack.select("id", "s", "v").orderBy("id")
      .as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a", 1.5), (2L, "b", 2.5)))
  }

  test("ORC round-trip preserves schema and rows (S7)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orcspec").toString + "/t"
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5)).toDF("id", "s", "v")
    df.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // ORC reads back everything nullable; compare names + types
    assert(back.schema.fields.map(f => (f.name, f.dataType)) ===
      df.schema.fields.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect() === df.orderBy("id").collect())
    // predicate pushdown reaches the ORC scan
    val plan = back.filter($"id" === 2L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"))
  }

  test("partitioned write creates partition directories prunable on read") {
    import spark.implicits._
    val dir = Files.createTempDirectory("partspec").toString + "/out"
    val df = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)).toDF("id", "k", "v")
    Inference.writePartitioned(df, dir, Seq("k"))
    assert(new java.io.File(s"$dir/k=a").isDirectory)
    val back = spark.read.parquet(dir).filter($"k" === "a")
    assert(back.count() === 2)
    // partition filter must prune, not scan+filter: shows up in the plan
    val plan = back.queryExecution.executedPlan.toString
    assert(!plan.contains("k=b"))
  }
}
