package graft

import graft.functions.Vectors
import org.apache.spark.sql.functions._

class VectorsSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1L, Array(1.0, 0.0, 2.0), Array(3.0, 4.0, 0.0)),
    (2L, Array(1.0, 1.0, 1.0), Array(1.0, 1.0, 1.0)),
    (3L, Array(2.0, 0.0, 0.0), Array(0.0, 5.0, 0.0))
  ).toDF("id", "a", "b")

  test("dot product folds elementwise products") {
    val rows = df.select($"id", Vectors.dot($"a", $"b").as("d")).orderBy("id")
      .as[(Long, Double)].collect()
    assert(rows === Array((1L, 3.0), (2L, 3.0), (3L, 0.0)))
  }

  test("native vec_dot matches the HOF fold bit-for-bit") {
    val rows = df.select($"id", Vectors.dot($"a", $"b").as("h"),
        Vectors.dotNative($"a", $"b").as("n"))
      .as[(Long, Double, Double)].collect()
    rows.foreach { case (_, h, n) => assert(h === n) }
  }

  test("vec_dot works from SQL once extensions are registered") {
    df.createOrReplaceTempView("vec_spec")
    val out = spark.sql("SELECT vec_dot(a, b) FROM vec_spec WHERE id = 1")
      .as[Double].head()
    assert(out === 3.0)
  }

  test("norm is sqrt of self-dot") {
    val n = df.filter($"id" === 1).select(Vectors.norm($"a")).as[Double].head()
    assert(math.abs(n - math.sqrt(5.0)) < 1e-12)
  }

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val c = df.select($"id",
      Vectors.cosine($"a", $"b", Vectors.norm($"a"), Vectors.norm($"b")).as("c"))
      .orderBy("id").as[(Long, Double)].collect().toMap
    assert(math.abs(c(2L) - 1.0) < 1e-12)
    assert(math.abs(c(3L)) < 1e-12)
  }

  test("signBucket maps sign pattern to expected integer") {
    val d2 = Seq((1L, Array(1.0, -2.0, 3.0)), (2L, Array(-1.0, -1.0, -1.0)))
      .toDF("id", "v")
    val b = d2.select($"id", Vectors.signBucket($"v", 3, 1).as("bk"))
      .as[(Long, Int)].collect().toMap
    assert(b(1L) === 5) // +,-,+ → 101
    assert(b(2L) === 0) // -,-,- → 000
  }
}
