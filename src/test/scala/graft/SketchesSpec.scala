package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Pins the KMV sketch: estimator accuracy against the exact counts the
  * sk1 output already carries, the mergeability law (sketch of a union
  * == sketch built from the per-part sketches), and the bounded-heap
  * plan shape (no global sort exchange in the sketch build).
  */
class SketchesSpec extends SparkSpecBase {

  test("sk1 estimates are within KMV error bounds of the exact counts") {
    val r = SparkEntry.queries("sk1_kmv_intersect")(spark, "/root/testdata/sf0.01")
      .collect().head
    val k = r.getAs[Long]("k")
    assert(k == 128, s"union sketch must be full at sf0.01, got $k")
    val estU = r.getAs[Long]("est_union").toDouble
    val exU = r.getAs[Long]("exact_union").toDouble
    val estI = r.getAs[Long]("est_intersect").toDouble
    val exI = r.getAs[Long]("exact_intersect").toDouble
    // KMV relative std error ≈ 1/sqrt(k-2) ≈ 8.9% at k=128; allow 3σ
    assert(math.abs(estU - exU) / exU < 0.27, s"union est $estU vs $exU")
    assert(math.abs(estI - exI) / exI < 0.35, s"intersect est $estI vs $exI")
  }

  test("KMV sketches merge: sketch(A ∪ B) == k-min of sketch(A) ∪ sketch(B)") {
    import spark.implicits._
    val a = spark.range(1, 5000).select((col("id") * 7).as("k"))
    val b = spark.range(2000, 9000).select((col("id") * 7 + 1).as("k"))
    val k = 64
    val direct = Sketches.kmvSketch(a.union(b), "k", k)
      .collect().map(_.getLong(0)).toSet
    val merged = Sketches.kmvSketch(a, "k", k).union(Sketches.kmvSketch(b, "k", k))
      .distinct().orderBy("h").limit(k)
      .collect().map(_.getLong(0)).toSet
    assert(direct.size == k && direct == merged)
  }

  test("kmvSketch plans as a bounded heap (TakeOrdered), not a global sort") {
    val df = Sketches.kmvSketch(
      Tables.orders(spark, sf0001).select(col("o_custkey").as("k")), "k", 128)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$physical")
  }
}
