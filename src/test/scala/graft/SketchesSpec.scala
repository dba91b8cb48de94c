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

  test("sk2 count-min never underestimates and stays within the CMS error bound") {
    val rows = SparkEntry.queries("sk2_countmin")(spark, "/root/testdata/sf0.01")
      .collect()
    val n = Tables.lineitem(spark, "/root/testdata/sf0.01").count()
    // ε = e/w; P(est > exact + εN) ≤ e^-d — use 3εN as a hard ceiling
    val bound = 3.0 * math.E * n / 8192
    rows.foreach { r =>
      val (est, exact) = (r.getAs[Long]("est"), r.getAs[Long]("exact"))
      assert(est >= exact, s"CMS underestimated: $r")
      assert(est - exact <= bound, s"CMS error ${est - exact} > $bound: $r")
    }
  }

  test("sk3 AMS F2 estimate is within 3x of the exact self-join size") {
    val r = SparkEntry.queries("sk3_ams_f2")(spark, "/root/testdata/sf0.01")
      .collect().head
    val (est, exact) = (r.getAs[Long]("f2_est").toDouble, r.getAs[Long]("f2_exact").toDouble)
    assert(est > exact / 3 && est < exact * 3, s"est=$est exact=$exact")
  }

  test("ev36 clamped balance equals a sequential per-user fold") {
    val got = SparkEntry.queries("ev36_clamped_balance")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val events = Tables.events(spark, sf0001)
      .select("user_id", "ts", "event_id", "event_type", "value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val expect = events.groupBy(_._1).map { case (u, es) =>
      val deltas = es.sortBy(e => (e._2.getTime, e._3)).map { e =>
        val cents = math.round(e._5 * 100)
        if (e._4 == "purchase" || e._4 == "signup") cents else -cents
      }
      u -> (es.length.toLong, deltas.foldLeft(0L)((a, x) => math.max(a + x, 0L)))
    }
    assert(got == expect)
  }

  test("kmvSketch plans as a bounded heap (TakeOrdered), not a global sort") {
    val df = Sketches.kmvSketch(
      Tables.orders(spark, sf0001).select(col("o_custkey").as("k")), "k", 128)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$physical")
  }
}
