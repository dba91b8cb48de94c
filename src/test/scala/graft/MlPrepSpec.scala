package graft

import org.apache.spark.sql.functions._

/** Pins the ML feature-prep family's algebraic properties (the oracle
  * pins the values; these pin the semantics that make the encodings
  * correct encodings).
  */
class MlPrepSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.01"

  test("ml1 target encoding shrinks every segment toward the global mean") {
    val rows = SparkEntry.queries("ml1_target_encoding")(spark, sf).collect()
    val j = Tables.orders(spark, sf).join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("seg"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val raw = j.groupBy("seg").agg(avg("cents").as("m")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val global = j.agg(avg("cents")).head().getDouble(0)
    rows.foreach { r =>
      val (seg, enc) = (r.getString(0), r.getAs[Long]("enc_cents").toDouble)
      val m = raw(seg)
      // smoothed estimate lies strictly between the raw category mean
      // and the global mean (within 1 cent of truncation slack)
      assert((enc >= math.min(m, global) - 1) && (enc <= math.max(m, global) + 1),
        s"$seg: enc=$enc raw=$m global=$global")
    }
  }

  test("ml2 information-value terms are non-negative") {
    // (g/gt - b/bt) and ln((g·bt)/(b·gt)) always share a sign
    val rows = SparkEntry.queries("ml2_woe_iv")(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("iv_term") >= 0.0, r.toString) }
  }

  test("ml3 hashing trick output stays within 32 buckets and covers multi-token names") {
    val rows = SparkEntry.queries("ml3_feature_hash")(spark, sf).collect()
    assert(rows.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0 && b < 32 })
    // every selected part must emit at least one feature
    val keys = rows.map(_.getAs[Long]("p_partkey")).distinct.length
    val parts = Tables.part(spark, sf).filter(col("p_partkey") < 1000).count()
    assert(keys == parts, s"$keys featurized of $parts parts")
  }

  test("ml4 mutual-information cells sum to a non-negative MI") {
    val rows = SparkEntry.queries("ml4_mutual_info")(spark, sf).collect()
    val mi = rows.map(_.getAs[Double]("mi_term")).sum
    // MI ≥ 0 up to the 6-dp rounding of each of the 25 cells
    assert(mi >= -25e-6, s"MI=$mi")
    assert(rows.length == 25)
  }
}
