package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join") {
    // heavily skewed: 10k rows on one hot key, a few on others
    val big = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      Seq(("a", 1L), ("b", 2L), ("c", 3L))).toDF("k", "v")
    val small = Seq(("hot", "H"), ("a", "A"), ("x", "X")).toDF("k", "tag")
    val plain = big.join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salt spreads a hot key across partitions") {
    val big = (1 to 5000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val small = Seq(("hot", "H")).toDF("k", "tag")
    val salted = Skew.saltedJoin(big, small, Seq("k"), salts = 8)
    // count distinct salts actually used pre-drop by recomputing the expr
    val salts = big.withColumn("s",
        pmod(xxhash64(col("k"), monotonically_increasing_id()), lit(8)))
      .select(countDistinct("s")).as[Long].head()
    assert(salts === 8L)
    assert(salted.count() === 5000)
  }

  test("AQE splits a skewed sort-merge join partition at runtime (the no-code path)") {
    // salting (above) is the EXPLICIT skew tool; AQE's OptimizeSkewedJoin
    // is the automatic one — at 100 TB both matter (AQE splits map-output
    // skew it can see; salting handles hot keys known a priori). Pin that
    // with skew thresholds scaled to test size, the executed plan really
    // marks the SMJ as skew-handled.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val big = ((1 to 40000).map(i => ("hot", i.toLong)) ++
        (1 to 200).map(i => (s"k$i", i.toLong))).toDF("k", "v")
      val other = (("hot", "H") +: (1 to 200).map(i => (s"k$i", s"r$i"))).toDF("k", "tag")
      val joined = big.join(other, Seq("k"))
      // execute THIS plan (count() would plan a different tree) so the
      // adaptive plan is final before inspecting it
      assert(joined.collect().length === 40200)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"expected OptimizeSkewedJoin to mark the SMJ (skew=true) in:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
