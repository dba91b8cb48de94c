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
}
