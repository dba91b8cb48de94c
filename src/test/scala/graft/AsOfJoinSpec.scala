package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  test("asof attaches latest earlier right row per key, inclusive on ties") {
    val trades = Seq((1L, 1L, ts(10)), (2L, 1L, ts(30)), (3L, 2L, ts(5)))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq((1L, ts(5), 100.0), (1L, ts(10), 101.0), (1L, ts(25), 102.0),
        (2L, ts(50), 200.0))
      .toDF("sym", "ts", "px").withColumn("q_ts", col("ts"))
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts",
        Seq("q_ts", "px"), rightTiebreak = lit(0))
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(101.0)) // ts(10) matches quote AT ts(10) (inclusive)
    assert(out(2L) === Some(102.0)) // latest earlier quote
    assert(out(3L) === None)        // no quote at or before ts(5) for sym 2
  }

  test("asof attaches ONE coherent right row even when its fields are null") {
    val trades = Seq((1L, 1L, ts(30))).toDF("trade_id", "sym", "ts")
    // latest quote has px=null; a column-wise carry would leak 100.0 from
    // the older quote — correct ASOF semantics attach (ts(20), null)
    val quotes = Seq((1L, ts(10), Some(100.0)), (1L, ts(20), None))
      .toDF("sym", "ts", "px").withColumn("q_ts", col("ts"))
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), "ts",
        Seq("q_ts", "px"), rightTiebreak = lit(0))
      .select("trade_id", "q_ts", "px").as[(Long, Timestamp, Option[Double])].head()
    assert(out === ((1L, ts(20), None)))
  }

  test("rangeJoin ignores inverted intervals instead of exploding buckets") {
    val fact = Seq((1L, 10.0)).toDF("id", "v")
    val ranges = Seq((500.0, 0.0, "bad"), (0.0, 50.0, "ok")).toDF("lo", "hi", "band")
    val out = AsOfJoin.rangeJoin(fact, "v", ranges, "lo", "hi", bucketWidth = 50L)
      .select("id", "band").as[(Long, String)].collect()
    assert(out.toSeq === Seq((1L, "ok")))
  }

  test("rangeJoin matches values into overlapping intervals only") {
    val fact = Seq((1L, 5.0), (2L, 55.0), (3L, 150.0), (4L, 99.99))
      .toDF("id", "v")
    val ranges = Seq((0.0, 50.0, "lo"), (50.0, 100.0, "mid"), (200.0, 300.0, "hi"))
      .toDF("lo", "hi", "band")
    val out = AsOfJoin.rangeJoin(fact, "v", ranges, "lo", "hi", bucketWidth = 50L)
      .select("id", "band").as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "lo", 2L -> "mid", 4L -> "mid")) // 150 matches nothing
  }

  test("rangeJoin handles intervals wider than the bucket") {
    val fact = Seq((1L, 10.0), (2L, 160.0)).toDF("id", "v")
    val ranges = Seq((0.0, 175.0, "wide")).toDF("lo", "hi", "band")
    val out = AsOfJoin.rangeJoin(fact, "v", ranges, "lo", "hi", bucketWidth = 50L)
    assert(out.count() === 2)
  }
}
