package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** The physical whole-operator rung (graft.plans.AsOfJoinExec): the
  * asof_match marker must really plan as the custom exec, and the exec
  * must agree with the union–window composition everywhere — including
  * the null and no-match edges a merge-pass implementation can get
  * wrong.
  */
class AsOfExecSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60000L)

  private def trades = Seq((1L, 1L, ts(10)), (2L, 1L, ts(30)), (3L, 2L, ts(5)),
      (4L, 2L, ts(60)), (5L, 3L, ts(7)))
    .toDF("trade_id", "sym", "ts")
  private def quotes = Seq((1L, ts(5), 100.0), (1L, ts(10), 101.0),
      (1L, ts(25), 102.0), (2L, ts(50), 200.0), (9L, ts(1), 900.0))
    .toDF("sym", "q_ts", "px")

  test("asof_match join executes as AsOfJoinExec") {
    val out = AsOfJoin.asofNative(trades, quotes, "sym", "ts", "q_ts")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin "), s"custom exec not planned:\n$p") // nodeName strips "Exec"
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "built-in join must not execute the marker condition")
  }

  test("exec matches backward-inclusive as-of semantics incl. no-match rows") {
    val out = AsOfJoin.asofNative(trades, quotes, "sym", "ts", "q_ts")
      .select("trade_id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out(1L) === Some(101.0)) // inclusive at equal ts
    assert(out(2L) === Some(102.0)) // latest earlier
    assert(out(3L) === None)        // right rows exist for sym 2 but all later
    assert(out(4L) === Some(200.0))
    assert(out(5L) === None)        // no right rows for sym 3 at all
  }

  test("exec ≡ union–window composition on the sf0.001 attribution join") {
    val ev = Tables.events(spark, sf0001)
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("ts").as("view_ts"))
      .agg(max("value").as("view_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("event_id", "user_id", "ts")
    val native = AsOfJoin.asofNative(purchases, views, "user_id", "ts", "view_ts")
      .orderBy("event_id")
    val composed = AsOfJoin.asof(purchases,
        views.withColumn("ts", col("view_ts")), Seq("user_id"), "ts",
        Seq("view_ts", "view_value"), rightTiebreak = lit(0))
      .orderBy("event_id")
    assert(native.columns.toSeq === composed.columns.toSeq)
    assert(native.collect().toSeq === composed.collect().toSeq)
    assert(native.count() === purchases.count(), "left outer: every left row survives")
  }

  test("null keys and null times never match but left rows survive") {
    val l = Seq((1L, Option(1L), Option(ts(10))), (2L, None, Option(ts(10))),
        (3L, Option(1L), None))
      .toDF("id", "sym", "ts")
    val r = Seq((Option(1L), Option(ts(5)), 1.0), (None, Option(ts(1)), 2.0),
        (Option(1L), None, 3.0))
      .toDF("sym", "q_ts", "px")
    val out = AsOfJoin.asofNative(l, r, "sym", "ts", "q_ts")
      .select("id", "px").as[(Long, Option[Double])].collect().toMap
    assert(out === Map(1L -> Some(1.0), 2L -> None, 3L -> None))
  }

  test("dense repeated timestamps per key stay coherent (one right row attaches)") {
    // several left rows at the same (key, time): all get the same candidate
    val l = Seq.tabulate(100)(i => (i.toLong, 1L, ts(10 + (i % 3))))
      .toDF("id", "sym", "ts")
    val r = Seq((1L, ts(10), 10.0), (1L, ts(11), 11.0), (1L, ts(12), 12.0))
      .toDF("sym", "q_ts", "px")
    val out = AsOfJoin.asofNative(l, r, "sym", "ts", "q_ts")
      .select("id", "px").as[(Long, Double)].collect().toMap
    (0 until 100).foreach { i =>
      assert(out(i.toLong) === (10 + (i % 3)).toDouble)
    }
  }

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq
}
