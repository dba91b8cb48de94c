package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins the sweep-line concurrency, largest-remainder allocation, and
  * top-N+Other entries (the oracle pins values at sf0.01; these pin the
  * invariants that make them correct at any scale).
  */
class SweepAllocSpec extends SparkSpecBase {

  test("q97 allocation: per-order sums equal the order total exactly") {
    val alloc = SparkEntry.queries("q97_allocation")(spark, sf0001)
      .groupBy("ok").agg(sum("alloc_cents").as("got"))
    val totals = Tables.orders(spark, sf0001).filter(col("o_orderkey") < 400)
      .join(Tables.lineitem(spark, sf0001).filter(col("l_orderkey") < 400)
          .select(col("l_orderkey").as("o_orderkey")).distinct(),
        "o_orderkey")
      .select(col("o_orderkey").as("ok"),
        round(col("o_totalprice") * 100).cast("long").as("total"))
    val joined = alloc.join(totals, "ok").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("got") == r.getAs[Long]("total"), r.toString) }
  }

  test("ev37 distributed prefix sum equals the naive global sweep") {
    val got = SparkEntry.queries("ev37_max_concurrency")(spark, sf0001)
      .collect().head
    val ev = Tables.events(spark, sf0001)
    val pts = ev.select(col("ts").as("t"), lit(1L).as("dl"), col("event_id"))
      .unionByName(ev.select((col("ts") + expr("INTERVAL 30 MINUTE")).as("t"),
        lit(-1L).as("dl"), col("event_id")))
    val naive = pts.withColumn("c", sum("dl").over(
        Window.orderBy(col("t"), col("dl").desc, col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .localCheckpoint(true)
    val peak = naive.agg(max("c")).head().getLong(0)
    val atTs = naive.filter(col("c") === peak).agg(min("t")).head().getTimestamp(0)
    assert(got.getAs[Long]("peak") == peak)
    assert(got.getAs[java.sql.Timestamp]("at_ts") == atTs)
    // sweep closes: total delta is zero
    assert(pts.agg(sum("dl")).head().getLong(0) == 0L)
  }

  test("q99 FIFO window algebra equals a sequential per-part walk") {
    val got = SparkEntry.queries("q99_fifo_cogs")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val li = Tables.lineitem(spark, sf0001).select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_returnflag",
        "l_shipdate", "l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getDouble(1).toLong,
        math.round(r.getDouble(2) * 100) / r.getDouble(1).toLong,
        // shipdate may surface as Timestamp or LocalDateTime depending
        // on the parquet annotation — the ISO string sorts identically
        r.getString(3), String.valueOf(r.get(4)), r.getLong(5), r.getInt(6)))
    val demand = li.filter(_._4 == "R").groupBy(_._1)
      .map { case (pk, rs) => pk -> rs.map(_._2).sum }
    val expect = li.filter(_._4 != "R").groupBy(_._1).collect {
      case (pk, lots) if demand.contains(pk) =>
        var rem = demand(pk); var filled = 0L; var cogs = 0L
        lots.sortBy(l => (l._5, l._6, l._7, l._3)).foreach { l =>
          val used = math.max(0L, math.min(l._2, rem))
          rem -= used; filled += used; cogs += used * l._3
        }
        pk -> (demand(pk), filled, cogs)
    }
    val diff = (got.keySet ++ expect.keySet)
      .filter(k => got.get(k) != expect.get(k)).take(3)
      .map(k => s"$k: got=${got.get(k)} want=${expect.get(k)}")
    assert(expect.nonEmpty && got == expect, diff.mkString("; "))
  }

  test("q98 Other row complements the top five exactly") {
    val rows = SparkEntry.queries("q98_top5_other")(spark, sf0001).collect()
    assert(rows.length == 6, rows.mkString(","))
    val total = Tables.lineitem(spark, sf0001)
      .join(Tables.part(spark, sf0001), col("l_partkey") === col("p_partkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long"))).head().getLong(0)
    assert(rows.map(_.getAs[Long]("cents")).sum == total)
    assert(rows.count(_.getAs[String]("brand") == "Other") == 1)
  }
}
