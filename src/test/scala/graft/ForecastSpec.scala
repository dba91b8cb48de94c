package graft

import org.apache.spark.sql.functions._

/** Pins T43 (ev35 Holt forecast) and R106 (dq2 DP release) against
  * sequential references using the identical arithmetic. */
class ForecastSpec extends SparkSpecBase {

  test("ev35: Holt fold equals the sequential recurrence, forecasts bit-exact") {
    import spark.implicits._
    val days = Tables.events(spark, sf0001)
      .select(date_trunc("day", $"ts").as("dy"), $"event_type")
      .groupBy("dy", "event_type").agg(count(lit(1)).as("n"))
      .as[(java.sql.Timestamp, String, Long)].collect()
    val allDays = {
      val ds = days.map(_._1.getTime).distinct
      val (lo, hi) = (ds.min, ds.max)
      (lo to hi by 86400000L).toSeq
    }
    val types = days.map(_._2).distinct.sorted
    val got = graft.operators.EventOps.catalog
      .find(_.name == "ev35_holt_forecast").get.run(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for (t <- types) {
      val byDay = days.filter(_._2 == t).map(d => d._1.getTime -> d._3).toMap
      val xs = allDays.map(d => byDay.getOrElse(d, 0L).toDouble)
      var l = xs.head; var tr = 0.0
      for (x <- xs.tail) {
        val l2 = 0.5 * x + 0.5 * (l + tr)
        tr = 0.25 * (l2 - l) + 0.75 * tr
        l = l2
      }
      for (h <- 1 to 7)
        assert(got((t, h.toLong)) === l + h.toDouble * tr, s"$t h=$h")
    }
  }

  test("dq2: DP noise is the table entry selected by the salted hash; release is sane") {
    import spark.implicits._
    val trueCounts = Tables.orders(spark, sf0001)
      .groupBy($"o_orderpriority").agg(count(lit(1)))
      .as[(String, Long)].collect().toMap
    val got = graft.operators.DataChecks.catalog
      .find(_.name == "dq2_dp_release").get.run(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq.sorted === trueCounts.keys.toSeq.sorted)
    for ((grp, epsPm, noisy) <- got) {
      assert(epsPm === 1000)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$grp:dp1".getBytes("UTF-8"))
      val idx = Integer.parseInt(md.map("%02x".format(_)).mkString.substring(0, 2), 16)
      // reconstruct the noise from the same quantile-table lookup: the
      // release must be EXACTLY count + table[idx]
      // exactness claim is on the RELEASE (count + table[idx] is one
      // IEEE addition) — recovering the noise by subtraction would
      // reintroduce rounding
      assert(noisy === trueCounts(grp).toDouble
        + graft.operators.DataChecks.laplace256(idx),
        s"$grp release must be exactly count + table[$idx]")
      // determinism: running the entry again yields the identical draw
      val again = graft.operators.DataChecks.catalog
        .find(_.name == "dq2_dp_release").get.run(spark, sf0001)
        .collect().find(_.getString(0) == grp).get.getDouble(2)
      assert(again === noisy)
      assert(idx >= 0 && idx < 256)
    }
  }
}
