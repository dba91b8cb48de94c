package graft

import org.apache.spark.sql.functions._

/** Pins the product-analytics identities behind ev38/ev39/ev41/geo6 —
  * the algebra that makes the curves mean what analysts assume.
  */
class GrowthSpec extends SparkSpecBase {

  private def weekly() = Tables.events(spark, sf0001)
    .select(date_trunc("week", col("ts")).as("w"), col("user_id")).distinct()

  test("ev39: new + retained + resurrected equals that week's actives") {
    val ga = SparkEntry.queries("ev39_growth_accounting")(spark, sf0001)
      .collect().map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val actives = weekly().groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    actives.foreach { case (w, n) =>
      val (nw, rt, rs, _) = ga(w)
      assert(nw + rt + rs == n, s"$w: $nw+$rt+$rs != $n")
    }
  }

  test("ev39: churned(w) equals actives(w-1) minus retained(w)") {
    val ga = SparkEntry.queries("ev39_growth_accounting")(spark, sf0001)
      .collect().map(r => r.getTimestamp(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val actives = weekly().groupBy("w").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val weeks = actives.keys.toSeq.sortBy(_.getTime)
    weeks.sliding(2).foreach {
      case Seq(prev, cur) if cur.getTime - prev.getTime == 7L * 86400 * 1000 =>
        val (_, rt, _, ch) = ga(cur)
        assert(ch == actives(prev) - rt,
          s"$cur: churned $ch != ${actives(prev)} - $rt")
      case _ => ()
    }
  }

  test("ev38: each WAU point equals a brute-force trailing-7-day distinct") {
    val wau = SparkEntry.queries("ev38_rolling_wau")(spark, sf0001)
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val act = Tables.events(spark, sf0001)
      .select(date_trunc("day", col("ts")).cast("date").as("dy"), col("user_id"))
      .distinct().collect().map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
    val days = act.map(_._1).distinct
    days.foreach { d =>
      val expect = act.filter { case (ad, _) =>
        !ad.isAfter(d) && ad.isAfter(d.minusDays(7)) }.map(_._2).distinct.length
      assert(wau(d.toString) == expect.toLong, s"$d: ${wau(d.toString)} vs $expect")
    }
  }

  test("q100: closed-form business-day count equals a weekday walk") {
    import java.time.{DayOfWeek, LocalDate}
    val anchor = LocalDate.of(1969, 12, 29) // a Monday
    def closedForm(d: LocalDate): Long = {
      val n = java.time.temporal.ChronoUnit.DAYS.between(anchor, d)
      (n / 7) * 5 + math.min(n % 7, 5)
    }
    def walk(d: LocalDate): Long =
      Iterator.iterate(anchor)(_.plusDays(1)).takeWhile(_.isBefore(d)).count(x =>
        x.getDayOfWeek != DayOfWeek.SATURDAY && x.getDayOfWeek != DayOfWeek.SUNDAY)
    // every weekday phase plus a leap boundary
    val samples = (0 until 21).map(LocalDate.of(1995, 2, 20).plusDays(_)) ++
      Seq(LocalDate.of(2000, 2, 28), LocalDate.of(2000, 3, 1), LocalDate.of(1970, 1, 1))
    samples.foreach(d => assert(closedForm(d) == walk(d), d.toString))
  }

  test("geo6: hop count is events-per-user minus one") {
    val tr = SparkEntry.queries("geo6_trajectory")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = Tables.events(spark, sf0001).groupBy("user_id")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    n.foreach { case (u, c) => assert(tr(u) == c - 1, s"user $u") }
  }
}
