package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Quantitative time-series analytics over the order/lineitem history
  * (r5): OHLC candle bars, peak-to-trough drawdown, RSI momentum, and
  * Bollinger-band breach counting — the classic "price chart" toolkit
  * re-expressed as exact-integer Spark aggregates. The earlier catalogs
  * cover forecasting (Holt/Holt-Winters), decomposition and SPC charts;
  * these four are the market-data readouts none of them produce.
  *
  * Float discipline per SURVEY.md §5: all prices enter as exact cents
  * (one per-row round), every derived statistic is integer algebra —
  * ratios via floor DIV on non-negative operands, the Bollinger ±2σ
  * test as a cross-multiplied variance identity so NO sqrt is ever
  * taken. decimal(38,0)/HUGEINT on the squared terms (cents² passes
  * 2^63 at lake scale).
  *
  * Scale shape shared by all four: ONE pass over the fact aggregates to
  * a calendar spine (days/months — bounded by the date domain, never by
  * fact size), and every window/self-join after that runs on the spine.
  * The global-ordered windows here are the documented-bounded PlanLint
  * class (calendar spine ≤ a few thousand rows at ANY corpus size).
  *
  * Reference intent: dias-hbp-sp8/Distributed-Query-Engine exposes
  * declarative SQL over warehouse sources (DistributedQueryEngine.diff,
  * RDBMSPushdown hunk); these are standard analyst window queries over
  * that same relational surface.
  */
object Quant {

  val catalog: Seq[Q] = Seq(
    // R161 — monthly OHLC bars. open/close are min_by/max_by under a
    // SINGLE-COLUMN total order (epoch-day·10^12 + orderkey — unique, so
    // the pick is deterministic on both engines without struct-compare
    // semantics). The composed key is DECIMAL(38,0)/HUGEINT, not BIGINT:
    // at the 100 TB scale this repo targets, orderkeys exceed 10^10 and a
    // 64-bit key would interleave day boundaries (identically on both
    // engines, so the oracle could not catch it) — the 128-bit key keeps
    // the order correct for any orderkey < 10^12. One fact aggregate
    // straight to month cells: no window, no second pass, map-side
    // combinable min_by/max_by partials.
    Q(
      "q115_ohlc",
      """WITH o AS (
        |  SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS ym,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |         AS HUGEINT)*1000000000000 + o_orderkey AS skey
        |  FROM orders)
        |SELECT ym,
        |  min_by(cents, skey) AS open_c,
        |  max(cents) AS high_c,
        |  min(cents) AS low_c,
        |  max_by(cents, skey) AS close_c,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(cents) AS BIGINT) AS rev_c
        |FROM o GROUP BY ym ORDER BY ym""".stripMargin
    ) { (s, d) =>
      val o = Tables.orders(s, d).select(
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("ym"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        (datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("decimal(38,0)") * lit(1000000000000L) + col("o_orderkey"))
          .as("skey"))
      o.groupBy("ym")
        .agg(
          expr("min_by(cents, skey)").as("open_c"),
          max("cents").as("high_c"),
          min("cents").as("low_c"),
          expr("max_by(cents, skey)").as("close_c"),
          count(lit(1)).as("n_orders"),
          sum("cents").as("rev_c"))
        .orderBy("ym")
    },

    // R162 — maximum-drawdown curve of the monthly unit-price index
    // (lineitem VWAP: Σext_cents floor-DIV Σqty — quantized ONCE, so
    // the running peak and the drawdown are exact integer algebra).
    // peak = running max over the month spine; dd_permille =
    // ((peak − vwap)·1000) DIV peak on non-negative operands. One fact
    // pass to ~tens of month cells; the unbounded-preceding window runs
    // on the spine only.
    Q(
      "q116_drawdown",
      """WITH m AS (
        |  SELECT CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT) AS ym,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS ext_c,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1),
        |v AS (SELECT ym, ext_c // qty AS vwap_c FROM m),
        |p AS (SELECT ym, vwap_c,
        |        max(vwap_c) OVER (ORDER BY ym
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_c
        |      FROM v)
        |SELECT ym, vwap_c, peak_c,
        |  ((peak_c - vwap_c) * 1000) // peak_c AS dd_permille
        |FROM p ORDER BY ym""".stripMargin
    ) { (s, d) =>
      val m = Tables.lineitem(s, d)
        .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("ym"))
        .agg(
          sum(round(col("l_extendedprice") * 100).cast("long")).as("ext_c"),
          sum(round(col("l_quantity")).cast("long")).as("qty"))
      val v = m.select(col("ym"), expr("ext_c DIV qty").as("vwap_c"))
      // month-spine window: bounded by the calendar domain, not the fact
      val w = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      v.withColumn("peak_c", max("vwap_c").over(w))
        .withColumn("dd_permille", expr("((peak_c - vwap_c) * 1000) DIV peak_c"))
        .orderBy("ym")
    },

    // R163 — RSI(14) momentum oscillator (Cutler's SMA form — Wilder's
    // recursive EMA would be a fixpoint; the SMA form is the standard
    // exact-window variant) over the daily-revenue series. diff = lag
    // delta on the day spine; trailing 14-diff gain/loss sums; RSI =
    // 1000·gain DIV (gain+loss) permille, NULL on a flat window (the
    // 0/0 case — guarded identically on both engines). Rows appear only
    // once 14 diffs exist, so every window is complete by construction.
    Q(
      "q117_rsi",
      """WITH dc AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev_c
        |  FROM orders GROUP BY 1),
        |df AS (SELECT d, rev_c,
        |         rev_c - lag(rev_c) OVER (ORDER BY d) AS diff FROM dc),
        |g AS (SELECT d, rev_c,
        |        CASE WHEN diff > 0 THEN diff ELSE 0 END AS gain,
        |        CASE WHEN diff < 0 THEN -diff ELSE 0 END AS loss,
        |        diff FROM df),
        |t AS (SELECT d, rev_c,
        |        sum(gain) OVER (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS gsum,
        |        sum(loss) OVER (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS lsum,
        |        count(diff) OVER (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS nd
        |      FROM g)
        |SELECT d, rev_c,
        |  CAST(CASE WHEN gsum + lsum = 0 THEN NULL
        |       ELSE (1000 * gsum) // (gsum + lsum) END AS BIGINT) AS rsi_permille
        |FROM t WHERE nd = 14 ORDER BY d""".stripMargin
    ) { (s, d) =>
      val dc = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
      // day-spine windows: bounded by the date domain, not the fact
      val wd = Window.orderBy("d")
      val w14 = Window.orderBy("d").rowsBetween(-13, 0)
      val g = dc
        .withColumn("diff", col("rev_c") - lag("rev_c", 1).over(wd))
        .withColumn("gain", when(col("diff") > 0, col("diff")).otherwise(lit(0L)))
        .withColumn("loss", when(col("diff") < 0, -col("diff")).otherwise(lit(0L)))
      g.withColumn("gsum", sum("gain").over(w14))
        .withColumn("lsum", sum("loss").over(w14))
        .withColumn("nd", count("diff").over(w14))
        .filter(col("nd") === 14)
        .select(col("d"), col("rev_c"),
          when(col("gsum") + col("lsum") === 0, lit(null))
            .otherwise(expr("(1000 * gsum) DIV (gsum + lsum)"))
            .as("rsi_permille"))
        .orderBy("d")
    },

    // R164 — Bollinger ±2σ breach audit per month, sqrt-free: on the
    // daily-revenue spine with trailing-20 exact sums S1=Σx, S2=Σx²,
    // |x−μ| > 2σ ⇔ (20x−S1)² > 4·(20·S2−S1²) — an exact integer
    // cross-multiply of the variance identity (ev9's 2σ idea made
    // window-local and exact). Squared cents pass 2^63 at lake scale →
    // decimal(38,0)/HUGEINT on x², S1², dev². Only complete 20-day
    // windows are scored; the month rollup is spine-sized.
    Q(
      "q118_bollinger",
      """WITH dc AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |t AS (SELECT d, x,
        |        sum(x) OVER w20 AS s1,
        |        sum(CAST(x AS HUGEINT) * x) OVER w20 AS s2,
        |        count(*) OVER w20 AS n20
        |      FROM dc
        |      WINDOW w20 AS (ORDER BY d ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
        |b AS (SELECT CAST(year(d)*100 + month(d) AS BIGINT) AS ym,
        |        20*x - s1 AS dev,
        |        CAST(20*x - s1 AS HUGEINT) * (20*x - s1) AS lhs,
        |        4 * (20 * s2 - CAST(s1 AS HUGEINT) * s1) AS rhs
        |      FROM t WHERE n20 = 20)
        |SELECT ym,
        |  CAST(count(*) AS BIGINT) AS days_eval,
        |  CAST(sum(CASE WHEN dev > 0 AND lhs > rhs THEN 1 ELSE 0 END) AS BIGINT) AS breach_up,
        |  CAST(sum(CASE WHEN dev < 0 AND lhs > rhs THEN 1 ELSE 0 END) AS BIGINT) AS breach_dn
        |FROM b GROUP BY ym ORDER BY ym""".stripMargin
    ) { (s, d) =>
      val dc = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      // day-spine window: bounded by the date domain, not the fact
      val w20 = Window.orderBy("d").rowsBetween(-19, 0)
      val t = dc
        .withColumn("s1", sum("x").over(w20))
        .withColumn("s2", sum(expr("CAST(x AS DECIMAL(38,0)) * x")).over(w20))
        .withColumn("n20", count(lit(1)).over(w20))
        .filter(col("n20") === 20)
      val b = t.select(
        (year(col("d")) * 100 + month(col("d"))).cast("long").as("ym"),
        expr("20*x - s1").as("dev"),
        expr("CAST(20*x - s1 AS DECIMAL(38,0)) * (20*x - s1)").as("lhs"),
        expr("4 * (20 * s2 - CAST(s1 AS DECIMAL(38,0)) * s1)").as("rhs"))
      b.groupBy("ym")
        .agg(
          count(lit(1)).as("days_eval"),
          sum(when(col("dev") > 0 && col("lhs") > col("rhs"), 1L).otherwise(0L)).as("breach_up"),
          sum(when(col("dev") < 0 && col("lhs") > col("rhs"), 1L).otherwise(0L)).as("breach_dn"))
        .orderBy("ym")
    },

    // R222 — overnight gap analysis (q115's candles, one derivative
    // further): gap = today's OPEN minus yesterday's CLOSE on the
    // daily bar series — the discontinuity a close-to-close return
    // hides. Opens/closes are q115's min_by/max_by picks under the
    // unique intraday total order; the gap is one lag on the day
    // spine; extremes localized with min_by/max_by again (exact,
    // deterministic). One fact aggregate + spine windows; one-row
    // summary out.
    Q(
      "q136_gap_updown",
      """WITH o AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |         AS HUGEINT)*1000000000000 + o_orderkey AS skey
        |  FROM orders),
        |bar AS (SELECT d, min_by(cents, skey) AS open_c, max_by(cents, skey) AS close_c
        |        FROM o GROUP BY d),
        |g AS (SELECT d,
        |        CAST(date_diff('day', DATE '1970-01-01', d) AS BIGINT) AS ed,
        |        open_c - lag(close_c) OVER (ORDER BY d) AS gap
        |      FROM bar),
        |e AS (SELECT d, gap, gap * 100000 + ed AS tkey
        |      FROM g WHERE gap IS NOT NULL)
        |SELECT CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(CASE WHEN gap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_up,
        |  CAST(sum(CASE WHEN gap < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_dn,
        |  CAST(max(gap) AS BIGINT) AS max_gap_c,
        |  max_by(d, tkey) AS max_gap_day,
        |  CAST(min(gap) AS BIGINT) AS min_gap_c
        |FROM e""".stripMargin
    ) { (s, d) =>
      val o = Tables.orders(s, d).select(
        to_date(col("o_orderdate")).as("d"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        (datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("decimal(38,0)") * lit(1000000000000L) + col("o_orderkey"))
          .as("skey"))
      val bar = o.groupBy("d")
        .agg(expr("min_by(cents, skey)").as("open_c"),
          expr("max_by(cents, skey)").as("close_c"))
      // day-spine window: bounded by the date domain, not the fact;
      // tkey = gap·10⁵ + epoch_day makes the argmax pick deterministic
      // under gap ties on both engines
      val g = bar
        .withColumn("ed",
          datediff(col("d"), to_date(lit("1970-01-01"))).cast("long"))
        .withColumn("gap",
          col("open_c") - lag("close_c", 1).over(Window.orderBy("d")))
        .filter(col("gap").isNotNull)
        .withColumn("tkey", col("gap") * 100000L + col("ed"))
      g.agg(count(lit(1)).as("n_days"),
        sum(when(col("gap") > 0, 1L).otherwise(0L)).as("n_gap_up"),
        sum(when(col("gap") < 0, 1L).otherwise(0L)).as("n_gap_dn"),
        max("gap").as("max_gap_c"),
        expr("max_by(d, tkey)").as("max_gap_day"),
        min("gap").as("min_gap_c"))
    },

    // R244 — I-MR (individuals & moving-range) control chart, the
    // third SPC chart beside q122's p-chart (proportions) and ev52's
    // EWMA (smoothed means): limits x̄ ± 2.66·M̄R from the mean moving
    // range, the chart for single observations per period. Entirely
    // integer: the breach test |x·n − S|·m·1000 > 2660·n·ΣMR
    // cross-multiplies the 2.66 constant away (products in
    // decimal/HUGEINT); MR from one lag on the day spine; monthly
    // breach rollup spine-sized.
    Q(
      "q141_xmr_chart",
      """WITH dc AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |mr AS (SELECT d, x,
        |         abs(x - lag(x) OVER (ORDER BY d)) AS mr FROM dc),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s,
        |        CAST(count(mr) AS BIGINT) AS m, CAST(sum(mr) AS BIGINT) AS smr
        |      FROM mr),
        |b AS (SELECT CAST(year(d)*100 + month(d) AS BIGINT) AS ym,
        |        CASE WHEN CAST(abs(x * g.n - g.s) AS HUGEINT) * g.m * 1000
        |                  > 2660 * CAST(g.n AS HUGEINT) * g.smr
        |             THEN 1 ELSE 0 END AS breach
        |      FROM mr, g)
        |SELECT ym, CAST(count(*) AS BIGINT) AS n_days,
        |  CAST(sum(breach) AS BIGINT) AS n_breach
        |FROM b GROUP BY ym ORDER BY ym""".stripMargin
    ) { (s, d) =>
      val dc = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
      // day-spine window: bounded by the date domain, not the fact
      val mr = dc.withColumn("mr",
        abs(col("x") - lag("x", 1).over(Window.orderBy("d"))))
        .localCheckpoint(true) // limits frame + breach pass read it
      val g = mr.agg(count(lit(1)).as("n"), sum("x").as("s"),
        count("mr").as("m"), sum("mr").as("smr"))
      mr.crossJoin(broadcast(g))
        .select((year(col("d")) * 100 + month(col("d"))).cast("long").as("ym"),
          when(expr("""CAST(abs(x * n - s) AS DECIMAL(38,0)) * m * 1000
            | > 2660 * CAST(n AS DECIMAL(38,0)) * smr""".stripMargin), 1L)
            .otherwise(0L).as("breach"))
        .groupBy("ym")
        .agg(count(lit(1)).as("n_days"), sum("breach").as("n_breach"))
        .orderBy("ym")
    },

    // R182 — p-chart (SPC for PROPORTIONS, beside ev52's EWMA on
    // means): monthly return RATE vs 3σ binomial limits around the
    // grand rate, sqrt-free — (r/n − R/N)² > 9·(R/N)(1−R/N)/n cross-
    // multiplied by (nN)² into the exact integer test
    // (r·N − R·n)² > 9·R·(N−R)·n. Products pass 2⁶³ at lake scale →
    // decimal(38,0)/HUGEINT. One fact pass to month cells; the grand
    // totals broadcast from a 1-row frame.
    Q(
      "q122_pchart",
      """WITH m AS (
        |  SELECT CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT) AS ym,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
        |  FROM lineitem GROUP BY 1),
        |g AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(r) AS BIGINT) AS rr FROM m)
        |SELECT ym, n, r,
        |  (r * 1000) // n AS rate_permille,
        |  (rr * 1000) // nn AS grand_permille,
        |  CASE WHEN r * nn > rr * n THEN 1 WHEN r * nn < rr * n THEN -1 ELSE 0 END AS dev_sign,
        |  CASE WHEN CAST(r * nn - rr * n AS HUGEINT) * (r * nn - rr * n)
        |            > 9 * CAST(rr AS HUGEINT) * (nn - rr) * n
        |       THEN 1 ELSE 0 END AS breach
        |FROM m, g ORDER BY ym""".stripMargin
    ) { (s, d) =>
      val m = Tables.lineitem(s, d)
        .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("ym"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      val g = m.agg(sum("n").as("nn"), sum("r").as("rr"))
      m.crossJoin(broadcast(g))
        .select(col("ym"), col("n"), col("r"),
          expr("(r * 1000) DIV n").as("rate_permille"),
          expr("(rr * 1000) DIV nn").as("grand_permille"),
          when(col("r") * col("nn") > col("rr") * col("n"), 1L)
            .when(col("r") * col("nn") < col("rr") * col("n"), -1L)
            .otherwise(0L).as("dev_sign"),
          when(expr("""CAST(r * nn - rr * n AS DECIMAL(38,0)) * (r * nn - rr * n)
            | > 9 * CAST(rr AS DECIMAL(38,0)) * (nn - rr) * n""".stripMargin), 1L)
            .otherwise(0L).as("breach"))
        .orderBy("ym")
    },

    // R250 — Ulcer index + Martin (pain) ratio on the monthly vwap
    // series: q116 plots the drawdown curve; the Ulcer index is its
    // RMS (Peter Martin's replacement for σ — penalizes DEPTH and
    // DURATION of drawdowns, ignores upside wobble), and the Martin
    // ratio divides the period return by it. Every dd_permille is
    // q116's exact integer ((peak−v)·1000 DIV peak); Σdd², max dd, and
    // the endpoint return are integer algebra (endpoints picked by
    // min_by/max_by under the unique ym key — portable per q115), so
    // the only doubles are the final sqrt and one division. The month
    // spine is calendar-bounded; the fact is touched once.
    Q(
      "q146_ulcer",
      """WITH m AS (
        |  SELECT CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT) AS ym,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS ext_c,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1),
        |v AS (SELECT ym, ext_c // qty AS vwap_c FROM m),
        |p AS (SELECT ym, vwap_c,
        |        max(vwap_c) OVER (ORDER BY ym
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak_c
        |      FROM v),
        |dd AS (SELECT ym, ((peak_c - vwap_c) * 1000) // peak_c AS dd_pm FROM p),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_months,
        |    CAST(max(dd_pm) AS BIGINT) AS max_dd_pm,
        |    CAST(sum(dd_pm * dd_pm) AS BIGINT) AS ss
        |  FROM dd),
        |ret AS (SELECT CAST(min_by(vwap_c, ym) AS BIGINT) AS first_c,
        |    CAST(max_by(vwap_c, ym) AS BIGINT) AS last_c
        |  FROM v)
        |SELECT n_months, max_dd_pm,
        |  sqrt(CAST(ss AS DOUBLE) / CAST(n_months AS DOUBLE)) AS ulcer_pm,
        |  ((last_c - first_c) * 1000) // first_c AS ret_pm,
        |  CASE WHEN ss = 0 THEN NULL
        |       ELSE CAST(((last_c - first_c) * 1000) // first_c AS DOUBLE)
        |            / sqrt(CAST(ss AS DOUBLE) / CAST(n_months AS DOUBLE)) END
        |    AS martin_ratio
        |FROM agg CROSS JOIN ret""".stripMargin
    ) { (s, d) =>
      val m = Tables.lineitem(s, d)
        .groupBy((year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
          .cast("long").as("ym"))
        .agg(
          sum(round(col("l_extendedprice") * 100).cast("long")).as("ext_c"),
          sum(round(col("l_quantity")).cast("long")).as("qty"))
      val v = m.select(col("ym"), expr("ext_c DIV qty").as("vwap_c"))
        .localCheckpoint(true) // drawdown pass + endpoint pick both read it
      val w = Window.orderBy("ym")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dd = v.withColumn("peak_c", max("vwap_c").over(w))
        .select(expr("((peak_c - vwap_c) * 1000) DIV peak_c").as("dd_pm"))
      val agg = dd.agg(count(lit(1)).as("n_months"), max("dd_pm").as("max_dd_pm"),
        sum(col("dd_pm") * col("dd_pm")).as("ss"))
      val ret = v.agg(min_by(col("vwap_c"), col("ym")).as("first_c"),
        max_by(col("vwap_c"), col("ym")).as("last_c"))
      agg.crossJoin(ret)
        .select(col("n_months"), col("max_dd_pm"),
          sqrt(col("ss").cast("double") / col("n_months").cast("double"))
            .as("ulcer_pm"),
          expr("((last_c - first_c) * 1000) DIV first_c").as("ret_pm"),
          when(col("ss") === 0, lit(null))
            .otherwise(expr("((last_c - first_c) * 1000) DIV first_c")
              .cast("double")
              / sqrt(col("ss").cast("double") / col("n_months").cast("double")))
            .as("martin_ratio"))
    }
  )
}
