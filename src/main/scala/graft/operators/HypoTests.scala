package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Nonparametric two-sample hypothesis tests (SURVEY.md §2 T33/T34) —
  * the A/B-readout shapes an events warehouse runs constantly: "did the
  * `value` distribution of treatment differ from control", answered
  * without normality assumptions.
  *
  * Both tests reduce the fact table to DISTINCT VALUE CELLS first
  * (`round(value*100)` cent cells, one aggregate shuffle), then run the
  * rank/ECDF algebra on the cell frame — |cells| is bounded by the
  * value domain, not the event count, so the window pass costs the same
  * at 100 TB as at sf0.01 once the aggregate is done. Rank sums, U
  * statistics, tie corrections, and ECDF gaps are EXACT integers
  * (doubled where halves appear, q88's no-halving identity); the only
  * floats are the single final double trees (AUC, z, D), evaluated
  * identically on both engines per the q60/q88 precedent.
  *
  * Reference intent: dias-hbp-sp8/Distributed-Query-Engine exposes
  * aggregate pushdown for analytic SQL; these are the canonical
  * beyond-TPC-H statistical readouts over the same surface.
  */
object HypoTests {

  /** Cell frame shared by both tests: for each comparison group
    * (`click`, `view`) a full union with the `purchase` side's cells —
    * (grp, v, ca, cb) with ca = purchase count at cent-value v, cb =
    * that group's count at v. Built as tagged UNION ALL + re-aggregate
    * (never a per-group FULL OUTER JOIN — same result, one shuffle). */
  private def cells(s: org.apache.spark.sql.SparkSession, d: String) = {
    val q = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "click", "view"))
      .select(col("event_type"), round(col("value") * 100).cast("long").as("v"))
    val a = q.filter(col("event_type") === "purchase")
      .groupBy("v").agg(count(lit(1)).as("ca"))
    val b = q.filter(col("event_type") =!= "purchase")
      .groupBy(col("event_type").as("grp"), col("v"))
      .agg(count(lit(1)).as("cb"))
    val grps = b.select("grp").distinct()
    a.crossJoin(broadcast(grps))
      .select(col("grp"), col("v"), col("ca"), lit(0L).as("cb"))
      .unionByName(b.select(col("grp"), col("v"), lit(0L).as("ca"), col("cb")))
      .groupBy("grp", "v")
      .agg(sum("ca").as("ca"), sum("cb").as("cb"))
  }

  private val cellsSql =
    """WITH q AS (SELECT event_type,
      |    CAST(round(value * 100) AS BIGINT) AS v
      |  FROM events WHERE event_type IN ('purchase', 'click', 'view')),
      |a AS (SELECT v, CAST(count(*) AS BIGINT) AS ca FROM q
      |      WHERE event_type = 'purchase' GROUP BY 1),
      |b AS (SELECT event_type AS grp, v, CAST(count(*) AS BIGINT) AS cb
      |      FROM q WHERE event_type <> 'purchase' GROUP BY 1, 2),
      |u AS (SELECT grp, v, ca, CAST(0 AS BIGINT) AS cb
      |      FROM a CROSS JOIN (SELECT DISTINCT grp FROM b) g
      |      UNION ALL
      |      SELECT grp, v, CAST(0 AS BIGINT) AS ca, cb FROM b),
      |cells AS (SELECT grp, v, CAST(sum(ca) AS BIGINT) AS ca,
      |            CAST(sum(cb) AS BIGINT) AS cb
      |          FROM u GROUP BY 1, 2)""".stripMargin

  val catalog: Seq[Q] = Seq(
    // T33 — Mann-Whitney U (Wilcoxon rank-sum): purchase `value` vs each
    // comparison group. DOUBLED U keeps halves integral:
    //   2·U_A = 2·Σ_v ca(v)·cumB(<v) + Σ_v ca(v)·cb(v).
    // The tie term Σ(t³−t) rides decimal(38,0) (DuckDB HUGEINT) per the
    // q73/q88 wide-product precedent and — like q88's marginals — feeds
    // only the final double tree, never the output schema. AUC =
    // U/(n1·n2) and the tie-corrected normal z are the two double trees.
    Q(
      "ev26_mannwhitney",
      s"""$cellsSql,
        |win AS (SELECT grp, ca, cb,
        |    coalesce(sum(cb) OVER (PARTITION BY grp ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
        |  FROM cells),
        |agg AS (SELECT grp, CAST(sum(ca) AS BIGINT) AS n1,
        |    CAST(sum(cb) AS BIGINT) AS n2,
        |    CAST(sum(CAST(ca AS HUGEINT) * (2 * cumb + cb)) AS BIGINT) AS u2,
        |    CAST(sum(CAST(ca + cb AS HUGEINT) * (ca + cb) * (ca + cb)
        |             - (ca + cb)) AS HUGEINT) AS tsum
        |  FROM win GROUP BY 1)
        |SELECT grp, n1, n2, u2,
        |  -- tsum stays internal: HUGEINT/decimal never hits the schema
        |  CAST(u2 AS DOUBLE) / (2 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS auc,
        |  CAST(u2 - n1 * n2 AS DOUBLE)
        |    / (2 * sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12)
        |        * ((CAST(n1 + n2 AS DOUBLE) + 1)
        |           - CAST(tsum AS DOUBLE)
        |             / (CAST(n1 + n2 AS DOUBLE) * (CAST(n1 + n2 AS DOUBLE) - 1))))) AS z
        |FROM agg ORDER BY grp""".stripMargin
    ) { (s, d) =>
      val w = Window.partitionBy("grp").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
      val t = col("ca").cast("decimal(38,0)") + col("cb").cast("decimal(38,0)")
      val agg = cells(s, d)
        .withColumn("cumb", coalesce(sum("cb").over(w), lit(0L)))
        .groupBy("grp")
        .agg(sum("ca").as("n1"), sum("cb").as("n2"),
          sum(col("ca").cast("decimal(38,0)")
            * (lit(2) * col("cumb") + col("cb"))).cast("long").as("u2"),
          sum(t * t * t - t).as("tsum"))
      val n1d = col("n1").cast("double"); val n2d = col("n2").cast("double")
      val nd = (col("n1") + col("n2")).cast("double")
      agg.select(col("grp"), col("n1"), col("n2"), col("u2"),
        (col("u2").cast("double") / (lit(2) * n1d * n2d)).as("auc"),
        ((col("u2") - col("n1") * col("n2")).cast("double")
          / (lit(2) * sqrt((n1d * n2d / 12)
            * ((nd + 1) - col("tsum").cast("double") / (nd * (nd - 1)))))).as("z"))
        .orderBy("grp")
    },

    // T34 — two-sample Kolmogorov-Smirnov: D = max_v |F_A(v) − F_B(v)|,
    // held as the EXACT integer max |cumA·n2 − cumB·n1| (cross-scaled
    // ECDF numerators — no per-cell division, so the argmax can't be
    // perturbed by float rounding); D itself is the one final division.
    // Totals enter the window frame as group-level window sums — the
    // cell frame is touched once.
    Q(
      "ev27_ks_test",
      s"""$cellsSql,
        |win AS (SELECT grp,
        |    sum(ca) OVER (PARTITION BY grp ORDER BY v) AS cuma,
        |    sum(cb) OVER (PARTITION BY grp ORDER BY v) AS cumb,
        |    sum(ca) OVER (PARTITION BY grp) AS n1,
        |    sum(cb) OVER (PARTITION BY grp) AS n2
        |  FROM cells)
        |SELECT grp, CAST(max(n1) AS BIGINT) AS n1, CAST(max(n2) AS BIGINT) AS n2,
        |  CAST(max(abs(CAST(cuma AS HUGEINT) * n2 - CAST(cumb AS HUGEINT) * n1))
        |    AS BIGINT) AS d_num,
        |  CAST(max(abs(CAST(cuma AS HUGEINT) * n2 - CAST(cumb AS HUGEINT) * n1))
        |    AS DOUBLE)
        |    / (CAST(max(n1) AS DOUBLE) * CAST(max(n2) AS DOUBLE)) AS d
        |FROM win GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val ord = Window.partitionBy("grp").orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val all = Window.partitionBy("grp")
      // decimal cross-products: cum·n overflows long at lake-scale counts
      val gap = abs(col("cuma").cast("decimal(38,0)") * col("n2")
        - col("cumb").cast("decimal(38,0)") * col("n1"))
      cells(s, d)
        .select(col("grp"),
          sum("ca").over(ord).as("cuma"), sum("cb").over(ord).as("cumb"),
          sum("ca").over(all).as("n1"), sum("cb").over(all).as("n2"))
        .groupBy("grp")
        .agg(max("n1").as("n1"), max("n2").as("n2"),
          max(gap).cast("long").as("d_num"),
          (max(gap).cast("double")
            / (max("n1").cast("double") * max("n2").cast("double"))).as("d"))
        .orderBy("grp")
    },

    // T36 — Welch's unequal-variance t-test: the parametric sibling of
    // ev26/ev27 over the same cell frame. All five moments per side are
    // EXACT (counts, Σc·v as long, Σc·v² through decimal(38,0)/HUGEINT —
    // a long overflows at lake-scale event counts); means, variances, t
    // and the Welch–Satterthwaite df are ONE fixed double tree evaluated
    // with the identical association order on both engines (squares as
    // explicit x·x, never pow — IEEE divide/sqrt/multiply are correctly
    // rounded, pow is not). Shuffle shape: everything runs on the
    // bounded cell aggregate.
    Q(
      "ev28_welch_t",
      s"""$cellsSql,
        |m AS (SELECT grp,
        |    CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb,
        |    CAST(sum(ca * v) AS BIGINT) AS sa, CAST(sum(cb * v) AS BIGINT) AS sb,
        |    sum(CAST(ca AS HUGEINT) * v * v) AS ssa,
        |    sum(CAST(cb AS HUGEINT) * v * v) AS ssb
        |  FROM cells GROUP BY 1),
        |dbl AS (SELECT grp, na, nb,
        |    CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
        |    CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
        |    (CAST(ssa AS DOUBLE)
        |       - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE) / CAST(na AS DOUBLE))
        |      / (CAST(na AS DOUBLE) - 1) AS va,
        |    (CAST(ssb AS DOUBLE)
        |       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE))
        |      / (CAST(nb AS DOUBLE) - 1) AS vb
        |  FROM m),
        |se AS (SELECT grp, na, nb, ma, mb,
        |    va / CAST(na AS DOUBLE) AS s2a, vb / CAST(nb AS DOUBLE) AS s2b
        |  FROM dbl)
        |SELECT grp, na AS n1, nb AS n2, ma AS mean1, mb AS mean2,
        |  (ma - mb) / sqrt(s2a + s2b) AS t,
        |  ((s2a + s2b) * (s2a + s2b))
        |    / (s2a * s2a / (CAST(na AS DOUBLE) - 1)
        |       + s2b * s2b / (CAST(nb AS DOUBLE) - 1)) AS df
        |FROM se ORDER BY grp""".stripMargin
    ) { (s, d) =>
      val m = cells(s, d).groupBy("grp")
        .agg(sum("ca").as("na"), sum("cb").as("nb"),
          sum(col("ca") * col("v")).as("sa"),
          sum(col("cb") * col("v")).as("sb"),
          sum(col("ca").cast("decimal(38,0)") * col("v") * col("v")).as("ssa"),
          sum(col("cb").cast("decimal(38,0)") * col("v") * col("v")).as("ssb"))
      val naD = col("na").cast("double"); val nbD = col("nb").cast("double")
      val dbl = m.select(col("grp"), col("na"), col("nb"),
        (col("sa").cast("double") / naD).as("ma"),
        (col("sb").cast("double") / nbD).as("mb"),
        ((col("ssa").cast("double")
          - col("sa").cast("double") * col("sa").cast("double") / naD)
          / (naD - 1)).as("va"),
        ((col("ssb").cast("double")
          - col("sb").cast("double") * col("sb").cast("double") / nbD)
          / (nbD - 1)).as("vb"))
      val se = dbl.select(col("grp"), col("na"), col("nb"), col("ma"), col("mb"),
        (col("va") / col("na").cast("double")).as("s2a"),
        (col("vb") / col("nb").cast("double")).as("s2b"))
      se.select(col("grp"), col("na").as("n1"), col("nb").as("n2"),
          col("ma").as("mean1"), col("mb").as("mean2"),
          ((col("ma") - col("mb")) / sqrt(col("s2a") + col("s2b"))).as("t"),
          (((col("s2a") + col("s2b")) * (col("s2a") + col("s2b")))
            / (col("s2a") * col("s2a") / (col("na").cast("double") - 1)
              + col("s2b") * col("s2b") / (col("nb").cast("double") - 1)))
            .as("df"))
        .orderBy("grp")
    },

    // T37 — two-proportion z-test on conversion (the funnel-rate
    // significance readout beside T36's value test): users split into
    // deterministic pseudo-arms by user_id parity, converted = had ≥1
    // BIG-TICKET purchase (value > 150 — every synthetic user has SOME
    // purchase, so plain any-purchase is degenerate p=1 with pooled
    // variance 0). Counts are exact (one user-key aggregate, then a
    // 4-long 1-row frame); rates and the pooled z are ONE fixed double
    // tree over the exact counts — the same discipline as ev28.
    // Degenerate pools (all or none converted) yield z = 0 by explicit
    // CASE on the INTEGER counts: ANSI Spark throws on the 0/0 where
    // DuckDB emits NaN, so the guard is part of the portable contract.
    Q(
      "ev29_prop_ztest",
      """WITH u AS (
        |  SELECT user_id, user_id % 2 AS arm,
        |    max(CASE WHEN event_type = 'purchase' AND value > 150
        |        THEN 1 ELSE 0 END) AS conv
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x1,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(sum(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x2
        |  FROM u),
        |r AS (SELECT n1, x1, n2, x2,
        |    CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |    CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
        |    CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) AS p
        |  FROM m)
        |SELECT n1, x1, n2, x2, p1, p2,
        |  CASE WHEN x1 + x2 = 0 OR x1 + x2 = n1 + n2 THEN CAST(0 AS DOUBLE)
        |       ELSE (p1 - p2) / sqrt(p * (1 - p)
        |         * (1 / CAST(n1 AS DOUBLE) + 1 / CAST(n2 AS DOUBLE))) END AS z
        |FROM r""".stripMargin
    ) { (s, d) =>
      val u = graft.Tables.events(s, d)
        .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
        .agg(max(when(col("event_type") === "purchase" && col("value") > 150,
          1L).otherwise(0L)).as("conv"))
      val m = u.agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("x1"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n2"),
        sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("x2"))
      val r = m.select(col("n1"), col("x1"), col("n2"), col("x2"),
        (col("x1").cast("double") / col("n1").cast("double")).as("p1"),
        (col("x2").cast("double") / col("n2").cast("double")).as("p2"),
        ((col("x1") + col("x2")).cast("double")
          / (col("n1") + col("n2")).cast("double")).as("p"))
      r.select(col("n1"), col("x1"), col("n2"), col("x2"), col("p1"), col("p2"),
        when(col("x1") + col("x2") === 0
            || col("x1") + col("x2") === col("n1") + col("n2"), lit(0.0))
          .otherwise((col("p1") - col("p2")) / sqrt(col("p") * (lit(1) - col("p"))
            * (lit(1) / col("n1").cast("double")
              + lit(1) / col("n2").cast("double")))).as("z"))
    },

    // T39 — CUPED variance reduction (the experimentation-platform
    // staple): per-user PRE-period purchase cents X (first half of the
    // stream's time range, integer-seconds midpoint both engines) and
    // POST-period cents Y; θ = cov(X,Y)/var(X) from EXACT pooled
    // moments (Σx, Σy, Σxy, Σx² — products decimal/HUGEINT), adjusted
    // arm mean = ȳ_arm − θ·(x̄_arm − x̄_all). The split instant is in
    // integer MICROseconds on both engines. Two fixed-width shuffles
    // (user cell aggregate, then arm aggregate + a broadcast 1-row
    // pooled-moment frame); every reported float is the same fixed
    // double tree on both engines.
    Q(
      "ev31_cuped",
      """WITH rng AS (
        |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
        |  FROM events),
        |u AS (
        |  SELECT user_id, user_id % 2 AS arm,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |          AND epoch_us(ts) < mid
        |        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN event_type = 'purchase'
        |          AND epoch_us(ts) >= mid
        |        THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS y
        |  FROM events, rng GROUP BY 1, 2),
        |mo AS (
        |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    sum(CAST(x AS HUGEINT) * y) AS sxy,
        |    sum(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM u),
        |th AS (
        |  SELECT n, sx,
        |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
        |       / CAST(n AS DOUBLE))
        |    / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
        |       / CAST(n AS DOUBLE)) AS theta
        |  FROM mo),
        |arm AS (
        |  SELECT arm, count(*) AS n_arm, CAST(sum(x) AS BIGINT) AS sx_arm,
        |    CAST(sum(y) AS BIGINT) AS sy_arm
        |  FROM u GROUP BY 1)
        |SELECT arm, n_arm, theta,
        |  CAST(sy_arm AS DOUBLE) / CAST(n_arm AS DOUBLE) AS mean_y,
        |  CAST(sy_arm AS DOUBLE) / CAST(n_arm AS DOUBLE)
        |    - theta * (CAST(sx_arm AS DOUBLE) / CAST(n_arm AS DOUBLE)
        |               - CAST(th.sx AS DOUBLE) / CAST(th.n AS DOUBLE)) AS adj_mean_y
        |FROM arm, th ORDER BY arm""".stripMargin
    ) { (s, d) =>
      val ev = graft.Tables.events(s, d)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"),
          round(col("value") * 100).cast("long").as("cents"))
      val rng = ev.agg(
        ((min("us") + max("us")).cast("long")).as("midsum"))
        .select(expr("midsum DIV 2").as("mid"))
      val u = ev.crossJoin(broadcast(rng))
        .groupBy(col("user_id"), (col("user_id") % 2).as("arm"))
        .agg(
          sum(when(col("event_type") === "purchase" && col("us") < col("mid"),
            col("cents")).otherwise(0L)).as("x"),
          sum(when(col("event_type") === "purchase" && col("us") >= col("mid"),
            col("cents")).otherwise(0L)).as("y"))
        .localCheckpoint(true) // consumed by pooled moments AND arm cells
      val mo = u.agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
      val nD = col("n").cast("double")
      val th = mo.select(col("n"), col("sx"),
        ((col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double") / nD)
          / (col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double") / nD))
          .as("theta"))
      val arm = u.groupBy("arm").agg(count(lit(1)).as("n_arm"),
        sum("x").as("sx_arm"), sum("y").as("sy_arm"))
      arm.crossJoin(broadcast(th))
        .select(col("arm"), col("n_arm"), col("theta"),
          (col("sy_arm").cast("double") / col("n_arm").cast("double"))
            .as("mean_y"),
          (col("sy_arm").cast("double") / col("n_arm").cast("double")
            - col("theta") * (col("sx_arm").cast("double")
              / col("n_arm").cast("double")
              - col("sx").cast("double") / col("n").cast("double")))
            .as("adj_mean_y"))
        .orderBy("arm")
    },

    // T41 — one-way ANOVA F (k-group mean comparison, the >2-arm
    // sibling of T36): purchase cents across ALL five event types. The
    // sums of squares are EXACT integers end to end — SSB·1e6 = Σ_g
    // (s_g²·1e6 DIV n_g) − (S²·1e6 DIV n) with the squares in
    // decimal(38,0)/HUGEINT and each per-group term an integral DIV
    // (never a float sum over groups, whose ORDER differs between
    // engines); SST from Σv² directly; F is the one final double tree.
    // One event-type aggregate, then k-row algebra.
    Q(
      "ev33_anova",
      """WITH g AS (
        |  SELECT event_type AS grp, count(*) AS n,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
        |    sum(CAST(round(value * 100) AS HUGEINT)
        |        * CAST(round(value * 100) AS BIGINT)) AS ss
        |  FROM events GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n, CAST(sum(s) AS BIGINT) AS s,
        |    CAST(sum(ss) AS HUGEINT) AS ss, count(*) AS k,
        |    CAST(sum((CAST(s AS HUGEINT) * s * 1000000) // n) AS HUGEINT) AS bterm
        |  FROM g),
        |q AS (
        |  SELECT n, k,
        |    bterm - (CAST(s AS HUGEINT) * s * 1000000) // n AS ssb_e6,
        |    ss * 1000000 - bterm AS ssw_e6
        |  FROM tot)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  CAST(ssb_e6 AS DOUBLE) / 1000000 AS ssb,
        |  CAST(ssw_e6 AS DOUBLE) / 1000000 AS ssw,
        |  (CAST(ssb_e6 AS DOUBLE) / (CAST(k AS DOUBLE) - 1))
        |    / (CAST(ssw_e6 AS DOUBLE) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)))
        |    AS f
        |FROM q""".stripMargin
    ) { (s, d) =>
      val cents = round(col("value") * 100).cast("long")
      val g = graft.Tables.events(s, d)
        .select(col("event_type").as("grp"), cents.as("v"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("v").as("s"),
          sum(col("v").cast("decimal(38,0)") * col("v")).as("ss"))
      val tot = g.agg(sum("n").as("n"), sum("s").as("s"),
        sum("ss").as("ss"), count(lit(1)).as("k"),
        sum(expr("(CAST(s AS DECIMAL(38,0)) * s * 1000000) DIV n")
          .cast("decimal(38,0)")).as("bterm"))
      val q = tot.select(col("n"), col("k"),
        (col("bterm") - expr("(CAST(s AS DECIMAL(38,0)) * s * 1000000) DIV n"))
          .as("ssb_e6"),
        (col("ss") * 1000000 - col("bterm")).as("ssw_e6"))
      q.select(col("n"), col("k").cast("long").as("k"),
        (col("ssb_e6").cast("double") / 1000000).as("ssb"),
        (col("ssw_e6").cast("double") / 1000000).as("ssw"),
        ((col("ssb_e6").cast("double") / (col("k").cast("double") - 1))
          / (col("ssw_e6").cast("double")
            / (col("n").cast("double") - col("k").cast("double")))).as("f"))
    },

    // T42 — chi-square test of INDEPENDENCE (event_type × 6-hour
    // day-part contingency table; ev24 tests one margin against
    // uniform, this tests two margins against each other). Exact all
    // the way to the statistic: per-cell term_e6 = ((o·T − r·c)² ·
    // 1e6) DIV (r·c·T) is an integral DIV of decimal products, so
    // chi²_e6 is an ORDER-INVARIANT integer sum — no float cell sum
    // whose accumulation order could differ between engines. One fact
    // aggregate to the |types|×4 cell frame; margins re-enter as
    // broadcast joins on the cell frame.
    Q(
      "ev34_chisq_indep",
      """WITH cell AS (
        |  SELECT event_type AS grp, (hour(ts) // 6) AS part, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rm AS (SELECT grp, CAST(sum(o) AS BIGINT) AS r FROM cell GROUP BY 1),
        |cm AS (SELECT part, CAST(sum(o) AS BIGINT) AS c FROM cell GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS tt FROM cell),
        |terms AS (
        |  SELECT cell.grp, cell.part,
        |    ((CAST(o AS HUGEINT) * tt - CAST(r AS HUGEINT) * c)
        |     * (CAST(o AS HUGEINT) * tt - CAST(r AS HUGEINT) * c) * 1000000)
        |    // (CAST(r AS HUGEINT) * c * tt) AS term_e6
        |  FROM cell JOIN rm ON cell.grp = rm.grp
        |    JOIN cm ON cell.part = cm.part, t)
        |SELECT CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(term_e6) AS BIGINT) AS chi2_e6,
        |  CAST(CAST(sum(term_e6) AS DOUBLE) / 1000000 AS DOUBLE) AS chi2
        |FROM terms""".stripMargin
    ) { (s, d) =>
      val cell = graft.Tables.events(s, d)
        .groupBy(col("event_type").as("grp"),
          expr("hour(ts) DIV 6").as("part"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint(true) // margins + terms all consume it
      val rm = cell.groupBy("grp").agg(sum("o").as("r"))
      val cm = cell.groupBy("part").agg(sum("o").as("c"))
      val t = cell.agg(sum("o").as("tt"))
      cell.join(broadcast(rm), Seq("grp"))
        .join(broadcast(cm), Seq("part"))
        .crossJoin(broadcast(t))
        .select(expr(
          """((CAST(o AS DECIMAL(38,0)) * tt - CAST(r AS DECIMAL(38,0)) * c)
            | * (CAST(o AS DECIMAL(38,0)) * tt - CAST(r AS DECIMAL(38,0)) * c)
            | * 1000000)
            | DIV (CAST(r AS DECIMAL(38,0)) * c * tt)""".stripMargin)
          .as("term_e6"))
        .agg(count(lit(1)).as("n_cells"), sum("term_e6").as("chi2_e6"))
        .select(col("n_cells"), col("chi2_e6").cast("long").as("chi2_e6"),
          (col("chi2_e6").cast("double") / 1000000).as("chi2"))
    },

    // T42b — Cramér's V (effect size for ev34's independence test): a
    // significant χ² on a 100 TB fact is near-guaranteed — V says whether
    // the association MATTERS. V² = χ²/(n·min(r−1, c−1)) stays exact:
    // v2_e6 = chi2_e6 DIV (n·k) on the same order-invariant integer
    // χ² sum ev34 builds (per-cell e6 DIV of decimal products), and
    // Cohen's V bands (0.1/0.3/0.5) compare as V² thresholds on the
    // shared integer (10000/90000/250000 e6-units) — no sqrt anywhere.
    Q(
      "ev95_cramers_v",
      """WITH cell AS (
        |  SELECT event_type AS grp, (hour(ts) // 6) AS part, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rm AS (SELECT grp, CAST(sum(o) AS BIGINT) AS r FROM cell GROUP BY 1),
        |cm AS (SELECT part, CAST(sum(o) AS BIGINT) AS c FROM cell GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS tt FROM cell),
        |terms AS (
        |  SELECT ((CAST(o AS HUGEINT) * tt - CAST(r AS HUGEINT) * c)
        |     * (CAST(o AS HUGEINT) * tt - CAST(r AS HUGEINT) * c) * 1000000)
        |    // (CAST(r AS HUGEINT) * c * tt) AS term_e6
        |  FROM cell JOIN rm ON cell.grp = rm.grp
        |    JOIN cm ON cell.part = cm.part, t),
        |dims AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM rm) AS nr,
        |                (SELECT CAST(count(*) AS BIGINT) FROM cm) AS nc),
        |ag AS (SELECT CAST(sum(term_e6) AS BIGINT) AS chi2_e6 FROM terms),
        |r AS (SELECT tt AS n, nr AS r_levels, nc AS c_levels, chi2_e6,
        |    CAST(chi2_e6 // (tt * least(nr - 1, nc - 1)) AS BIGINT) AS v2_e6
        |  FROM ag CROSS JOIN t CROSS JOIN dims)
        |SELECT n, r_levels, c_levels, chi2_e6, v2_e6,
        |  CASE WHEN v2_e6 < 10000 THEN 'negligible'
        |       WHEN v2_e6 < 90000 THEN 'small'
        |       WHEN v2_e6 < 250000 THEN 'medium'
        |       ELSE 'large' END AS cohen_band
        |FROM r""".stripMargin
    ) { (s, d) =>
      val cell = graft.Tables.events(s, d)
        .groupBy(col("event_type").as("grp"),
          expr("hour(ts) DIV 6").as("part"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint(true) // margins + terms all consume it
      val rm = cell.groupBy("grp").agg(sum("o").as("r"))
      val cm = cell.groupBy("part").agg(sum("o").as("c"))
      val t = cell.agg(sum("o").as("tt"))
      val dims = rm.agg(count(lit(1)).as("nr"))
        .crossJoin(cm.agg(count(lit(1)).as("nc")))
      val ag = cell.join(broadcast(rm), Seq("grp"))
        .join(broadcast(cm), Seq("part"))
        .crossJoin(broadcast(t))
        .select(expr(
          """((CAST(o AS DECIMAL(38,0)) * tt - CAST(r AS DECIMAL(38,0)) * c)
            | * (CAST(o AS DECIMAL(38,0)) * tt - CAST(r AS DECIMAL(38,0)) * c)
            | * 1000000)
            | DIV (CAST(r AS DECIMAL(38,0)) * c * tt)""".stripMargin)
          .as("term_e6"))
        .agg(sum("term_e6").cast("long").as("chi2_e6"))
      ag.crossJoin(broadcast(t)).crossJoin(broadcast(dims))
        .select(col("tt").as("n"), col("nr").as("r_levels"),
          col("nc").as("c_levels"), col("chi2_e6"),
          expr("CAST(chi2_e6 DIV (tt * least(nr - 1, nc - 1)) AS BIGINT)")
            .as("v2_e6"))
        .withColumn("cohen_band",
          when(col("v2_e6") < 10000, "negligible")
            .when(col("v2_e6") < 90000, "small")
            .when(col("v2_e6") < 250000, "medium")
            .otherwise("large"))
    },

    // T40 — difference-in-differences: the 2×2 (arm × period) causal
    // readout over the same midpoint split — DID = (T_post − T_pre) −
    // (C_post − C_pre) on per-cell purchase means. One user-free cell
    // aggregate (4 exact sums + counts), every float one fixed tree.
    Q(
      "ev32_diff_in_diff",
      """WITH rng AS (
        |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
        |  FROM events),
        |cell AS (
        |  SELECT user_id % 2 AS arm,
        |    CASE WHEN epoch_us(ts) < mid THEN 0 ELSE 1 END AS period,
        |    count(*) AS n,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM events, rng WHERE event_type = 'purchase' GROUP BY 1, 2),
        |m AS (
        |  SELECT
        |    max(CASE WHEN arm = 1 AND period = 1
        |        THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END) AS t1,
        |    max(CASE WHEN arm = 1 AND period = 0
        |        THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END) AS t0,
        |    max(CASE WHEN arm = 0 AND period = 1
        |        THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END) AS c1,
        |    max(CASE WHEN arm = 0 AND period = 0
        |        THEN CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) END) AS c0
        |  FROM cell)
        |SELECT t0, t1, c0, c1, (t1 - t0) - (c1 - c0) AS did FROM m""".stripMargin
    ) { (s, d) =>
      val ev = graft.Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          round(col("value") * 100).cast("long").as("cents"))
      val rng = graft.Tables.events(s, d)
        .select(unix_micros(col("ts")).as("us"))
        .agg(((min("us") + max("us")).cast("long")).as("midsum"))
        .select(expr("midsum DIV 2").as("mid"))
      val cell = ev.crossJoin(broadcast(rng))
        .groupBy((col("user_id") % 2).as("arm"),
          when(col("us") < col("mid"), 0).otherwise(1).as("period"))
        .agg(count(lit(1)).as("n"), sum("cents").as("cents"))
      def mean(a: Int, p: Int) =
        max(when(col("arm") === a && col("period") === p,
          col("cents").cast("double") / col("n").cast("double")))
      cell.agg(mean(1, 0).as("t0"), mean(1, 1).as("t1"),
          mean(0, 0).as("c0"), mean(0, 1).as("c1"))
        .select(col("t0"), col("t1"), col("c0"), col("c1"),
          ((col("t1") - col("t0")) - (col("c1") - col("c0"))).as("did"))
    },

    // T57 — Wald SPRT conversion monitor (the SEQUENTIAL counterpart of
    // ev29's fixed-horizon z-test: "stop the experiment the hour the
    // evidence suffices"). Design H0: p=0.18 vs H1: p=0.22, α=β=0.05.
    // The per-observation log-likelihood increments and the two Wald
    // boundaries are HARDCODED 1e6-unit integers (ln(0.22/0.18)→200671,
    // ln(0.78/0.82)→−50010, ln(19)→±2944439) so the cumulative LLR is
    // EXACT integer algebra — no transcendental is evaluated by either
    // engine at query time. Per arm, hourly (trials, conversions) roll
    // up once from the fact; cumulative sums and the first boundary
    // crossing run on the ~720-row hour spine (windows partition by
    // arm over the spine, never the fact). Output: one decision row per
    // arm — when the monitor would have stopped, on how many
    // observations, and the terminal LLR.
    Q(
      "ev49_sprt",
      """WITH hc AS (
        |  SELECT user_id % 2 AS arm, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |    count(*) AS n,
        |    sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
        |  FROM events GROUP BY 1, 2),
        |w AS (
        |  SELECT arm, hr,
        |    CAST(sum(n) OVER (PARTITION BY arm ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS nc,
        |    CAST(sum(x) OVER (PARTITION BY arm ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS xc
        |  FROM hc),
        |l AS (SELECT arm, hr, nc, xc,
        |        xc * 200671 + (nc - xc) * (-50010) AS llr_e6 FROM w),
        |c AS (SELECT arm, min(hr) AS cross_hr FROM l
        |      WHERE llr_e6 >= 2944439 OR llr_e6 <= -2944439 GROUP BY arm),
        |fin AS (SELECT arm, max(nc) AS n_total, max(xc) AS x_total,
        |          max(CASE WHEN rn = 1 THEN llr_e6 END) AS final_llr_e6
        |        FROM (SELECT arm, nc, xc, llr_e6,
        |                row_number() OVER (PARTITION BY arm ORDER BY hr DESC) AS rn
        |              FROM l) z GROUP BY arm)
        |SELECT fin.arm, fin.n_total, fin.x_total, fin.final_llr_e6,
        |  c.cross_hr, l.nc AS n_at_cross, l.llr_e6 AS llr_at_cross_e6,
        |  CASE WHEN l.llr_e6 >= 2944439 THEN 'reject_h0'
        |       WHEN l.llr_e6 <= -2944439 THEN 'accept_h0' END AS decision
        |FROM fin LEFT JOIN c ON fin.arm = c.arm
        |  LEFT JOIN l ON l.arm = c.arm AND l.hr = c.cross_hr
        |ORDER BY fin.arm""".stripMargin
    ) { (s, d) =>
      val hc = Tables.events(s, d)
        .groupBy((col("user_id") % 2).as("arm"),
          date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("x"))
      val byArm = Window.partitionBy("arm").orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val l = hc
        .withColumn("nc", sum("n").over(byArm))
        .withColumn("xc", sum("x").over(byArm))
        .select(col("arm"), col("hr"), col("nc"), col("xc"),
          (col("xc") * 200671L + (col("nc") - col("xc")) * -50010L).as("llr_e6"))
        .localCheckpoint(true) // crossing scan + final row + join consume it
      val c = l.filter(col("llr_e6") >= 2944439L || col("llr_e6") <= -2944439L)
        .groupBy("arm").agg(min("hr").as("cross_hr"))
      val fin = l
        .withColumn("rn", row_number().over(
          Window.partitionBy("arm").orderBy(col("hr").desc)))
        .groupBy("arm")
        .agg(max("nc").as("n_total"), max("xc").as("x_total"),
          max(when(col("rn") === 1, col("llr_e6"))).as("final_llr_e6"))
      fin.join(c, Seq("arm"), "left")
        .join(l.select(col("arm"), col("hr").as("cross_hr"),
            col("nc").as("n_at_cross"), col("llr_e6").as("llr_at_cross_e6")),
          Seq("arm", "cross_hr"), "left")
        .select(col("arm"), col("n_total"), col("x_total"), col("final_llr_e6"),
          col("cross_hr"), col("n_at_cross"), col("llr_at_cross_e6"),
          when(col("llr_at_cross_e6") >= 2944439L, lit("reject_h0"))
            .when(col("llr_at_cross_e6") <= -2944439L, lit("accept_h0"))
            .as("decision"))
        .orderBy("arm")
    },

    // T58 — Cramér's V effect size on ev34's contingency table: the
    // "is it LARGE, not just significant" companion every chi-square
    // reading needs at warehouse row counts (with enough n everything
    // is significant). chi2 rides ev34's exact 1e6-quantized HUGEINT
    // terms; V = √(χ² / (n·min(r−1,c−1))) adds only IEEE-exact √ and
    // division on top, so even the double is hash-portable. Margins are
    // tiny broadcast frames; the fact is touched once.
    Q(
      "ev50_cramers_v",
      """WITH cell AS (
        |  SELECT event_type AS grp, (hour(ts) // 6) AS part, count(*) AS o
        |  FROM events GROUP BY 1, 2),
        |rm AS (SELECT grp, CAST(sum(o) AS BIGINT) AS r FROM cell GROUP BY 1),
        |cm AS (SELECT part, CAST(sum(o) AS BIGINT) AS c FROM cell GROUP BY 1),
        |t AS (SELECT CAST(sum(o) AS BIGINT) AS tt FROM cell),
        |dims AS (SELECT (SELECT count(*) FROM rm) AS nr,
        |                (SELECT count(*) FROM cm) AS nc),
        |terms AS (
        |  SELECT ((CAST(o AS HUGEINT) * tt - CAST(r AS HUGEINT) * c)
        |     * (CAST(o AS HUGEINT) * tt - CAST(r AS HUGEINT) * c) * 1000000)
        |    // (CAST(r AS HUGEINT) * c * tt) AS term_e6
        |  FROM cell JOIN rm ON cell.grp = rm.grp
        |    JOIN cm ON cell.part = cm.part, t)
        |SELECT CAST(nr AS BIGINT) AS n_rows, CAST(nc AS BIGINT) AS n_cols,
        |  max(tt) AS n,
        |  CAST(sum(term_e6) AS BIGINT) AS chi2_e6,
        |  sqrt((CAST(sum(term_e6) AS DOUBLE) / 1000000)
        |       / (CAST(max(tt) AS DOUBLE)
        |          * (CASE WHEN nr < nc THEN nr ELSE nc END - 1))) AS cramers_v
        |FROM terms CROSS JOIN t CROSS JOIN dims
        |GROUP BY nr, nc""".stripMargin
    ) { (s, d) =>
      val cell = Tables.events(s, d)
        .groupBy(col("event_type").as("grp"), expr("hour(ts) DIV 6").as("part"))
        .agg(count(lit(1)).as("o"))
        .localCheckpoint(true) // margins + dims + terms all consume it
      val rm = cell.groupBy("grp").agg(sum("o").as("r"))
      val cm = cell.groupBy("part").agg(sum("o").as("c"))
      val t = cell.agg(sum("o").as("tt"))
      val dims = rm.agg(count(lit(1)).as("nr"))
        .crossJoin(cm.agg(count(lit(1)).as("nc")))
      cell.join(broadcast(rm), Seq("grp"))
        .join(broadcast(cm), Seq("part"))
        .crossJoin(broadcast(t))
        .select(expr(
          """((CAST(o AS DECIMAL(38,0)) * tt - CAST(r AS DECIMAL(38,0)) * c)
            | * (CAST(o AS DECIMAL(38,0)) * tt - CAST(r AS DECIMAL(38,0)) * c)
            | * 1000000)
            | DIV (CAST(r AS DECIMAL(38,0)) * c * tt)""".stripMargin)
          .as("term_e6"), col("tt"))
        .crossJoin(broadcast(dims))
        .groupBy("nr", "nc")
        .agg(max("tt").as("n"), sum("term_e6").cast("long").as("chi2_e6"))
        .select(col("nr").cast("long").as("n_rows"),
          col("nc").cast("long").as("n_cols"), col("n"), col("chi2_e6"),
          sqrt((col("chi2_e6").cast("double") / 1000000)
            / (col("n").cast("double")
              * (least(col("nr"), col("nc")) - 1))).as("cramers_v"))
    },

    // T59 — odds ratio with Woolf confidence interval: the 2×2
    // effect-size readout beside T37's significance test (an arm can be
    // "significantly" better by 0.1% — the OR says whether it MATTERS).
    // Users collapse to one (arm, outcome) row each (exact per-user
    // share test), the 2×2 cells are one conditional aggregate, OR =
    // (a·d)/(b·c) is a double of exact integers. ln(OR) and the Woolf
    // SE √(1/a+1/b+1/c+1/d) are each micro-quantized ONCE to 1e6
    // BIGINTs (tx19 discipline), and the 95% bounds stay EXACT integer
    // algebra: ±(1959964·se_e6) DIV 1e6 — positive, so floor-DIV
    // agrees across engines; no exp() is evaluated anywhere.
    Q(
      "ev51_odds_ratio",
      """WITH u AS (
        |  -- outcome = HEAVY purchaser (purchase share > 20%, exact
        |  -- integer cross-multiply): nearly every user purchases at
        |  -- least once, so any-purchase would leave b = 0 and an
        |  -- undefined OR — the intensity margin is the real readout
        |  SELECT user_id % 2 AS arm,
        |    CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |              > count(*) THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY user_id),
        |cm AS (SELECT
        |    CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM u),
        |q AS (SELECT a, b, c, d,
        |    CAST(a AS DOUBLE) * d / (CAST(b AS DOUBLE) * c) AS odds_ratio,
        |    CAST(round(1000000 * ln(CAST(a AS DOUBLE) * d
        |         / (CAST(b AS DOUBLE) * c))) AS BIGINT) AS ln_or_e6,
        |    -- CAST(1 AS DOUBLE), not 1.0: DuckDB parses 1.0 as DECIMAL
        |    CAST(round(1000000 * sqrt(CAST(1 AS DOUBLE)/a + CAST(1 AS DOUBLE)/b
        |         + CAST(1 AS DOUBLE)/c + CAST(1 AS DOUBLE)/d))
        |      AS BIGINT) AS se_e6
        |  FROM cm)
        |SELECT a, b, c, d, odds_ratio, ln_or_e6, se_e6,
        |  ln_or_e6 - (1959964 * se_e6) // 1000000 AS ci_lo_e6,
        |  ln_or_e6 + (1959964 * se_e6) // 1000000 AS ci_hi_e6
        |FROM q""".stripMargin
    ) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(when(lit(5) * sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)) > count(lit(1)), 1L).otherwise(0L).as("conv"))
        .select((col("user_id") % 2).as("arm"), col("conv"))
      val cm = u.agg(
        sum(when(col("arm") === 1 && col("conv") === 1, 1L).otherwise(0L)).as("a"),
        sum(when(col("arm") === 1 && col("conv") === 0, 1L).otherwise(0L)).as("b"),
        sum(when(col("arm") === 0 && col("conv") === 1, 1L).otherwise(0L)).as("c"),
        sum(when(col("arm") === 0 && col("conv") === 0, 1L).otherwise(0L)).as("d"))
      val q = cm.select(col("a"), col("b"), col("c"), col("d"),
        (col("a").cast("double") * col("d")
          / (col("b").cast("double") * col("c"))).as("odds_ratio"),
        round(lit(1000000) * log(col("a").cast("double") * col("d")
          / (col("b").cast("double") * col("c")))).cast("long").as("ln_or_e6"),
        round(lit(1000000) * sqrt(lit(1.0) / col("a") + lit(1.0) / col("b")
          + lit(1.0) / col("c") + lit(1.0) / col("d"))).cast("long").as("se_e6"))
      q.select(col("a"), col("b"), col("c"), col("d"), col("odds_ratio"),
        col("ln_or_e6"), col("se_e6"),
        (col("ln_or_e6") - expr("(1959964 * se_e6) DIV 1000000")).as("ci_lo_e6"),
        (col("ln_or_e6") + expr("(1959964 * se_e6) DIV 1000000")).as("ci_hi_e6"))
    },

    // T67 — Poisson event-rate normal-approximation CI per type: the
    // "is this alert volume unusual" baseline every on-call dashboard
    // carries. Exposure T = distinct active hours (identical count both
    // engines); rate as exact floor permille per hour; the count CI
    // n ± 1.96√n enters through ONE micro-quantized √n (IEEE-exact,
    // identical trees) and pure positive-integer DIV — ev51's
    // no-transcendental-at-decision discipline.
    Q(
      "ev59_rate_ci",
      """WITH x AS (SELECT event_type,
        |    date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr FROM events),
        |t AS (SELECT count(DISTINCT hr) AS hours FROM x),
        |c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM x GROUP BY 1)
        |SELECT event_type, n, (SELECT CAST(hours AS BIGINT) FROM t) AS hours,
        |  (n * 1000) // (SELECT hours FROM t) AS rate_per_hour_pm,
        |  1000000 * n - (1959964 * CAST(round(1000000 * sqrt(CAST(n AS DOUBLE)))
        |    AS BIGINT)) // 1000000 AS count_lo_e6,
        |  1000000 * n + (1959964 * CAST(round(1000000 * sqrt(CAST(n AS DOUBLE)))
        |    AS BIGINT)) // 1000000 AS count_hi_e6
        |FROM c ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      val x = Tables.events(s, d).select(col("event_type"),
        date_trunc("hour", col("ts")).as("hr"))
      val t = x.agg(countDistinct("hr").as("hours"))
      val c = x.groupBy("event_type").agg(count(lit(1)).as("n"))
      c.crossJoin(broadcast(t))
        .withColumn("sqn_e6",
          round(lit(1000000) * sqrt(col("n").cast("double"))).cast("long"))
        .select(col("event_type"), col("n"), col("hours"),
          expr("(n * 1000) DIV hours").as("rate_per_hour_pm"),
          (lit(1000000) * col("n") - expr("(1959964 * sqn_e6) DIV 1000000"))
            .as("count_lo_e6"),
          (lit(1000000) * col("n") + expr("(1959964 * sqn_e6) DIV 1000000"))
            .as("count_hi_e6"))
        .orderBy("event_type")
    },

    // T68 — Cohen's d on per-user spend (the CONTINUOUS effect size
    // beside T36's Welch significance and T59's binary odds ratio):
    // d = (μ₁−μ₀)/s_pooled. Per-event values quantize to exact cents
    // (a raw double sum would be partition-order-dependent — the
    // repo-wide reason every money column is cents), users collapse
    // once, group moments are exact integers, and d is doubles of
    // identical trees micro-quantized ONCE at the end.
    Q(
      "ev60_cohens_d",
      """WITH u AS (
        |  SELECT user_id % 2 AS arm,
        |    CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM events GROUP BY user_id),
        |g AS (SELECT arm, count(*) AS n, CAST(sum(v) AS BIGINT) AS s,
        |        CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS q2
        |      FROM u GROUP BY 1),
        |w AS (SELECT
        |    max(CASE WHEN arm = 1 THEN n END) AS n1,
        |    max(CASE WHEN arm = 1 THEN s END) AS s1,
        |    max(CASE WHEN arm = 1 THEN CAST(q2 AS DOUBLE) END) AS q1,
        |    max(CASE WHEN arm = 0 THEN n END) AS n0,
        |    max(CASE WHEN arm = 0 THEN s END) AS s0,
        |    max(CASE WHEN arm = 0 THEN CAST(q2 AS DOUBLE) END) AS q0
        |  FROM g)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
        |  CAST(round(1000000 * (
        |    (CAST(s1 AS DOUBLE)/n1 - CAST(s0 AS DOUBLE)/n0)
        |    / sqrt((
        |        (q1 - CAST(s1 AS DOUBLE)*s1/n1)
        |      + (q0 - CAST(s0 AS DOUBLE)*s0/n0)
        |      ) / (n1 + n0 - 2)))) AS BIGINT) AS cohens_d_e6
        |FROM w""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(sum(round(col("value") * 100).cast("long")).as("v"))
        .select((col("user_id") % 2).as("arm"), col("v"))
      val g = u.groupBy("arm")
        .agg(count(lit(1)).as("n"), sum("v").as("s"),
          sum(dec(col("v")) * col("v")).as("q2"))
      val w = g.agg(
        max(when(col("arm") === 1, col("n"))).as("n1"),
        max(when(col("arm") === 1, col("s"))).as("s1"),
        max(when(col("arm") === 1, col("q2").cast("double"))).as("q1"),
        max(when(col("arm") === 0, col("n"))).as("n0"),
        max(when(col("arm") === 0, col("s"))).as("s0"),
        max(when(col("arm") === 0, col("q2").cast("double"))).as("q0"))
      w.select(col("n1"), col("n0"),
        round(lit(1000000) * (
          (col("s1").cast("double") / col("n1")
            - col("s0").cast("double") / col("n0"))
          / sqrt((
              (col("q1") - col("s1").cast("double") * col("s1") / col("n1"))
            + (col("q0") - col("s0").cast("double") * col("s0") / col("n0"))
            ) / (col("n1") + col("n0") - 2))))
          .cast("long").as("cohens_d_e6"))
    },

    // T69 — burstiness index per event type (CV of inter-arrival
    // times): a Poisson process has CV = 1; CV > 1 is bursty traffic,
    // CV < 1 a regular pulse — the single number that says which. Gaps
    // are exact epoch-second diffs per (type, user-independent) global
    // arrival order; CV classes use q108's EXACT variance-identity
    // cross-multiplies (n·Σg² vs S² scaled), and cv_e6 itself is one
    // quantized double of exact integers for the readout. The gap
    // window partitions by type over per-type event-sized partitions.
    Q(
      "ev61_burstiness",
      """WITH a AS (
        |  SELECT event_type,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS sec,
        |    event_id
        |  FROM events),
        |g AS (SELECT event_type,
        |        lead(sec) OVER (PARTITION BY event_type ORDER BY sec, event_id)
        |          - sec AS gap
        |      FROM a),
        |st AS (SELECT event_type, count(*) AS n, CAST(sum(gap) AS BIGINT) AS s,
        |         CAST(sum(CAST(gap AS HUGEINT) * gap) AS HUGEINT) AS q2
        |       FROM g WHERE gap IS NOT NULL GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
        |  CAST(round(1000000 * sqrt(CAST(n * q2 - CAST(s AS HUGEINT) * s
        |      AS DOUBLE)) / s) AS BIGINT) AS cv_e6,
        |  CASE WHEN n * q2 > 2 * CAST(s AS HUGEINT) * s THEN 'bursty'
        |       WHEN 2 * (n * q2 - CAST(s AS HUGEINT) * s)
        |            < CAST(s AS HUGEINT) * s THEN 'regular'
        |       ELSE 'poisson-like' END AS regime
        |FROM st ORDER BY event_type""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val a = Tables.events(s, d).select(col("event_type"),
        unix_micros(col("ts")).as("sec"), col("event_id"))
      val w = Window.partitionBy("event_type").orderBy(col("sec"), col("event_id"))
      val g = a.select(col("event_type"),
          (lead("sec", 1).over(w) - col("sec")).as("gap"))
        .filter(col("gap").isNotNull)
      val st = g.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("gap").as("s"),
          sum(dec(col("gap")) * col("gap")).as("q2"))
      st.select(col("event_type"), col("n").as("n_gaps"),
        round(lit(1000000)
          * sqrt((dec(col("n")) * col("q2") - dec(col("s")) * col("s"))
            .cast("double")) / col("s")).cast("long").as("cv_e6"),
        when(dec(col("n")) * col("q2") > lit(2) * dec(col("s")) * col("s"),
          "bursty")
          .when(lit(2) * (dec(col("n")) * col("q2") - dec(col("s")) * col("s"))
            < dec(col("s")) * col("s"), "regular")
          .otherwise("poisson-like").as("regime"))
        .orderBy("event_type")
    },

    // T73 — Wilson score interval for conversion (per arm): the Wald
    // interval T37/T67 use collapses near 0/1 and at small n; Wilson is
    // what production dashboards should show. Users collapse once
    // (ev51's heavy-purchaser margin), and the interval is a single
    // double tree of exact integers with the z = 1.96 constants as
    // exact decimal literals (parsed identically both engines),
    // center/halfwidth each quantized ONCE to e6, bounds pure integer
    // add/subtract.
    Q(
      "ev65_wilson_ci",
      """WITH u AS (
        |  SELECT user_id % 2 AS arm,
        |    CASE WHEN 5 * sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |              > count(*) THEN 1 ELSE 0 END AS conv
        |  FROM events GROUP BY user_id),
        |g AS (SELECT arm, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(conv) AS BIGINT) AS c
        |      FROM u GROUP BY 1),
        |w AS (SELECT arm, n, c,
        |    CAST(round(1000000 * (c + 1.9208) / (n + 3.8416)) AS BIGINT)
        |      AS center_e6,
        |    CAST(round(1000000 * 1.96
        |      * sqrt(CAST(c AS DOUBLE) * (n - c) / n + 0.9604)
        |      / (n + 3.8416)) AS BIGINT) AS hw_e6
        |  FROM g)
        |SELECT CAST(arm AS BIGINT) AS arm, n, c, center_e6,
        |  center_e6 - hw_e6 AS lo_e6, center_e6 + hw_e6 AS hi_e6
        |FROM w ORDER BY arm""".stripMargin
    ) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(when(lit(5) * sum(when(col("event_type") === "purchase", 1L)
          .otherwise(0L)) > count(lit(1)), 1L).otherwise(0L).as("conv"))
        .select((col("user_id") % 2).as("arm"), col("conv"))
      val g = u.groupBy("arm").agg(count(lit(1)).as("n"), sum("conv").as("c"))
      g.select(col("arm"), col("n"), col("c"),
          round(lit(1000000) * (col("c") + lit(1.9208))
            / (col("n") + lit(3.8416))).cast("long").as("center_e6"),
          round(lit(1000000) * lit(1.96)
            * sqrt(col("c").cast("double") * (col("n") - col("c")) / col("n")
              + lit(0.9604))
            / (col("n") + lit(3.8416))).cast("long").as("hw_e6"))
        .select(col("arm"), col("n"), col("c"), col("center_e6"),
          (col("center_e6") - col("hw_e6")).as("lo_e6"),
          (col("center_e6") + col("hw_e6")).as("hi_e6"))
        .orderBy("arm")
    },

    // R189 — Wald–Wolfowitz runs test: is the daily revenue up/down
    // sequence RANDOM, or does it trend/mean-revert (the randomness
    // check the forecasting entries implicitly assume). Signs from
    // lag-diffs on the day spine (zero diffs dropped, the standard
    // treatment); runs R = sign changes + 1 counted exactly; μ and σ
    // of R under H0 are closed-form rationals of the exact counts
    // n1, n2 — z is ONE double expression of exact sub-2⁵³ integers,
    // identical tree both engines, e6-rounded. Everything after the
    // one fact pass runs on the spine.
    Q(
      "q125_runs_test",
      """WITH dc AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |df AS (SELECT d, rev - lag(rev) OVER (ORDER BY d) AS diff FROM dc),
        |sg AS (SELECT d, CASE WHEN diff > 0 THEN 1 ELSE -1 END AS s
        |       FROM df WHERE diff IS NOT NULL AND diff <> 0),
        |ch AS (SELECT s, lag(s) OVER (ORDER BY d) AS ps FROM sg),
        |agg AS (SELECT
        |    CAST(sum(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(sum(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
        |    CAST(1 + sum(CASE WHEN ps IS NOT NULL AND s <> ps THEN 1 ELSE 0 END)
        |         AS BIGINT) AS runs
        |  FROM ch)
        |SELECT n1, n2, runs,
        |  CAST(round(1000000 * (2.0 * n1 * n2 / (n1 + n2) + 1)) AS BIGINT) AS mu_e6,
        |  CAST(round(1000000 * (CAST(runs AS DOUBLE) - (2.0 * n1 * n2 / (n1 + n2) + 1))
        |    / sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2)))
        |         / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)))) AS BIGINT)
        |    AS z_e6
        |FROM agg""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dc = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("d"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
      // day-spine windows: bounded by the date domain, not the fact
      val wd = Window.orderBy("d")
      val sg = dc.withColumn("diff", col("rev") - lag("rev", 1).over(wd))
        .filter(col("diff").isNotNull && col("diff") =!= 0)
        .select(col("d"), when(col("diff") > 0, 1L).otherwise(-1L).as("s"))
      val ch = sg.withColumn("ps", lag("s", 1).over(wd))
      val agg = ch.agg(
        sum(when(col("s") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("s") === -1, 1L).otherwise(0L)).as("n2"),
        (lit(1L) + sum(when(col("ps").isNotNull && col("s") =!= col("ps"), 1L)
          .otherwise(0L))).as("runs"))
      agg.select(col("n1"), col("n2"), col("runs"),
        expr("CAST(round(1000000 * (2.0 * n1 * n2 / (n1 + n2) + 1)) AS BIGINT)")
          .as("mu_e6"),
        expr("""CAST(round(1000000 * (CAST(runs AS DOUBLE) - (2.0 * n1 * n2 / (n1 + n2) + 1))
          | / sqrt((2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2)))
          |      / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2) * (n1 + n2 - 1)))) AS BIGINT)"""
          .stripMargin).as("z_e6"))
    },

    // R201 — sample-ratio mismatch (SRM) gate: the FIRST check every
    // experiment platform runs before reading any metric — did the
    // 50/50 assignment actually deliver 50/50 users. One-proportion
    // chi-square against the fixed split, entirely integer:
    // χ² = (na−nb)²/(na+nb), quantized e6 by floor DIV, and the 95%
    // flag as the cross-multiply 10⁶·(na−nb)² > 3841459·(na+nb) (the
    // χ²₁ critical value scaled e6 — no float compare). Assignment =
    // user_id parity (the ev28/ev33 arm convention); one distinct-user
    // aggregate.
    Q(
      "q128_srm",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |a AS (SELECT
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
        |  FROM u)
        |SELECT na, nb,
        |  (1000000 * (na - nb) * (na - nb)) // (na + nb) AS chisq_e6,
        |  CASE WHEN 1000000 * (na - nb) * (na - nb) > 3841459 * (na + nb)
        |       THEN 1 ELSE 0 END AS srm_flag
        |FROM a""".stripMargin
    ) { (s, d) =>
      val u = Tables.events(s, d).select("user_id").distinct()
      u.agg(
          sum(when(col("user_id") % 2 === 0, 1L).otherwise(0L)).as("na"),
          sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L)).as("nb"))
        .select(col("na"), col("nb"),
          expr("(1000000 * (na - nb) * (na - nb)) DIV (na + nb)").as("chisq_e6"),
          when(expr("1000000 * (na - nb) * (na - nb) > 3841459 * (na + nb)"), 1L)
            .otherwise(0L).as("srm_flag"))
    },

    // T94 — Kruskal-Wallis H: the k-group generalization completing the
    // nonparametric family (T33 Mann-Whitney handles 2 groups, T41
    // ANOVA assumes normality). Does `value` differ across ALL FIVE
    // event types at once? Tie-averaged global ranks come from value
    // cells: 2·rank(v) = 2·cum(<v) + t_v + 1 (doubled — halves stay
    // integral, ev26's identity), so the per-group doubled rank sum is
    // u2_g = Σ_v c_gv·(2·cumlt_v + t_v + 1), exact in decimal(38,0).
    // H = 3/(N(N+1))·Σ_g u2_g²/n_g − 3(N+1); each group's u2²/n_g is
    // FLOOR-DIVIDED to an integer before the cross-group sum (per-term
    // quantization — a sum of k double terms would reassociate), and
    // the tie correction 1 − Σ(t³−t)/(N³−N) is the same exact-integer
    // tsum as ev26. Width bound (q115's key-width discipline): u2 ≤
    // N(2N+1), so u2² fits decimal(38,0)/HUGEINT while N ≲ 2·10⁹ —
    // beyond that, carry the per-group terms as doubles (the statistic
    // is a double anyway). SCALE: the value-cell frame is ~0.66·N distinct
    // cents here (a continuous domain — NOT bounded), so the global
    // cell cumulative runs through Blocked.cumulative, never an
    // unpartitioned window; the oracle uses the plain window form.
    Q(
      "ev89_kruskal_wallis",
      """WITH q AS (SELECT event_type AS grp,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |gc AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY 1, 2),
        |vc AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM gc GROUP BY 1),
        |cum AS (SELECT v, t,
        |    CAST(coalesce(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cumlt
        |  FROM vc),
        |rs AS (SELECT gc.grp, CAST(sum(gc.c) AS BIGINT) AS n_g,
        |    CAST(sum(CAST(gc.c AS HUGEINT)
        |             * (2 * cum.cumlt + cum.t + 1)) AS HUGEINT) AS u2
        |  FROM gc JOIN cum ON gc.v = cum.v GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    CAST(sum(u2 * u2 // n_g) AS HUGEINT) AS qsum
        |  FROM rs),
        |ties AS (SELECT CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT)
        |           AS tsum FROM vc)
        |SELECT n, k,
        |  3.0 * CAST(qsum AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))
        |    - 3.0 * (CAST(n AS DOUBLE) + 1) AS h,
        |  (3.0 * CAST(qsum AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1))
        |    - 3.0 * (CAST(n AS DOUBLE) + 1))
        |  / (1.0 - CAST(tsum AS DOUBLE)
        |       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |          - CAST(n AS DOUBLE))) AS h_tie_corrected
        |FROM tot CROSS JOIN ties""".stripMargin
    ) { (s, d) =>
      val q = Tables.events(s, d)
        .select(col("event_type").as("grp"),
          round(col("value") * 100).cast("long").as("v"))
      val gc = q.groupBy("grp", "v").agg(count(lit(1)).as("c"))
      val vc = gc.groupBy("v").agg(sum("c").as("t"))
      val cum = Blocked.cumulative(vc, Seq(col("v")), Seq("t"))
        .withColumn("cumlt", col("cum_t") - col("t"))
        .select("v", "t", "cumlt")
      val rs = gc.join(cum, Seq("v"))
        .groupBy("grp")
        .agg(sum("c").as("n_g"),
          sum(col("c").cast("decimal(38,0)")
            * (lit(2) * col("cumlt") + col("t") + 1)).as("u2"))
      // exact floor quotient: subtract the remainder BEFORE dividing —
      // Spark decimal division rounds HALF_UP at result scale, which
      // could disagree with DuckDB's truncating // on near-integer
      // quotients; (x − x%n)/n divides evenly on both engines
      val sq = col("u2") * col("u2")
      val tot = rs.agg(
        sum("n_g").as("n"), count(lit(1)).as("k"),
        sum(((sq - pmod(sq, col("n_g"))) / col("n_g"))
          .cast("decimal(38,0)")).as("qsum"))
      val ties = vc.agg(
        sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
          .as("tsum"))
      val nd = col("n").cast("double")
      // H = 12/(N(N+1))·ΣR²/n − 3(N+1); with doubled rank sums u2=2R the
      // qsum already carries u2²=4R², so 12/4 = 3 and the denominator is
      // exactly N(N+1) — no further /4 (that would shrink H fourfold and
      // drive it negative, impossible for H ≥ 0).
      val hExpr = lit(3.0) * col("qsum").cast("double")
        ./(nd * (nd + 1)) - lit(3.0) * (nd + 1)
      tot.crossJoin(ties)
        .select(col("n"), col("k"), hExpr.as("h"),
          (hExpr / (lit(1.0) - col("tsum").cast("double")
            / (nd * nd * nd - nd))).as("h_tie_corrected"))
    },

    // T97 — Wilcoxon signed-rank: the PAIRED test completing the
    // nonparametric family (T33 rank-sum compares two samples, this
    // compares each unit with ITSELF — here every customer's 1995 vs
    // 1996 spend, the repeated-measures design a mean-of-differences
    // t-test would need normality for). Zero differences drop (the
    // standard treatment); |d| ranks are tie-averaged DOUBLED integers
    // off |d|-value cells (ev26's 2·rank = 2·cum(<v) + t + 1 identity),
    // so 2·W⁺ = Σ_v pos(v)·(2·cumlt_v + t_v + 1) is exact; the normal
    // approximation z = (2W⁺ − n(n+1)/2) / √(n(n+1)(2n+1)/6 − Σ(t³−t)/12)
    // is the one double tree, tie correction exact in decimal/HUGEINT.
    // SCALE: spend-difference cents are near-continuous, so the
    // |d|-cell cumulative runs through Blocked.cumulative; the oracle
    // uses the plain window form.
    Q(
      "q149_wilcoxon_signed",
      """WITH cy AS (
        |  SELECT o_custkey AS ck,
        |    CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
        |             THEN CAST(round(o_totalprice*100) AS BIGINT)
        |             ELSE 0 END) AS BIGINT) AS c95,
        |    CAST(sum(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
        |             THEN CAST(round(o_totalprice*100) AS BIGINT)
        |             ELSE 0 END) AS BIGINT) AS c96
        |  FROM orders
        |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
        |  GROUP BY 1),
        |dd AS (SELECT abs(c96 - c95) AS v,
        |         CASE WHEN c96 > c95 THEN 1 ELSE 0 END AS pos
        |       FROM cy WHERE c96 <> c95),
        |cells AS (SELECT v, CAST(count(*) AS BIGINT) AS t,
        |            CAST(sum(pos) AS BIGINT) AS p FROM dd GROUP BY 1),
        |cum AS (SELECT v, t, p,
        |    CAST(coalesce(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cumlt
        |  FROM cells),
        |agg AS (SELECT CAST(sum(t) AS BIGINT) AS n,
        |    CAST(sum(CAST(p AS HUGEINT) * (2 * cumlt + t + 1)) AS BIGINT)
        |      AS w2plus,
        |    CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS tsum
        |  FROM cum)
        |SELECT n, w2plus,
        |  (CAST(w2plus AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
        |     / 2)
        |  / sqrt(CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1)
        |         * (2 * CAST(n AS DOUBLE) + 1) / 6
        |         - CAST(tsum AS DOUBLE) / 12) AS z
        |FROM agg""".stripMargin
    ) { (s, d) =>
      val yr = year(col("o_orderdate").cast("date"))
      val cy = Tables.orders(s, d)
        .filter(yr.isin(1995, 1996))
        .groupBy(col("o_custkey").as("ck"))
        .agg(sum(when(yr === 1995,
            round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
            .as("c95"),
          sum(when(yr === 1996,
            round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
            .as("c96"))
      val dd = cy.filter(col("c96") =!= col("c95"))
        .select(abs(col("c96") - col("c95")).as("v"),
          when(col("c96") > col("c95"), 1L).otherwise(0L).as("pos"))
      val cells = dd.groupBy("v")
        .agg(count(lit(1)).as("t"), sum("pos").as("p"))
      val cum = Blocked.cumulative(cells, Seq(col("v")), Seq("t"))
        .withColumn("cumlt", col("cum_t") - col("t"))
      val agg = cum.agg(sum("t").as("n"),
        sum(col("p").cast("decimal(38,0)")
          * (lit(2) * col("cumlt") + col("t") + 1)).cast("long").as("w2plus"),
        sum(col("t").cast("decimal(38,0)") * col("t") * col("t") - col("t"))
          .as("tsum"))
      val nd = col("n").cast("double")
      agg.select(col("n"), col("w2plus"),
        ((col("w2plus").cast("double") - nd * (nd + 1) / 2)
          / sqrt(nd * (nd + 1) * (lit(2) * nd + 1) / 6
            - col("tsum").cast("double") / 12)).as("z"))
    },

    // T100 — Benjamini-Hochberg FDR control over a test BATTERY: run
    // one two-proportion z-test per nation ("is this nation's F-rate
    // off the global rate") and control the FALSE DISCOVERY RATE across
    // all 25 simultaneous tests — the multiple-comparison correction an
    // experimentation platform applies before reading any per-segment
    // scan (25 uncorrected α=.05 tests expect ~1.25 false positives).
    // Exact: z²_n = (c_n·N − C·n_n)²/(n_n·C·(N−C)) is one e6-floored
    // integral division of decimal(38,0) integers; p-values never
    // materialize — p_(i) ≤ α·i/m ⇔ z²_(i) ≥ χ²₁(1 − α·i/m), so the
    // step-up compares ranked z² against a LITERAL 25-entry critical
    // ladder (e6-scaled χ²₁ quantiles at α·i/25, i=1..25; the i=25 rung
    // is the familiar 3.841459). m is pinned to 25 by anchoring on the
    // NATION dimension (zero-order nations score z²=0, never rejected),
    // so the ladder is total by construction. Ranking is a triangular
    // self-join on the 25-row battery frame (strict (z², name) order —
    // no window, bounded work); BH's step-up k = max flagged rank
    // broadcasts back as a 1-row scalar.
    Q(
      "q153_bh_fdr",
      """WITH o AS (SELECT n.n_name AS nation,
        |    CAST(count(*) AS BIGINT) AS n_trials,
        |    CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS f_cnt
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY 1),
        |b AS (SELECT n_name AS nation,
        |        coalesce(o.n_trials, 0) AS n_trials,
        |        coalesce(o.f_cnt, 0) AS f_cnt
        |      FROM nation LEFT JOIN o ON nation.n_name = o.nation),
        |g AS (SELECT CAST(sum(n_trials) AS BIGINT) AS nn,
        |             CAST(sum(f_cnt) AS BIGINT) AS cc FROM b),
        |z AS (SELECT nation, n_trials, f_cnt,
        |    CASE WHEN n_trials = 0 OR cc = 0 OR cc = nn THEN 0
        |    ELSE CAST((1000000 * (CAST(f_cnt AS HUGEINT) * nn - CAST(cc AS HUGEINT) * n_trials)
        |                        * (CAST(f_cnt AS HUGEINT) * nn - CAST(cc AS HUGEINT) * n_trials))
        |         // (CAST(n_trials AS HUGEINT) * cc * (nn - cc)) AS BIGINT) END AS z2_e6
        |  FROM b CROSS JOIN g),
        |rk AS (SELECT a.nation, a.n_trials, a.f_cnt, a.z2_e6,
        |    CAST(1 + count(CASE WHEN bb.z2_e6 > a.z2_e6
        |          OR (bb.z2_e6 = a.z2_e6 AND bb.nation < a.nation)
        |          THEN 1 END) AS BIGINT) AS rk
        |  FROM z a CROSS JOIN z bb GROUP BY 1, 2, 3, 4),
        |lad AS (SELECT * FROM (VALUES
        |  (1,9549536),(2,8283815),(3,7550303),(4,7033474),(5,6634897),
        |  (6,6310869),(7,6038143),(8,5802874),(9,5596149),(10,5411894),
        |  (11,5245785),(12,5094632),(13,4956019),(14,4828067),(15,4709292),
        |  (16,4598497),(17,4494704),(18,4397105),(19,4305022),(20,4217885),
        |  (21,4135204),(22,4056562),(23,3981594),(24,3909986),(25,3841459))
        |  AS t(rk, q_e6)),
        |fl AS (SELECT rk.*, CASE WHEN rk.z2_e6 >= lad.q_e6 THEN 1 ELSE 0 END
        |         AS at_rung
        |       FROM rk JOIN lad ON rk.rk = lad.rk),
        |kk AS (SELECT coalesce(max(CASE WHEN at_rung = 1 THEN rk END), 0) AS k
        |       FROM fl)
        |SELECT nation, n_trials, f_cnt, z2_e6, rk,
        |  CAST(CASE WHEN rk <= k THEN 1 ELSE 0 END AS BIGINT) AS reject
        |FROM fl CROSS JOIN kk ORDER BY rk""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val joined = Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"))
        .agg(count(lit(1)).as("n_trials"),
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("f_cnt"))
      val b = broadcast(Tables.nation(s, d).select(col("n_name").as("nation")))
        .join(joined, Seq("nation"), "left")
        .select(col("nation"),
          coalesce(col("n_trials"), lit(0L)).as("n_trials"),
          coalesce(col("f_cnt"), lit(0L)).as("f_cnt"))
      val g = b.agg(sum("n_trials").as("nn"), sum("f_cnt").as("cc"))
      val d38 = "decimal(38,0)"
      val dev = col("f_cnt").cast(d38) * col("nn") -
        col("cc").cast(d38) * col("n_trials")
      val z = b.crossJoin(broadcast(g)).select(col("nation"),
        col("n_trials"), col("f_cnt"),
        when(col("n_trials") === 0 || col("cc") === 0 || col("cc") === col("nn"),
          lit(0L))
          .otherwise({
            val num = lit(1000000).cast(d38) * dev * dev
            val den = col("n_trials").cast(d38) * col("cc") *
              (col("nn") - col("cc"))
            ((num - pmod(num, den)) / den).cast("long")
          }).as("z2_e6"))
        .localCheckpoint(true) // both sides of the 25×25 rank join
      val rk = z.as("a")
        .crossJoin(z.select(col("z2_e6").as("bz"), col("nation").as("bn")))
        .groupBy("nation", "n_trials", "f_cnt", "z2_e6")
        .agg((lit(1) + count(when(col("bz") > col("z2_e6")
          || (col("bz") === col("z2_e6") && col("bn") < col("nation")), 1)))
          .cast("long").as("rk"))
      val ladder = Seq(
        1L -> 9549536L, 2L -> 8283815L, 3L -> 7550303L, 4L -> 7033474L,
        5L -> 6634897L, 6L -> 6310869L, 7L -> 6038143L, 8L -> 5802874L,
        9L -> 5596149L, 10L -> 5411894L, 11L -> 5245785L, 12L -> 5094632L,
        13L -> 4956019L, 14L -> 4828067L, 15L -> 4709292L, 16L -> 4598497L,
        17L -> 4494704L, 18L -> 4397105L, 19L -> 4305022L, 20L -> 4217885L,
        21L -> 4135204L, 22L -> 4056562L, 23L -> 3981594L, 24L -> 3909986L,
        25L -> 3841459L).toDF("rk", "q_e6")
      val fl = rk.join(broadcast(ladder), Seq("rk"))
        .withColumn("at_rung",
          when(col("z2_e6") >= col("q_e6"), 1L).otherwise(0L))
      val kk = fl.agg(coalesce(
        max(when(col("at_rung") === 1, col("rk"))), lit(0L)).as("k"))
      fl.crossJoin(broadcast(kk))
        .select(col("nation"), col("n_trials"), col("f_cnt"), col("z2_e6"),
          col("rk"),
          when(col("rk") <= col("k"), 1L).otherwise(0L).as("reject"))
        .orderBy("rk")
    },

    // T101 — Dunn's post-hoc pairwise test: AFTER ev89's Kruskal-Wallis
    // omnibus says "the five event types differ somewhere", Dunn says
    // WHERE — all 10 pairwise mean-rank comparisons on the SAME global
    // tie-averaged ranks (never per-pair re-ranking — that's
    // Mann-Whitney and inflates error), with q153's BH step-up
    // controlling the FDR across the 10 simultaneous pairs (two-sided
    // ladder, m=10). Doubled rank sums u2_g reuse ev89's cell algebra;
    // each group's MEAN doubled rank is e6-quantized ONCE
    // (m_g = 10⁶·u2_g ÷ n_g — the only quantization, identical floors
    // on both engines), and z²_ij = 3(N−1)·Δ²·n_i·n_j /
    // ((n_i+n_j)·(N(N+1)(N−1) − Σ(t³−t))) with Δ² staged as
    // (m_i−m_j)² ÷ 10⁶ so every intermediate stays under
    // decimal(38,0)/HUGEINT through N ≈ 10⁷ (the exact N⁶ cross-form
    // overflows at sf0.1 already — width audit in the r7 notes; beyond
    // the bound carry doubles, ev89's documented policy). Pair frame
    // is 10 rows; ranking is the q153 triangular join.
    Q(
      "q154_dunn_posthoc",
      """WITH q AS (SELECT event_type AS grp,
        |    CAST(round(value * 100) AS BIGINT) AS v
        |  FROM events),
        |gc AS (SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM q GROUP BY 1, 2),
        |vc AS (SELECT v, CAST(sum(c) AS BIGINT) AS t FROM gc GROUP BY 1),
        |cum AS (SELECT v, t,
        |    CAST(coalesce(sum(t) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS cumlt
        |  FROM vc),
        |rs AS (SELECT grp, n_g, u2, (u2 * 1000000) // n_g AS m FROM (
        |    SELECT gc.grp, CAST(sum(gc.c) AS BIGINT) AS n_g,
        |      CAST(sum(CAST(gc.c AS HUGEINT)
        |               * (2 * cum.cumlt + cum.t + 1)) AS HUGEINT) AS u2
        |    FROM gc JOIN cum ON gc.v = cum.v GROUP BY 1)),
        |tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS n FROM rs),
        |ties AS (SELECT CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT)
        |           AS tsum FROM vc),
        |pr AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
        |    a.n_g AS na, b.n_g AS nb,
        |    3 * (CAST(n AS HUGEINT) - 1)
        |      * (((a.m - b.m) * (a.m - b.m)) // 1000000)
        |      * a.n_g * b.n_g AS num,
        |    CAST(a.n_g + b.n_g AS HUGEINT)
        |      * (CAST(n AS HUGEINT) * (n + 1) * (n - 1) - tsum) AS den
        |  FROM rs a JOIN rs b ON a.grp < b.grp CROSS JOIN tot CROSS JOIN ties),
        |zz AS (SELECT grp_a, grp_b, na, nb,
        |    CAST(num // den AS BIGINT) AS z2_e6
        |  FROM pr),
        |rk AS (SELECT a.grp_a, a.grp_b, a.na, a.nb, a.z2_e6,
        |    CAST(1 + count(CASE WHEN bb.z2_e6 > a.z2_e6
        |          OR (bb.z2_e6 = a.z2_e6
        |              AND (bb.grp_a || '|' || bb.grp_b) < (a.grp_a || '|' || a.grp_b))
        |          THEN 1 END) AS BIGINT) AS rk
        |  FROM zz a CROSS JOIN zz bb GROUP BY 1, 2, 3, 4, 5),
        |lad AS (SELECT * FROM (VALUES
        |  (1,7879439),(2,6634897),(3,5916468),(4,5411894),(5,5023886),
        |  (6,4709292),(7,4445175),(8,4217885),(9,4018640),(10,3841459))
        |  AS t(rk, q_e6)),
        |fl AS (SELECT rk.*, CASE WHEN rk.z2_e6 >= lad.q_e6 THEN 1 ELSE 0 END
        |         AS at_rung
        |       FROM rk JOIN lad ON rk.rk = lad.rk),
        |kk AS (SELECT coalesce(max(CASE WHEN at_rung = 1 THEN rk END), 0) AS k
        |       FROM fl)
        |SELECT grp_a, grp_b, na, nb, z2_e6, rk,
        |  CAST(CASE WHEN rk <= k THEN 1 ELSE 0 END AS BIGINT) AS reject
        |FROM fl CROSS JOIN kk ORDER BY rk""".stripMargin
    ) { (s, d) =>
      import s.implicits._
      val q = Tables.events(s, d)
        .select(col("event_type").as("grp"),
          round(col("value") * 100).cast("long").as("v"))
      val gc = q.groupBy("grp", "v").agg(count(lit(1)).as("c"))
      val vc = gc.groupBy("v").agg(sum("c").as("t"))
      val cum = Blocked.cumulative(vc, Seq(col("v")), Seq("t"))
        .withColumn("cumlt", col("cum_t") - col("t"))
        .select("v", "t", "cumlt")
      val d38 = "decimal(38,0)"
      def fdiv(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
        (num - pmod(num, den)) / den // non-negative operands — exact floor
      val rs0 = gc.join(cum, Seq("v"))
        .groupBy("grp")
        .agg(sum("c").as("n_g"),
          sum(col("c").cast(d38)
            * (lit(2) * col("cumlt") + col("t") + 1)).as("u2"))
      val rs = rs0
        .withColumn("m",
          fdiv(col("u2") * 1000000, col("n_g").cast(d38)).cast(d38))
        .localCheckpoint(true) // both sides of the pair join + totals
      val tot = rs.agg(sum("n_g").as("n"))
      val ties = vc.agg(
        sum(col("t").cast(d38) * col("t") * col("t") - col("t")).as("tsum"))
      val md = col("m") - col("mb")
      val pr = rs.as("a")
        .join(rs.select(col("grp").as("grp_b"), col("n_g").as("nb"),
          col("m").as("mb")), col("grp") < col("grp_b"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(ties))
        .select(col("grp").as("grp_a"), col("grp_b"),
          col("n_g").as("na"), col("nb"),
          (lit(3).cast(d38) * (col("n") - 1)
            * fdiv(md * md, lit(1000000).cast(d38)).cast(d38)
            * col("n_g") * col("nb")).as("num"),
          ((col("n_g") + col("nb")).cast(d38)
            * (col("n").cast(d38) * (col("n") + 1) * (col("n") - 1)
              - col("tsum"))).as("den"))
      val zz = pr.select(col("grp_a"), col("grp_b"), col("na"), col("nb"),
        fdiv(col("num"), col("den")).cast("long").as("z2_e6"))
        .localCheckpoint(true) // both sides of the 10×10 rank join
      val key = concat(col("grp_a"), lit("|"), col("grp_b"))
      val rk = zz
        .crossJoin(zz.select(col("z2_e6").as("bz"),
          concat(col("grp_a"), lit("|"), col("grp_b")).as("bk")))
        .groupBy("grp_a", "grp_b", "na", "nb", "z2_e6")
        .agg((lit(1) + count(when(col("bz") > col("z2_e6")
          || (col("bz") === col("z2_e6") && col("bk") < key), 1)))
          .cast("long").as("rk"))
      val ladder = Seq(
        1L -> 7879439L, 2L -> 6634897L, 3L -> 5916468L, 4L -> 5411894L,
        5L -> 5023886L, 6L -> 4709292L, 7L -> 4445175L, 8L -> 4217885L,
        9L -> 4018640L, 10L -> 3841459L).toDF("rk", "q_e6")
      val fl = rk.join(broadcast(ladder), Seq("rk"))
        .withColumn("at_rung",
          when(col("z2_e6") >= col("q_e6"), 1L).otherwise(0L))
      val kk = fl.agg(coalesce(
        max(when(col("at_rung") === 1, col("rk"))), lit(0L)).as("k"))
      fl.crossJoin(broadcast(kk))
        .select(col("grp_a"), col("grp_b"), col("na"), col("nb"),
          col("z2_e6"), col("rk"),
          when(col("rk") <= col("k"), 1L).otherwise(0L).as("reject"))
        .orderBy("rk")
    }
  )
}
