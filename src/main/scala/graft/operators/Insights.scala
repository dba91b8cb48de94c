package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Customer-lifecycle and market-structure readouts (r4, session 6):
  * frequent-itemset association rules, Kaplan–Meier survival, and the
  * join-key skew report — three analytic families the earlier catalogs
  * (TPC-H staples, concentration indices, hypothesis tests) did not yet
  * cover.
  *
  * Float discipline per SURVEY.md §5: supports/confidences/lifts are
  * integral permille/ppm via DIV; the KM survival estimate is the one
  * float in the file and is built from correctly-rounded IEEE division
  * plus a FIXED-ORDER left-fold product, so even it hash-matches
  * bit-for-bit (no rounding needed — see q93's comment).
  *
  * Reference intent: dias-hbp-sp8/Distributed-Query-Engine exposes
  * declarative SQL over warehouse sources (DistributedQueryEngine.diff,
  * RDBMSPushdown hunk); these are the standard beyond-TPC-H analyst
  * queries over that same relational surface.
  */
object Insights {

  val catalog: Seq[Q] = Seq(
    // R100 — market-basket association rules with A-priori pruning.
    // Baskets = orders, items = part brands (lineitem ⨝ broadcast part).
    // The scale design IS A-priori: items below min-support are pruned
    // BEFORE the pair self-join (support is anti-monotone — no pair of
    // infrequent items can be frequent), so the join fans out only on
    // frequent items; fan-out per basket is (items/basket choose 2),
    // bounded by basket width, never corpus². Metrics are exact
    // integers: support/confidence permille by DIV, lift in ppm through
    // decimal(38,0) (np·nb products overflow long at lake-scale basket
    // counts; DuckDB HUGEINT twin).
    Q(
      "q92_basket_rules",
      """WITH it AS (
        |  SELECT DISTINCT l_orderkey AS ok, p_brand AS item
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |nb AS (SELECT count(DISTINCT ok) AS nb FROM it),
        |cnt AS (SELECT item, count(*) AS n FROM it GROUP BY 1),
        |freq AS (SELECT item, n FROM cnt, nb WHERE n * 50 >= nb),
        |fit AS (SELECT ok, item FROM it WHERE item IN (SELECT item FROM freq)),
        |pr AS (
        |  SELECT a.item AS b1, b.item AS b2, count(*) AS np
        |  FROM fit a JOIN fit b ON a.ok = b.ok AND a.item < b.item
        |  GROUP BY 1, 2)
        |SELECT b1, b2, np,
        |  (np * 1000) // nb.nb AS support_permille,
        |  (np * 1000) // f1.n AS conf_permille,
        |  CAST((CAST(np AS HUGEINT) * 1000000 * nb.nb)
        |       // (CAST(f1.n AS HUGEINT) * f2.n) AS BIGINT) AS lift_ppm
        |FROM pr
        |  JOIN freq f1 ON pr.b1 = f1.item
        |  JOIN freq f2 ON pr.b2 = f2.item, nb
        |WHERE (np * 1000) // nb.nb >= 5
        |ORDER BY b1, b2""".stripMargin
    ) { (s, d) =>
      val it = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("item"))
        .distinct()
        // consumed by the basket count, the item counts, and BOTH sides
        // of the pair self-join — without the pin the scan+join+distinct
        // subtree runs four times
        .localCheckpoint(true)
      val nb = it.agg(countDistinct("ok").as("nb"))
      val cnt = it.groupBy("item").agg(count(lit(1)).as("n"))
      // A-priori prune: integral min-support test (n/nb >= 2%)
      val freq = cnt.crossJoin(broadcast(nb)).filter(col("n") * 50 >= col("nb"))
        .select("item", "n").localCheckpoint(true)
      val fit = it.join(broadcast(freq.select("item")), Seq("item"))
      val pr = fit.as("a")
        .join(fit.as("b"),
          col("a.ok") === col("b.ok") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("b1"), col("b.item").as("b2"))
        .agg(count(lit(1)).as("np"))
      pr.join(broadcast(freq.withColumnRenamed("item", "b1")
            .withColumnRenamed("n", "n1")), Seq("b1"))
        .join(broadcast(freq.withColumnRenamed("item", "b2")
            .withColumnRenamed("n", "n2")), Seq("b2"))
        .crossJoin(broadcast(nb))
        .select(col("b1"), col("b2"), col("np"),
          expr("(np * 1000) DIV nb").as("support_permille"),
          expr("(np * 1000) DIV n1").as("conf_permille"),
          // integral DIV on decimals (truncating, like DuckDB's // on
          // HUGEINT) — a decimal `/` would HALF_UP-round to scale 6
          // first, which can land one above the floor at edge quotients
          expr("""(CAST(np AS DECIMAL(38,0)) * 1000000 * nb)
                 | DIV (CAST(n1 AS DECIMAL(38,0)) * n2)""".stripMargin)
            .as("lift_ppm"))
        .filter(col("support_permille") >= 5)
        .orderBy("b1", "b2")
    },

    // R101 — Kaplan–Meier survival over customer inter-order gaps, per
    // market segment. Observations: each consecutive-order gap is an
    // EVENT ("next order after t days"); each customer's last order is
    // CENSORED at the global observation end (max order date). S(t) =
    // Π_{u≤t, events} (n_u − d_u)/n_u with n_u = at-risk count (dur ≥ u).
    // EXACT despite being float-valued: every ratio is one IEEE
    // correctly-rounded division of exact longs, and the product is a
    // FIXED-ORDER left fold over the t-ascending ratio list (Spark
    // `aggregate` HOF / DuckDB `list_reduce`, both seeded so the first
    // step is exact) — sequential correctly-rounded multiplies are
    // bit-identical across engines, unlike a reassociating float SUM of
    // logs. Shuffle shape: one custkey window pass over ORDERS (never
    // the fact), then all windows run on the per-(segment, dur)
    // aggregate — |distinct durations| rows, bounded by the date domain
    // regardless of order count.
    Q(
      "q93_kaplan_meier",
      """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS mend FROM orders),
        |seq AS (
        |  SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS od,
        |    lead(CAST(o_orderdate AS DATE)) OVER (
        |      PARTITION BY o_custkey
        |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS nxt
        |  FROM orders),
        |obs AS (
        |  SELECT c_mktsegment AS seg,
        |    CASE WHEN nxt IS NULL THEN date_diff('day', od, mend)
        |         ELSE date_diff('day', od, nxt) END AS dur,
        |    CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
        |  FROM seq JOIN customer ON ck = c_custkey, mx),
        |cell AS (
        |  SELECT seg, dur, CAST(sum(ev) AS BIGINT) AS d,
        |    count(*) AS call FROM obs GROUP BY 1, 2),
        |risk AS (
        |  SELECT seg, dur, d,
        |    CAST(sum(call) OVER (PARTITION BY seg ORDER BY dur DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
        |  FROM cell),
        |km AS (
        |  SELECT seg, dur, d, n,
        |    CAST(n - d AS DOUBLE) / CAST(n AS DOUBLE) AS ratio
        |  FROM risk WHERE d > 0),
        |fold AS (
        |  SELECT seg, dur, d, n,
        |    list(ratio) OVER (PARTITION BY seg ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rs
        |  FROM km)
        |SELECT seg, dur AS t, d, n,
        |  list_reduce(rs, (acc, x) -> acc * x) AS survival
        |FROM fold ORDER BY seg, t""".stripMargin
    ) { (s, d) =>
      val orders = Tables.orders(s, d)
        .select(col("o_custkey").as("ck"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("od"))
      val mend = orders.agg(max("od").as("mend"))
      val wSeq = Window.partitionBy("ck").orderBy(col("od"), col("o_orderkey"))
      val obs = orders
        .withColumn("nxt", lead("od", 1).over(wSeq))
        .crossJoin(broadcast(mend))
        // honest key shuffle for customer (q53's lesson: the customer
        // dimension does NOT broadcast at 100 TB)
        .join(Tables.customer(s, d), col("ck") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          when(col("nxt").isNull, datediff(col("mend"), col("od")))
            .otherwise(datediff(col("nxt"), col("od"))).cast("long").as("dur"),
          when(col("nxt").isNull, 0L).otherwise(1L).as("ev"))
      val cell = obs.groupBy("seg", "dur")
        .agg(sum("ev").as("d"), count(lit(1)).as("call"))
      val wRisk = Window.partitionBy("seg").orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val km = cell
        .withColumn("n", sum("call").over(wRisk))
        .filter(col("d") > 0)
        .withColumn("ratio",
          (col("n") - col("d")).cast("double") / col("n").cast("double"))
      val wFold = Window.partitionBy("seg").orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      km.withColumn("rs", collect_list("ratio").over(wFold))
        .select(col("seg"), col("dur").as("t"), col("d"), col("n"),
          expr("aggregate(rs, CAST(1.0 AS DOUBLE), (acc, x) -> acc * x)")
            .as("survival"))
        .orderBy("seg", "t")
    },

    // R103b — cohort lifetime-value matrix: the acquisition-month ×
    // account-age revenue triangle (ev7's retention counts, upgraded to
    // money). Cohort = month of the customer's FIRST order (one custkey
    // aggregate over ORDERS), joined back by an honest custkey shuffle;
    // ages and cohorts are INTEGER month indices (y·12+m — identical
    // arithmetic both engines, no interval types), revenue in exact
    // cents. Output is cohortsxages cells, bounded by the calendar, not
    // the order count.
    Q(
      "q95_cohort_ltv",
      """WITH fo AS (
        |  SELECT o_custkey AS ck,
        |    min(year(o_orderdate) * 12 + month(o_orderdate)) AS cm
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT cm,
        |    (year(o_orderdate) * 12 + month(o_orderdate)) - cm AS age,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_custkey
        |  FROM orders JOIN fo ON o_custkey = ck)
        |SELECT cm AS cohort_month, age,
        |  CAST(sum(cents) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_active
        |FROM j GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val mcol = year(col("o_orderdate")) * 12 + month(col("o_orderdate"))
      val orders = Tables.orders(s, d)
        .select(col("o_custkey"), mcol.as("om"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val fo = orders.groupBy(col("o_custkey").as("ck"))
        .agg(min("om").as("cm"))
      orders.join(fo, col("o_custkey") === col("ck"))
        .groupBy(col("cm").as("cohort_month"), (col("om") - col("cm")).as("age"))
        .agg(sum("cents").as("revenue_cents"), count(lit(1)).as("n_orders"),
          countDistinct("o_custkey").as("n_active"))
        .orderBy("cohort_month", "age")
    },

    // R104 — deterministic Poisson-bootstrap confidence intervals: the
    // uncertainty-quantification readout none of the point-estimate
    // entries carry. B=32 resample replicates in ONE scan — each row's
    // per-replicate weight is Poisson(1) drawn by inverting the CDF on
    // a 16-bit md5 hash slice (the repo's cross-engine salted-hash
    // idiom), so the "randomness" is a pure function of (orderkey,
    // replicate): retry-stable, layout-invariant, identical on both
    // engines. The CDF ladder is EIGHT fixed hex-string thresholds
    // (lowercase-hex string order = numeric order — no conv()/float
    // anywhere); replicate sums are exact cents map-side-combined to
    // B×|groups| cells, and the 90% CI is an order statistic (2nd and
    // 31st of 32) — integer row_number, no percentile interpolation.
    // The B× row fan-out is aggregate INPUT (one pass, map-side
    // combine), never a shuffle multiplier — the standard one-pass
    // Poisson bootstrap at lake scale.
    Q(
      "q96_bootstrap_ci",
      """WITH w AS (
        |  SELECT o_orderpriority AS grp, b,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
        |    (CASE WHEN h >= '5e2d' THEN 1 ELSE 0 END +
        |     CASE WHEN h >= 'bc5b' THEN 1 ELSE 0 END +
        |     CASE WHEN h >= 'eb71' THEN 1 ELSE 0 END +
        |     CASE WHEN h >= 'fb23' THEN 1 ELSE 0 END +
        |     CASE WHEN h >= 'ff10' THEN 1 ELSE 0 END +
        |     CASE WHEN h >= 'ffd9' THEN 1 ELSE 0 END +
        |     CASE WHEN h >= 'fffa' THEN 1 ELSE 0 END +
        |     CASE WHEN h >= 'ffff' THEN 1 ELSE 0 END) AS wt
        |  FROM (
        |    SELECT o_orderpriority, o_totalprice, b,
        |      substring(md5(CAST(o_orderkey AS VARCHAR) || ':' ||
        |                    CAST(b AS VARCHAR) || ':boot'), 1, 4) AS h
        |    FROM orders CROSS JOIN (SELECT unnest(range(32)) AS b))),
        |reps AS (
        |  SELECT grp, b, CAST(sum(wt * cents) AS BIGINT) AS stat
        |  FROM w GROUP BY 1, 2),
        |ranked AS (
        |  SELECT grp, stat,
        |    row_number() OVER (PARTITION BY grp ORDER BY stat, b) AS rn
        |  FROM reps),
        |base AS (
        |  SELECT o_orderpriority AS grp,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS point_cents
        |  FROM orders GROUP BY 1)
        |SELECT base.grp, point_cents,
        |  max(CASE WHEN rn = 2 THEN stat END) AS ci_lo_cents,
        |  max(CASE WHEN rn = 31 THEN stat END) AS ci_hi_cents
        |FROM base JOIN ranked ON base.grp = ranked.grp
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val orders = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority").as("grp"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val thresholds = Seq("5e2d", "bc5b", "eb71", "fb23",
        "ff10", "ffd9", "fffa", "ffff")
      val exploded = orders
        .withColumn("b", explode(sequence(lit(0), lit(31))))
        .withColumn("h", substring(md5(concat(
          col("o_orderkey").cast("string"), lit(":"),
          col("b").cast("string"), lit(":boot")).cast("binary")), 1, 4))
      val wt = thresholds
        .map(t => when(col("h") >= t, 1L).otherwise(0L))
        .reduce(_ + _)
      val reps = exploded.withColumn("wt", wt)
        .groupBy("grp", "b").agg(sum(col("wt") * col("cents")).as("stat"))
      val wRank = Window.partitionBy("grp").orderBy(col("stat"), col("b"))
      val ranked = reps.withColumn("rn", row_number().over(wRank))
      val base = orders.groupBy("grp").agg(sum("cents").as("point_cents"))
      base.join(ranked, Seq("grp"))
        .groupBy("grp", "point_cents")
        .agg(max(when(col("rn") === 2, col("stat"))).as("ci_lo_cents"),
          max(when(col("rn") === 31, col("stat"))).as("ci_hi_cents"))
        .orderBy("grp")
    },

    // R102 — join-key skew report: the diagnostic an engineer runs
    // BEFORE choosing between AQE skew split (R33b) and explicit
    // salting (R33). One fixed-width key aggregate, then a bounded
    // TakeOrdered top-10 (tie-broken by key for determinism) and a
    // 1-row summary: hottest-key multiple of the uniform share (ppm)
    // and top-10 concentration (permille) — all integral.
    Q(
      "q94_key_skew",
      """WITH kc AS (
        |  SELECT l_orderkey AS k, count(*) AS cnt FROM lineitem GROUP BY 1),
        |top AS (SELECT cnt FROM kc ORDER BY cnt DESC, k LIMIT 10),
        |agg AS (
        |  SELECT count(*) AS n_keys, CAST(sum(cnt) AS BIGINT) AS n_rows,
        |    max(cnt) AS max_cnt
        |  FROM kc)
        |SELECT n_keys, n_rows, max_cnt,
        |  CAST((CAST(max_cnt AS HUGEINT) * n_keys * 1000000) // n_rows
        |    AS BIGINT) AS hot_vs_uniform_ppm,
        |  ((SELECT CAST(sum(cnt) AS BIGINT) FROM top) * 1000) // n_rows
        |    AS top10_share_permille
        |FROM agg""".stripMargin
    ) { (s, d) =>
      val kc = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("cnt"))
        // consumed by the top-10 and the summary aggregate
        .localCheckpoint(true)
      val top = kc.orderBy(col("cnt").desc, col("k")).limit(10)
        .agg(sum("cnt").as("top10"))
      kc.agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"),
          max("cnt").as("max_cnt"))
        .crossJoin(broadcast(top))
        .select(col("n_keys"), col("n_rows"), col("max_cnt"),
          expr("(CAST(max_cnt AS DECIMAL(38,0)) * n_keys * 1000000) DIV n_rows")
            .as("hot_vs_uniform_ppm"),
          expr("(top10 * 1000) DIV n_rows").as("top10_share_permille"))
    },

    // R119 — largest-remainder proration: allocate each order's total
    // cents across its lineitems proportionally to quantity so that
    // Σ alloc = total EXACTLY (floor shares + distribute the remainder
    // to the largest fractional parts) — the financial-allocation
    // primitive naive rounding gets wrong by ±n cents. All integer;
    // two windows per order key, one shuffle. The synthetic lineitem
    // has duplicate (orderkey, linenumber) rows: full-duplicate ties in
    // the remainder rank land inside the same output group either way,
    // so the per-(ok, ln) SUM is deterministic (and the spec pins the
    // Σ alloc = total invariant).
    Q(
      "q97_allocation",
      """WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
        |    CAST(l_quantity AS BIGINT) AS q, l_extendedprice AS ep
        |  FROM lineitem WHERE l_orderkey < 400),
        |o AS (SELECT o_orderkey AS ok,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS total
        |  FROM orders WHERE o_orderkey < 400),
        |x AS (SELECT li.ok, ln, q, ep, total,
        |    sum(q) OVER (PARTITION BY li.ok) AS sq
        |  FROM li JOIN o ON li.ok = o.ok),
        |y AS (SELECT ok, ln, q, ep, total, sq,
        |    (total * q) // sq AS base, (total * q) % sq AS frac FROM x),
        |z AS (SELECT *,
        |    row_number() OVER (PARTITION BY ok
        |      ORDER BY frac DESC, ln, q, ep) AS rk,
        |    total - sum(base) OVER (PARTITION BY ok) AS rem FROM y)
        |SELECT ok, ln,
        |  CAST(sum(base + CASE WHEN rk <= rem THEN 1 ELSE 0 END) AS BIGINT)
        |    AS alloc_cents
        |FROM z GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") < 400)
        .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          col("l_quantity").cast("long").as("q"), col("l_extendedprice").as("ep"))
      val o = Tables.orders(s, d).filter(col("o_orderkey") < 400)
        .select(col("o_orderkey").as("ok"),
          round(col("o_totalprice") * 100).cast("long").as("total"))
      val byOk = Window.partitionBy("ok")
      val x = li.join(o, "ok").withColumn("sq", sum("q").over(byOk))
      val y = x.withColumn("base", expr("(total * q) DIV sq"))
        .withColumn("frac", expr("(total * q) % sq"))
      val z = y.withColumn("rk", row_number().over(
          byOk.orderBy(col("frac").desc, col("ln"), col("q"), col("ep"))))
        .withColumn("rem", col("total") - sum("base").over(byOk))
      z.groupBy("ok", "ln")
        .agg(sum(col("base") + when(col("rk") <= col("rem"), 1L).otherwise(0L))
          .as("alloc_cents"))
        .orderBy("ok", "ln")
    },

    // R120 — top-N + Other rollup: the BI report shape (top 5 brands by
    // exact-cent revenue, everything else folded into one row). The
    // global window runs over the ~25-row brand AGGREGATE, never the
    // fact table.
    Q(
      "q98_top5_other",
      """WITH rev AS (SELECT p_brand,
        |    sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
        |rk AS (SELECT p_brand, cents,
        |    row_number() OVER (ORDER BY cents DESC, p_brand) AS r FROM rev)
        |SELECT CASE WHEN r <= 5 THEN p_brand ELSE 'Other' END AS brand,
        |  CAST(sum(cents) AS BIGINT) AS cents
        |FROM rk GROUP BY 1 ORDER BY cents DESC, brand""".stripMargin
    ) { (s, d) =>
      val rev = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("cents"))
      rev.withColumn("r", row_number().over(
          Window.orderBy(col("cents").desc, col("p_brand"))))
        .groupBy(when(col("r") <= 5, col("p_brand")).otherwise("Other").as("brand"))
        .agg(sum("cents").as("cents"))
        .orderBy(col("cents").desc, col("brand"))
    },

    // R122 — FIFO cost of goods sold via cumulative-interval matching:
    // per part, supply lots (non-returned lineitems in ship order)
    // consume aggregate returned-demand first-in-first-out. The
    // sequential "walk the lots until demand is filled" becomes pure
    // window algebra: lot i fills clamp(demand − cum_{i−1}, 0, q_i)
    // units — ONE running-sum window + greatest/least, no iteration,
    // no per-row state. Exact integer cents (truncating unit cost).
    // Duplicate fact rows are order-ambiguous between themselves but
    // contribute identical (q, unit_c), so every aggregate is
    // order-invariant — spec pins equality with a sequential fold.
    Q(
      "q99_fifo_cogs",
      """WITH lots AS (SELECT l_partkey AS pk, CAST(l_quantity AS BIGINT) AS q,
        |    CAST(round(l_extendedprice*100) AS BIGINT)
        |      // CAST(l_quantity AS BIGINT) AS unit_c,
        |    l_shipdate, l_orderkey, l_linenumber
        |  FROM lineitem WHERE l_returnflag <> 'R'),
        |dem AS (SELECT l_partkey AS pk, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS demand
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
        |c AS (SELECT pk, q, unit_c,
        |    sum(q) OVER (PARTITION BY pk
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber, unit_c
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM lots),
        |j AS (SELECT c.pk, demand,
        |    greatest(least(q, demand - (cum - q)), 0) AS used, unit_c
        |  FROM c JOIN dem ON c.pk = dem.pk)
        |SELECT pk, CAST(max(demand) AS BIGINT) AS demand,
        |  CAST(sum(used) AS BIGINT) AS filled_qty,
        |  CAST(sum(used * unit_c) AS BIGINT) AS cogs_cents
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val lots = li.filter(col("l_returnflag") =!= "R")
        .select(col("l_partkey").as("pk"),
          col("l_quantity").cast("long").as("q"),
          expr("CAST(round(l_extendedprice*100) AS BIGINT) DIV CAST(l_quantity AS BIGINT)")
            .as("unit_c"),
          col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val dem = li.filter(col("l_returnflag") === "R")
        .groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("long")).as("demand"))
      val c = lots.withColumn("cum", sum("q").over(
        Window.partitionBy("pk")
          .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "unit_c")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      c.join(dem, "pk")
        .withColumn("used",
          greatest(least(col("q"), col("demand") - (col("cum") - col("q"))), lit(0L)))
        .groupBy("pk")
        .agg(max("demand").as("demand"), sum("used").as("filled_qty"),
          sum(col("used") * col("unit_c")).as("cogs_cents"))
        .orderBy("pk")
    },

    // R123 — business-day latency histogram: order→ship latency in
    // Mon–Fri days via pure epoch arithmetic. Engine DOW conventions
    // differ (DuckDB Sunday=0, Spark Sunday=1) — instead f(d) counts
    // business days from a fixed MONDAY anchor (1969-12-29) in closed
    // form, (n÷7)·5 + min(n mod 7, 5), and the latency is f(ship) −
    // f(order): exact integers, no dow() call, identical everywhere.
    Q(
      "q100_business_latency",
      """WITH j AS (SELECT
        |    date_diff('day', DATE '1969-12-29', CAST(o_orderdate AS DATE)) AS a,
        |    date_diff('day', DATE '1969-12-29', CAST(l_shipdate AS DATE)) AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |f AS (SELECT ((b // 7) * 5 + least(b % 7, 5))
        |           - ((a // 7) * 5 + least(a % 7, 5)) AS bd FROM j)
        |SELECT bd, count(*) AS n FROM f GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val j = Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(
          datediff(col("o_orderdate").cast("date"), lit("1969-12-29").cast("date"))
            .cast("long").as("a"),
          datediff(col("l_shipdate").cast("date"), lit("1969-12-29").cast("date"))
            .cast("long").as("b"))
      j.select((expr("(b DIV 7) * 5 + least(b % 7, 5)")
          - expr("(a DIV 7) * 5 + least(a % 7, 5)")).as("bd"))
        .groupBy("bd").agg(count(lit(1)).as("n"))
        .orderBy("bd")
    },

    // R140 — Nelson-Aalen cumulative hazard over q93's censored
    // inter-order gaps: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ, the additive twin of
    // Kaplan-Meier's product (and the better-behaved estimator when
    // risk sets get small). Same one-window + one-aggregate shape as
    // q93 — gaps from a per-customer lead(), (seg, dur) cells, risk
    // sets from a reverse cumulative sum over the CELL frame (bounded
    // by distinct durations, never the order count). Each hazard
    // increment is floor-quantized by pure integer DIV to a 1e6-unit
    // BIGINT (no float boundary anywhere), so the cumulative sum is
    // EXACT and the displayed hazard is one final division.
    Q(
      "q103_nelson_aalen",
      """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS mend FROM orders),
        |seq AS (
        |  SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS od,
        |    lead(CAST(o_orderdate AS DATE)) OVER (
        |      PARTITION BY o_custkey
        |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS nxt
        |  FROM orders),
        |obs AS (
        |  SELECT c_mktsegment AS seg,
        |    CASE WHEN nxt IS NULL THEN date_diff('day', od, mend)
        |         ELSE date_diff('day', od, nxt) END AS dur,
        |    CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
        |  FROM seq JOIN customer ON ck = c_custkey, mx),
        |cell AS (
        |  SELECT seg, dur, CAST(sum(ev) AS BIGINT) AS d,
        |    count(*) AS call FROM obs GROUP BY 1, 2),
        |risk AS (
        |  SELECT seg, dur, d,
        |    CAST(sum(call) OVER (PARTITION BY seg ORDER BY dur DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
        |  FROM cell),
        |inc AS (
        |  SELECT seg, dur, d, n, (1000000 * d) // n AS h_e6
        |  FROM risk WHERE d > 0)
        |SELECT seg, dur AS t, d, n,
        |  CAST(sum(h_e6) OVER (PARTITION BY seg ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS chaz_e6,
        |  CAST(sum(h_e6) OVER (PARTITION BY seg ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / 1000000 AS cum_hazard
        |FROM inc ORDER BY seg, t""".stripMargin
    ) { (s, d) =>
      val orders = Tables.orders(s, d)
        .select(col("o_custkey").as("ck"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("od"))
      val mend = orders.agg(max("od").as("mend"))
      val wSeq = Window.partitionBy("ck").orderBy(col("od"), col("o_orderkey"))
      val obs = orders
        .withColumn("nxt", lead("od", 1).over(wSeq))
        .crossJoin(broadcast(mend))
        // honest key shuffle for customer (q53/q93: the customer
        // dimension does NOT broadcast at 100 TB)
        .join(Tables.customer(s, d), col("ck") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          when(col("nxt").isNull, datediff(col("mend"), col("od")))
            .otherwise(datediff(col("nxt"), col("od"))).cast("long").as("dur"),
          when(col("nxt").isNull, 0L).otherwise(1L).as("ev"))
      val cell = obs.groupBy("seg", "dur")
        .agg(sum("ev").as("d"), count(lit(1)).as("call"))
      val wRisk = Window.partitionBy("seg").orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inc = cell
        .withColumn("n", sum("call").over(wRisk))
        .filter(col("d") > 0)
        .withColumn("h_e6", expr("(1000000 * d) DIV n"))
      val wCum = Window.partitionBy("seg").orderBy("dur")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      inc.withColumn("chaz_e6", sum("h_e6").over(wCum))
        .select(col("seg"), col("dur").as("t"), col("d"), col("n"),
          col("chaz_e6"),
          (col("chaz_e6").cast("double") / 1000000).as("cum_hazard"))
        .orderBy("seg", "t")
    },

    // R145 — log-rank test (do two survival curves differ?): the
    // hypothesis test q93's Kaplan-Meier and q103's Nelson-Aalen both
    // beg for. Arms = retail segments (AUTOMOBILE/BUILDING) vs the
    // rest, observations = q93's censored inter-order gaps. The
    // statistic needs n₁(t) at EVERY death time — including times where
    // arm 1 has no cell — so the (dur × arm) grid is completed first
    // (distinct-durations × 2, bounded by the latency domain, never the
    // order count) and risk sets are reverse-cumulative sums per arm
    // over that CELL grid. Each E₁(t)=n₁d/n and V(t)=d(n₁/n)(n₂/n)(n−d)
    // /(n−1) term is micro-quantized ONCE to a 1e6 BIGINT (tx19
    // discipline) so the sums are order-invariant and exact; O₁ is an
    // exact count; the chi-square is ONE double from the three exact
    // totals.
    Q(
      "q106_logrank",
      """WITH mx AS (SELECT max(CAST(o_orderdate AS DATE)) AS mend FROM orders),
        |seq AS (
        |  SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS od,
        |    lead(CAST(o_orderdate AS DATE)) OVER (
        |      PARTITION BY o_custkey
        |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS nxt
        |  FROM orders),
        |obs AS (
        |  SELECT CASE WHEN c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
        |              THEN 1 ELSE 0 END AS arm,
        |    CASE WHEN nxt IS NULL THEN date_diff('day', od, mend)
        |         ELSE date_diff('day', od, nxt) END AS dur,
        |    CASE WHEN nxt IS NULL THEN 0 ELSE 1 END AS ev
        |  FROM seq JOIN customer ON ck = c_custkey, mx),
        |cell AS (SELECT arm, dur, CAST(sum(ev) AS BIGINT) AS d,
        |           count(*) AS call FROM obs GROUP BY 1, 2),
        |grid AS (
        |  SELECT g.dur, a.arm, coalesce(c.d, 0) AS d, coalesce(c.call, 0) AS call
        |  FROM (SELECT DISTINCT dur FROM cell) g
        |  CROSS JOIN (SELECT unnest([0, 1]) AS arm) a
        |  LEFT JOIN cell c ON c.dur = g.dur AND c.arm = a.arm),
        |risk AS (
        |  SELECT dur, arm, d,
        |    CAST(sum(call) OVER (PARTITION BY arm ORDER BY dur DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
        |  FROM grid),
        |t AS (
        |  SELECT a1.dur, a1.d AS d1, a1.n AS n1,
        |    a1.d + a0.d AS d, a1.n + a0.n AS n
        |  FROM risk a1 JOIN risk a0 ON a1.dur = a0.dur
        |  WHERE a1.arm = 1 AND a0.arm = 0 AND a1.d + a0.d > 0 AND a1.n + a0.n > 1),
        |terms AS (
        |  SELECT d1,
        |    CAST(round(1000000 * CAST(n1 AS DOUBLE) * d / n) AS BIGINT) AS e_e6,
        |    CAST(round(1000000 * ((CAST(d AS DOUBLE) * n1 / n) * ((n - n1)::DOUBLE / n)
        |      * ((n - d)::DOUBLE / (n - 1)))) AS BIGINT) AS v_e6
        |  FROM t)
        |SELECT CAST(sum(d1) AS BIGINT) AS o1,
        |  CAST(sum(e_e6) AS BIGINT) AS e1_e6, CAST(sum(v_e6) AS BIGINT) AS v_e6,
        |  CAST(sum(d1) * 1000000 - sum(e_e6) AS DOUBLE)
        |    * CAST(sum(d1) * 1000000 - sum(e_e6) AS DOUBLE)
        |    / (CAST(1000000 AS DOUBLE) * sum(v_e6)) AS chi2
        |FROM terms""".stripMargin
    ) { (s, d) =>
      val orders = Tables.orders(s, d)
        .select(col("o_custkey").as("ck"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("od"))
      val mend = orders.agg(max("od").as("mend"))
      val wSeq = Window.partitionBy("ck").orderBy(col("od"), col("o_orderkey"))
      val obs = orders
        .withColumn("nxt", lead("od", 1).over(wSeq))
        .crossJoin(broadcast(mend))
        .join(Tables.customer(s, d), col("ck") === col("c_custkey"))
        .select(
          when(col("c_mktsegment").isin("AUTOMOBILE", "BUILDING"), 1L)
            .otherwise(0L).as("arm"),
          when(col("nxt").isNull, datediff(col("mend"), col("od")))
            .otherwise(datediff(col("nxt"), col("od"))).cast("long").as("dur"),
          when(col("nxt").isNull, 0L).otherwise(1L).as("ev"))
      val cell = obs.groupBy("arm", "dur")
        .agg(sum("ev").as("d"), count(lit(1)).as("call"))
        .localCheckpoint(true) // grid spine + both completed arms read it
      val grid = cell.select("dur").distinct()
        .crossJoin(s.range(0, 2).select(col("id").as("arm")))
        .join(cell, Seq("dur", "arm"), "left")
        .select(col("dur"), col("arm"),
          coalesce(col("d"), lit(0L)).as("d"),
          coalesce(col("call"), lit(0L)).as("call"))
      val wRisk = Window.partitionBy("arm").orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val risk = grid.withColumn("n", sum("call").over(wRisk))
      val a1 = risk.filter(col("arm") === 1)
        .select(col("dur"), col("d").as("d1"), col("n").as("n1"))
      val a0 = risk.filter(col("arm") === 0)
        .select(col("dur"), col("d").as("d0"), col("n").as("n0"))
      val t = a1.join(a0, "dur")
        .select(col("d1"), col("n1"),
          (col("d1") + col("d0")).as("d"), (col("n1") + col("n0")).as("n"))
        .filter(col("d") > 0 && col("n") > 1)
      val terms = t.select(col("d1"),
        round(lit(1000000) * col("n1").cast("double") * col("d") / col("n"))
          .cast("long").as("e_e6"),
        round(lit(1000000) * ((col("d").cast("double") * col("n1") / col("n"))
          * ((col("n") - col("n1")).cast("double") / col("n"))
          * ((col("n") - col("d")).cast("double") / (col("n") - 1))))
          .cast("long").as("v_e6"))
      terms.agg(sum("d1").as("o1"), sum("e_e6").as("e1_e6"), sum("v_e6").as("v_e6"))
        .select(col("o1"), col("e1_e6"), col("v_e6"),
          ((col("o1") * 1000000 - col("e1_e6")).cast("double")
            * (col("o1") * 1000000 - col("e1_e6")).cast("double")
            / (lit(1000000).cast("double") * col("v_e6"))).as("chi2"))
    },

    // R148 — revenue bridge / mix-shift decomposition: q104 says
    // revenue moved month-over-month; THIS says which segment drove it
    // and whether by VOLUME (order count) or RATE (average ticket).
    // Between the last two months on the calendar: per segment,
    // volume effect = Δn·avg₁ and rate effect = n₂·Δavg, with the
    // average micro-quantized ONCE ((1e6·rev) DIV n — floor on
    // non-negatives, identical both engines) so both effects are exact
    // integer products in e6·cents; the residual column reconciles to
    // the exact Δrev·1e6 (the bridge provably adds up — BI tools fudge
    // this, the engine doesn't). Segments absent from a month enter
    // with n=0 via the full grid. All frames are segment-sized.
    Q(
      "q107_mix_shift",
      """WITH m AS (
        |  SELECT c_mktsegment AS seg,
        |    year(CAST(o_orderdate AS DATE)) * 12
        |      + month(CAST(o_orderdate AS DATE)) - 1 AS mi,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |mx AS (SELECT max(mi) AS m2 FROM m),
        |grid AS (
        |  SELECT s.seg, x.mi,
        |    coalesce(m.n, 0) AS n, coalesce(m.rev, 0) AS rev
        |  FROM (SELECT DISTINCT seg FROM m) s
        |  CROSS JOIN (SELECT unnest([(SELECT m2 - 1 FROM mx),
        |                             (SELECT m2 FROM mx)]) AS mi) x
        |  LEFT JOIN m ON m.seg = s.seg AND m.mi = x.mi),
        |q AS (SELECT seg, mi, n, rev,
        |        CASE WHEN n = 0 THEN 0 ELSE (1000000 * rev) // n END AS avg_e6
        |      FROM grid),
        |pair AS (
        |  SELECT a.seg, a.n AS n1, a.rev AS rev1, a.avg_e6 AS avg1_e6,
        |         b.n AS n2, b.rev AS rev2, b.avg_e6 AS avg2_e6
        |  FROM q a JOIN q b ON a.seg = b.seg AND b.mi = a.mi + 1)
        |SELECT seg, n1, n2, rev1, rev2,
        |  CAST((n2 - n1) * avg1_e6 AS BIGINT) AS volume_effect_e6,
        |  CAST(n2 * (avg2_e6 - avg1_e6) AS BIGINT) AS rate_effect_e6,
        |  CAST((rev2 - rev1) * 1000000
        |    - (n2 - n1) * avg1_e6 - n2 * (avg2_e6 - avg1_e6) AS BIGINT)
        |    AS residual_e6
        |FROM pair ORDER BY seg""".stripMargin
    ) { (s, d) =>
      val m = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("seg"),
          (year(col("o_orderdate").cast("date")) * 12
            + month(col("o_orderdate").cast("date")) - 1).as("mi"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
        .localCheckpoint(true) // grid spine + both month slices read it
      val mx = m.agg(max("mi").as("m2"))
      val grid = m.select("seg").distinct()
        .crossJoin(broadcast(mx))
        .select(col("seg"), explode(array(col("m2") - 1, col("m2"))).as("mi"))
        .join(m, Seq("seg", "mi"), "left")
        .select(col("seg"), col("mi"),
          coalesce(col("n"), lit(0L)).as("n"),
          coalesce(col("rev"), lit(0L)).as("rev"))
      val q = grid.withColumn("avg_e6",
        when(col("n") === 0, 0L).otherwise(expr("(1000000 * rev) DIV n")))
      val a = q.select(col("seg"), col("mi"), col("n").as("n1"),
        col("rev").as("rev1"), col("avg_e6").as("avg1_e6"))
      val b = q.select(col("seg"), (col("mi") - 1).as("mi"), col("n").as("n2"),
        col("rev").as("rev2"), col("avg_e6").as("avg2_e6"))
      a.join(b, Seq("seg", "mi"))
        .select(col("seg"), col("n1"), col("n2"), col("rev1"), col("rev2"),
          ((col("n2") - col("n1")) * col("avg1_e6")).as("volume_effect_e6"),
          (col("n2") * (col("avg2_e6") - col("avg1_e6"))).as("rate_effect_e6"),
          ((col("rev2") - col("rev1")) * 1000000
            - (col("n2") - col("n1")) * col("avg1_e6")
            - col("n2") * (col("avg2_e6") - col("avg1_e6"))).as("residual_e6"))
        .orderBy("seg")
    },

    // R153 — customer value-segment migration matrix: between the first
    // and second halves of the order history (split by the median month
    // — an exact integer boundary), each customer lands in a spend
    // bucket per half (ml15's scan-local shifted-integer bins over the
    // half's customer spend), and the (from, to) matrix says who moved
    // up, who churned to zero, who arrived. The "new"/"gone" fringe
    // buckets are explicit (-1) so the matrix partitions ALL customers.
    // Two customer-keyed aggregates + one bucket-sized matrix.
    Q(
      "q110_segment_migration",
      """WITH o AS (SELECT o_custkey AS ck,
        |    year(CAST(o_orderdate AS DATE)) * 12
        |      + month(CAST(o_orderdate AS DATE)) - 1 AS mi,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders),
        |sp AS (SELECT min(mi) AS lo, max(mi) AS hi FROM o),
        |hs AS (SELECT ck,
        |    CASE WHEN 2 * (mi - lo) < hi - lo + 1 THEN 0 ELSE 1 END AS half,
        |    cents FROM o CROSS JOIN sp),
        |cu AS (SELECT ck, half, CAST(sum(cents) AS BIGINT) AS v
        |       FROM hs GROUP BY 1, 2),
        |b AS (SELECT half, min(v) AS mn, max(v) AS mx FROM cu GROUP BY 1),
        |bk AS (SELECT cu.ck, cu.half,
        |         ((cu.v - b.mn) * 3) // (b.mx - b.mn + 1) AS bucket
        |       FROM cu JOIN b ON cu.half = b.half),
        |f AS (SELECT ck, bucket FROM bk WHERE half = 0),
        |t AS (SELECT ck, bucket FROM bk WHERE half = 1),
        |m AS (SELECT coalesce(f.bucket, -1) AS from_bucket,
        |        coalesce(t.bucket, -1) AS to_bucket
        |      FROM f FULL OUTER JOIN t ON f.ck = t.ck)
        |SELECT CAST(from_bucket AS BIGINT) AS from_bucket,
        |  CAST(to_bucket AS BIGINT) AS to_bucket,
        |  CAST(count(*) AS BIGINT) AS n_customers
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val o = Tables.orders(s, d).select(col("o_custkey").as("ck"),
        (year(col("o_orderdate").cast("date")) * 12
          + month(col("o_orderdate").cast("date")) - 1).as("mi"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val sp = o.agg(min("mi").as("lo"), max("mi").as("hi"))
      val cu = o.crossJoin(broadcast(sp))
        .select(col("ck"),
          when(lit(2) * (col("mi") - col("lo")) < col("hi") - col("lo") + 1, 0L)
            .otherwise(1L).as("half"),
          col("cents"))
        .groupBy("ck", "half").agg(sum("cents").as("v"))
        .localCheckpoint(true) // bucket bounds + both halves read it
      val b = cu.groupBy("half").agg(min("v").as("mn"), max("v").as("mx"))
      val bk = cu.join(b, "half")
        .select(col("ck"), col("half"),
          expr("((v - mn) * 3) DIV (mx - mn + 1)").as("bucket"))
      val f = bk.filter(col("half") === 0).select(col("ck"), col("bucket").as("fb"))
      val t = bk.filter(col("half") === 1).select(col("ck"), col("bucket").as("tb"))
      f.join(t, Seq("ck"), "full_outer")
        .select(coalesce(col("fb"), lit(-1L)).as("from_bucket"),
          coalesce(col("tb"), lit(-1L)).as("to_bucket"))
        .groupBy("from_bucket", "to_bucket")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("from_bucket", "to_bucket")
    },

    // R154 — repeat-purchase rate per segment (the retention KPI in its
    // simplest form): share of customers with ≥2 orders, plus the
    // median inter-order gap for those repeaters — the gap median is
    // the exact lower-median rank pick over (segment, gap-day) CELLS
    // (ev19 discipline), and the rate is exact floor permille. One
    // order pass, one customer-keyed aggregate; windows only on cells.
    Q(
      "q111_repeat_rate",
      """WITH seq AS (
        |  SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS od,
        |    lead(CAST(o_orderdate AS DATE)) OVER (
        |      PARTITION BY o_custkey
        |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS nxt
        |  FROM orders),
        |cs AS (SELECT c_mktsegment AS seg, ck, count(*) AS n_orders
        |       FROM seq JOIN customer ON ck = c_custkey GROUP BY 1, 2),
        |rate AS (SELECT seg, CAST(count(*) AS BIGINT) AS n_cust,
        |    CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_repeat
        |  FROM cs GROUP BY 1),
        |gaps AS (SELECT c_mktsegment AS seg, date_diff('day', od, nxt) AS gap
        |         FROM seq JOIN customer ON ck = c_custkey
        |         WHERE nxt IS NOT NULL),
        |cells AS (SELECT seg, gap, count(*) AS cnt FROM gaps GROUP BY 1, 2),
        |rk AS (SELECT seg, gap,
        |    sum(cnt) OVER (PARTITION BY seg ORDER BY gap
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(cnt) OVER (PARTITION BY seg) AS tot
        |  FROM cells),
        |med AS (SELECT seg, min(gap) AS med_gap_days FROM rk
        |        WHERE cum >= (tot + 1) // 2 GROUP BY 1)
        |SELECT r.seg, r.n_cust, r.n_repeat,
        |  (r.n_repeat * 1000) // r.n_cust AS repeat_pm,
        |  CAST(m.med_gap_days AS BIGINT) AS med_gap_days
        |FROM rate r JOIN med m ON r.seg = m.seg ORDER BY r.seg""".stripMargin
    ) { (s, d) =>
      val wSeq = Window.partitionBy("ck").orderBy(col("od"), col("o_orderkey"))
      val seq = Tables.orders(s, d)
        .select(col("o_custkey").as("ck"), col("o_orderkey"),
          col("o_orderdate").cast("date").as("od"))
        .withColumn("nxt", lead("od", 1).over(wSeq))
        .join(Tables.customer(s, d), col("ck") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"), col("ck"), col("od"), col("nxt"))
        .localCheckpoint(true) // rate aggregate + gap cells read it
      val rate = seq.groupBy("seg", "ck").agg(count(lit(1)).as("n_orders"))
        .groupBy("seg")
        .agg(count(lit(1)).as("n_cust"),
          sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("n_repeat"))
      val cells = seq.filter(col("nxt").isNotNull)
        .select(col("seg"), datediff(col("nxt"), col("od")).cast("long").as("gap"))
        .groupBy("seg", "gap").agg(count(lit(1)).as("cnt"))
      val rk = cells.select(col("seg"), col("gap"),
        sum("cnt").over(Window.partitionBy("seg").orderBy("gap")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as("cum"),
        sum("cnt").over(Window.partitionBy("seg")).as("tot"))
      val med = rk.filter(col("cum") >= expr("(tot + 1) DIV 2"))
        .groupBy("seg").agg(min("gap").as("med_gap_days"))
      rate.join(med, "seg")
        .select(col("seg"), col("n_cust"), col("n_repeat"),
          expr("(n_repeat * 1000) DIV n_cust").as("repeat_pm"),
          col("med_gap_days"))
        .orderBy("seg")
    },

    // R178 — newsvendor order-up-to level per brand: with critical
    // ratio cu/(cu+co) = 3/4, the optimal stock is the 75th-percentile
    // of the monthly demand distribution — an exact ceil-rank pick
    // (k = ⌈3n/4⌉ as (3n+3) DIV 4, no percentile interpolation, the
    // ev19 discipline) over the brand × month demand GRID (absent
    // months are real zero-demand observations and enter the quantile
    // — dropping them would bias the stock level up). Scale: one fact
    // pass to (brand, month) cells; the grid is |brands|×|months| from
    // two broadcast dimension frames; rank windows partition by brand
    // over month-sized partitions.
    Q(
      "q120_newsvendor",
      """WITH dem AS (
        |  SELECT p_brand AS brand,
        |    CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT) AS ym,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
        |months AS (SELECT DISTINCT ym FROM dem),
        |brands AS (SELECT DISTINCT p_brand AS brand FROM part),
        |grid AS (SELECT b.brand, m.ym, coalesce(d.qty, 0) AS qty
        |         FROM brands b CROSS JOIN months m
        |         LEFT JOIN dem d ON d.brand = b.brand AND d.ym = m.ym),
        |rk AS (SELECT brand, qty,
        |         row_number() OVER (PARTITION BY brand ORDER BY qty, ym) AS rn,
        |         count(*) OVER (PARTITION BY brand) AS n
        |       FROM grid)
        |SELECT brand, CAST(max(n) AS BIGINT) AS n_months,
        |  CAST(max(CASE WHEN rn = (3*n + 3) // 4 THEN qty END) AS BIGINT) AS order_upto,
        |  CAST(sum(qty) // max(n) AS BIGINT) AS mean_demand,
        |  CAST(max(qty) AS BIGINT) AS max_demand
        |FROM rk GROUP BY brand ORDER BY brand""".stripMargin
    ) { (s, d) =>
      val dem = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"),
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .cast("long").as("ym"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("qty"))
        .localCheckpoint(true) // month horizon + grid both read it
      val months = dem.select("ym").distinct()
      val brands = Tables.part(s, d).select(col("p_brand").as("brand")).distinct()
      val grid = broadcast(brands).crossJoin(broadcast(months))
        .join(dem, Seq("brand", "ym"), "left")
        .select(col("brand"), col("ym"), coalesce(col("qty"), lit(0L)).as("qty"))
      val wb = Window.partitionBy("brand").orderBy("qty", "ym")
      val rk = grid
        .withColumn("rn", row_number().over(wb).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("brand")))
      rk.groupBy("brand")
        .agg(max("n").as("n_months"),
          max(when(col("rn") === expr("(3*n + 3) DIV 4"), col("qty"))).as("order_upto"),
          expr("sum(qty) DIV max(n)").as("mean_demand"),
          max("qty").as("max_demand"))
        .orderBy("brand")
    },

    // R179 — Laspeyres / Paasche / Fisher price indices per month
    // against the first-year base (the retail-economics inflation
    // readout over the order history). Unit prices are micro-cents
    // quantized ONCE per (part, period) — (10⁶·Σext_c) DIV Σqty — so
    // every index is a ratio of exact integer Σp·q products over the
    // MATCHED basket (parts present in both periods); products and the
    // 10⁶-scaled quotients run in decimal(38,0)/HUGEINT (they pass
    // 2⁶³ at lake scale). Fisher = √(L·P) is one portable IEEE sqrt of
    // an exact sub-2⁵³ product, rounded to e6. Scale: one fact pass to
    // (part, month) cells, base frame is part-dimension-sized and
    // broadcast, everything after is dimension × calendar.
    Q(
      "q121_price_index",
      """WITH pm AS (
        |  SELECT l_partkey AS pk,
        |    CAST(year(l_shipdate)*100 + month(l_shipdate) AS BIGINT) AS ym,
        |    CAST(year(l_shipdate) AS BIGINT) AS yr,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS ext_c,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1, 2, 3),
        |y0 AS (SELECT min(yr) AS y0 FROM pm),
        |base AS (
        |  SELECT pk,
        |    CAST((1000000 * CAST(sum(ext_c) AS HUGEINT)) // sum(qty) AS BIGINT) AS p0,
        |    CAST(sum(qty) AS BIGINT) AS q0
        |  FROM pm, y0 WHERE yr = y0 GROUP BY pk),
        |cur AS (
        |  SELECT pk, ym,
        |    CAST((1000000 * CAST(ext_c AS HUGEINT)) // qty AS BIGINT) AS pt,
        |    qty AS qt
        |  FROM pm),
        |m AS (
        |  SELECT c.ym,
        |    count(*) AS n_matched,
        |    sum(CAST(c.pt AS HUGEINT) * b.q0) AS l_num,
        |    sum(CAST(b.p0 AS HUGEINT) * b.q0) AS l_den,
        |    sum(CAST(c.pt AS HUGEINT) * c.qt) AS p_num,
        |    sum(CAST(b.p0 AS HUGEINT) * c.qt) AS p_den
        |  FROM cur c JOIN base b ON c.pk = b.pk GROUP BY 1),
        |idx AS (
        |  SELECT ym, CAST(n_matched AS BIGINT) AS n_matched,
        |    CAST((1000000 * l_num) // l_den AS BIGINT) AS laspeyres_e6,
        |    CAST((1000000 * p_num) // p_den AS BIGINT) AS paasche_e6
        |  FROM m)
        |SELECT ym, n_matched, laspeyres_e6, paasche_e6,
        |  CAST(round(sqrt(CAST(laspeyres_e6 AS DOUBLE)
        |    * CAST(paasche_e6 AS DOUBLE))) AS BIGINT) AS fisher_e6
        |FROM idx ORDER BY ym""".stripMargin
    ) { (s, d) =>
      val pm = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("pk"),
          (year(col("l_shipdate")) * 100 + month(col("l_shipdate")))
            .cast("long").as("ym"),
          year(col("l_shipdate")).cast("long").as("yr"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("ext_c"),
          sum(round(col("l_quantity")).cast("long")).as("qty"))
        .localCheckpoint(true) // base year + current periods read it
      val y0 = pm.agg(min("yr").as("y0"))
      val base = pm.crossJoin(broadcast(y0)).filter(col("yr") === col("y0"))
        .groupBy("pk")
        .agg(expr("CAST((1000000 * CAST(sum(ext_c) AS DECIMAL(38,0))) DIV sum(qty) AS BIGINT)").as("p0"),
          sum("qty").as("q0"))
      val cur = pm.select(col("pk"), col("ym"),
        expr("CAST((1000000 * CAST(ext_c AS DECIMAL(38,0))) DIV qty AS BIGINT)").as("pt"),
        col("qty").as("qt"))
      val m = cur.join(broadcast(base), "pk")
        .groupBy("ym")
        .agg(count(lit(1)).as("n_matched"),
          sum(expr("CAST(pt AS DECIMAL(38,0)) * q0")).as("l_num"),
          sum(expr("CAST(p0 AS DECIMAL(38,0)) * q0")).as("l_den"),
          sum(expr("CAST(pt AS DECIMAL(38,0)) * qt")).as("p_num"),
          sum(expr("CAST(p0 AS DECIMAL(38,0)) * qt")).as("p_den"))
      m.select(col("ym"), col("n_matched"),
          expr("CAST((1000000 * l_num) DIV l_den AS BIGINT)").as("laspeyres_e6"),
          expr("CAST((1000000 * p_num) DIV p_den AS BIGINT)").as("paasche_e6"))
        .withColumn("fisher_e6",
          expr("""CAST(round(sqrt(CAST(laspeyres_e6 AS DOUBLE)
            | * CAST(paasche_e6 AS DOUBLE))) AS BIGINT)""".stripMargin))
        .orderBy("ym")
    },

    // R206 — brand-switching matrix (loyalty analysis): ev12's Markov
    // machinery moved from events to PURCHASES — per customer, the
    // (previous order's dominant brand → this order's dominant brand)
    // transition counts, diagonal = loyalty. Dominant brand per order
    // is a rank-1 pick under the (qty, brand) total order (per-order
    // partitions are basket-sized); the customer sequence is one
    // lag window on the order-keyed frame; the matrix is
    // ≤|brands|²-sized, top-20 under a total order.
    Q(
      "q130_brand_switching",
      """WITH ob AS (
        |  SELECT l_orderkey AS ok, p_brand AS brand,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1, 2),
        |dom AS (SELECT ok, brand FROM (
        |    SELECT ok, brand,
        |      row_number() OVER (PARTITION BY ok ORDER BY qty DESC, brand) AS rn
        |    FROM ob) WHERE rn = 1),
        |seq AS (
        |  SELECT o_custkey AS ck, dom.brand,
        |    lag(dom.brand) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS pb
        |  FROM orders JOIN dom ON o_orderkey = dom.ok)
        |SELECT pb AS from_brand, brand AS to_brand,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CASE WHEN pb = brand THEN 1 ELSE 0 END AS is_loyal
        |FROM seq WHERE pb IS NOT NULL
        |GROUP BY 1, 2 ORDER BY n DESC, from_brand, to_brand LIMIT 20""".stripMargin
    ) { (s, d) =>
      val ob = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_orderkey").as("ok"), col("p_brand").as("brand"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("qty"))
      val wo = Window.partitionBy("ok").orderBy(desc("qty"), col("brand"))
      val dom = ob.withColumn("rn", row_number().over(wo))
        .filter(col("rn") === 1).select("ok", "brand")
      val wc = Window.partitionBy("ck").orderBy(col("od"), col("ok"))
      val seq = Tables.orders(s, d)
        .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"),
          col("o_orderdate").as("od"))
        .join(dom, "ok")
        .withColumn("pb", lag("brand", 1).over(wc))
        .filter(col("pb").isNotNull)
      seq.groupBy(col("pb").as("from_brand"), col("brand").as("to_brand"))
        .agg(count(lit(1)).as("n"))
        .withColumn("is_loyal",
          when(col("from_brand") === col("to_brand"), 1L).otherwise(0L))
        .orderBy(desc("n"), col("from_brand"), col("to_brand")).limit(20)
    },

    // R214 — dead-stock report: parts with ZERO sales in the trailing
    // quarter of the history (cutoff = lake max shipdate − 90 days —
    // data-derived, no wall clock), with their shelf value and last
    // sale. The assortment-pruning input q105's ABC can't give (C
    // parts still sell; dead parts don't). One fact aggregate to
    // per-part last-sale, a dimension-sized anti-pattern join
    // (left join + null test keeps never-sold parts too), value in
    // exact cents. Top-50 by value under a total order.
    Q(
      "q134_dead_stock",
      """WITH mx AS (SELECT max(CAST(l_shipdate AS DATE)) AS hi FROM lineitem),
        |last AS (SELECT l_partkey AS pk, max(CAST(l_shipdate AS DATE)) AS last_sale
        |         FROM lineitem GROUP BY 1),
        |dead AS (
        |  SELECT p.p_partkey AS pk, p.p_brand AS brand,
        |    CAST(round(p.p_retailprice*100) AS BIGINT) AS price_c,
        |    l.last_sale
        |  FROM part p LEFT JOIN last l ON p.p_partkey = l.pk
        |  CROSS JOIN mx
        |  WHERE l.last_sale IS NULL OR l.last_sale < mx.hi - INTERVAL 90 DAY)
        |SELECT pk, brand, price_c,
        |  CAST(coalesce(date_diff('day', last_sale,
        |    (SELECT hi FROM mx)), -1) AS BIGINT) AS days_stale
        |FROM dead ORDER BY price_c DESC, pk LIMIT 50""".stripMargin
    ) { (s, d) =>
      val mx = Tables.lineitem(s, d)
        .agg(max(to_date(col("l_shipdate"))).as("hi"))
      val last = Tables.lineitem(s, d)
        .groupBy(col("l_partkey").as("pk"))
        .agg(max(to_date(col("l_shipdate"))).as("last_sale"))
      Tables.part(s, d)
        .select(col("p_partkey").as("pk"), col("p_brand").as("brand"),
          round(col("p_retailprice") * 100).cast("long").as("price_c"))
        .join(last, Seq("pk"), "left")
        .crossJoin(broadcast(mx))
        .filter(col("last_sale").isNull
          || col("last_sale") < expr("hi - INTERVAL 90 DAY"))
        .select(col("pk"), col("brand"), col("price_c"),
          coalesce(datediff(col("hi"), col("last_sale")).cast("long"), lit(-1L))
            .as("days_stale"))
        .orderBy(desc("price_c"), col("pk")).limit(50)
    },

    // R220 — duplicate-payment audit: order pairs from the SAME
    // customer in the SAME $1000 amount band within 180 days — the
    // accounts-payable double-entry screen. Candidates come from an
    // EQUI-join on (customer, amount-band) — the blocking key that
    // keeps this linear in orders — then the exact day-window
    // predicate prunes; ok_a < ok_b emits each pair once. Output is
    // the pair list under a total order (audits want the rows, not a
    // count).
    Q(
      "q135_dup_payments",
      """WITH o AS (
        |  SELECT o_custkey AS ck, o_orderkey AS ok,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CAST(round(o_totalprice*100) AS BIGINT) // 100000 AS band,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |         AS BIGINT) AS ed
        |  FROM orders)
        |SELECT a.ck, a.band,
        |  a.ok AS ok_a, b.ok AS ok_b,
        |  a.cents AS cents_a, b.cents AS cents_b,
        |  abs(a.ed - b.ed) AS gap_days
        |FROM o a JOIN o b
        |  ON a.ck = b.ck AND a.band = b.band AND a.ok < b.ok
        | AND abs(a.ed - b.ed) <= 180
        |ORDER BY a.ck, ok_a, ok_b""".stripMargin
    ) { (s, d) =>
      val o = Tables.orders(s, d).select(
        col("o_custkey").as("ck"), col("o_orderkey").as("ok"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        expr("CAST(round(o_totalprice*100) AS BIGINT) DIV 100000").as("band"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("long").as("ed"))
        .localCheckpoint(true) // both sides of the blocking join
      val b = o.select(col("ck"), col("band"), col("ok").as("ok_b"),
        col("cents").as("cents_b"), col("ed").as("ed_b"))
      o.join(b, Seq("ck", "band"))
        .filter(col("ok") < col("ok_b") && abs(col("ed") - col("ed_b")) <= 180)
        .select(col("ck"), col("band"), col("ok").as("ok_a"), col("ok_b"),
          col("cents").as("cents_a"), col("cents_b"),
          abs(col("ed") - col("ed_b")).as("gap_days"))
        .orderBy("ck", "ok_a", "ok_b")
    },

    // R231 — price-dispersion audit (law of one price): how far the
    // realized unit price of the SAME part spreads across lines — the
    // pricing-leakage detector (a part sold at 2× spread means the
    // discount policy, not the list price, sets revenue). Unit price
    // micro-quantized ONCE per line ((10⁶·line cents) DIV qty, the
    // q121 discipline), spread permille one floor DIV; one fact
    // aggregate to the part frame, top-20 by a distributed
    // TakeOrdered under the (spread, part) total order.
    Q(
      "q139_price_dispersion",
      """WITH lp AS (
        |  SELECT l_partkey AS pk,
        |    (1000000 * CAST(round(l_extendedprice*100) AS BIGINT))
        |      // CAST(round(l_quantity) AS BIGINT) AS up
        |  FROM lineitem),
        |a AS (SELECT pk, CAST(count(*) AS BIGINT) AS n_lines,
        |        CAST(min(up) AS BIGINT) AS min_up,
        |        CAST(max(up) AS BIGINT) AS max_up
        |      FROM lp GROUP BY 1)
        |SELECT pk, n_lines, min_up, max_up,
        |  ((max_up - min_up) * 1000) // min_up AS spread_pm
        |FROM a WHERE n_lines >= 3
        |ORDER BY spread_pm DESC, pk LIMIT 20""".stripMargin
    ) { (s, d) =>
      val lp = Tables.lineitem(s, d).select(col("l_partkey").as("pk"),
        expr("""(1000000 * CAST(round(l_extendedprice*100) AS BIGINT))
          | DIV CAST(round(l_quantity) AS BIGINT)""".stripMargin).as("up"))
      lp.groupBy("pk")
        .agg(count(lit(1)).as("n_lines"),
          min("up").as("min_up"), max("up").as("max_up"))
        .filter(col("n_lines") >= 3)
        .withColumn("spread_pm", expr("((max_up - min_up) * 1000) DIV min_up"))
        .select("pk", "n_lines", "min_up", "max_up", "spread_pm")
        .orderBy(desc("spread_pm"), col("pk")).limit(20)
    },

    // R251 — Croston's method for INTERMITTENT demand: q120's newsvendor
    // and q108's XYZ both assume a demand level exists; sparse demand
    // (many zero months) biases plain exponential smoothing toward
    // zero, and Croston's fix — separate EMAs for nonzero demand SIZE
    // (z) and the INTERVAL between demands (x), forecast = z/x — is the
    // standard spare-parts/slow-mover estimator. The fold state is a
    // flat [init, z, x, q] 4-list over the per-brand monthly series
    // (zeros filled on the global month spine): before the first
    // nonzero month the state passes through; at it, z seeds to the
    // demand and x to 1; after, dyadic α = 1/4 keeps every operation a
    // correctly-rounded IEEE primitive of the IDENTICAL expression tree
    // on both engines (ev43's license — hash-equal doubles, no
    // rounding). DuckDB's seedless list_reduce takes the seed
    // PREPENDED with list-typed elements (ev36/ev43 precedent). The
    // fact collapses to (brand, month) cells in one pass; folds run on
    // ≤|months| lists per brand.
    Q(
      "q147_croston",
      """WITH pm AS (
        |  SELECT p_brand AS brand,
        |    CAST(year(CAST(l_shipdate AS DATE))*12
        |      + month(CAST(l_shipdate AS DATE)) - 1 AS BIGINT) AS mi,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
        |  GROUP BY 1, 2),
        |bounds AS (SELECT min(mi) AS m0, max(mi) AS m1 FROM pm),
        |spine AS (
        |  SELECT b.brand, g.mi FROM (SELECT DISTINCT brand FROM pm) b
        |  CROSS JOIN (SELECT unnest(range((SELECT m0 FROM bounds),
        |                                  (SELECT m1 FROM bounds) + 1)) AS mi) g),
        |series AS (
        |  SELECT s.brand, s.mi, CAST(coalesce(pm.qty, 0) AS DOUBLE) AS y
        |  FROM spine s LEFT JOIN pm ON pm.brand = s.brand AND pm.mi = s.mi),
        |arrs AS (
        |  SELECT brand, list(y ORDER BY mi) AS xs,
        |    CAST(count(*) AS BIGINT) AS n_months,
        |    CAST(sum(CASE WHEN y > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero
        |  FROM series GROUP BY 1),
        |fit AS (
        |  SELECT brand, n_months, n_nonzero,
        |    list_reduce(
        |      list_concat([[0.0e0, 0.0e0, 0.0e0, 0.0e0]],
        |        list_transform(xs, v -> [v, 0.0e0, 0.0e0, 0.0e0])),
        |      (acc, e) -> CASE WHEN acc[1] < 0.5e0 THEN
        |          CASE WHEN e[1] > 0.0e0
        |               THEN [1.0e0, e[1], 1.0e0, 1.0e0] ELSE acc END
        |        ELSE CASE WHEN e[1] > 0.0e0
        |          THEN [1.0e0, acc[2] + 0.25e0*(e[1] - acc[2]),
        |                acc[3] + 0.25e0*(acc[4] - acc[3]), 1.0e0]
        |          ELSE [1.0e0, acc[2], acc[3], acc[4] + 1.0e0] END
        |      END) AS st
        |  FROM arrs)
        |SELECT brand, n_months, n_nonzero,
        |  st[2] AS z_size, st[3] AS x_interval,
        |  CASE WHEN st[1] < 0.5e0 THEN NULL ELSE st[2] / st[3] END
        |    AS croston_rate
        |FROM fit ORDER BY brand""".stripMargin
    ) { (s, d) =>
      val pm = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand").isin("Brand#11", "Brand#22", "Brand#33"))
          .select(col("p_partkey"), col("p_brand").as("brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("brand"),
          (year(col("l_shipdate").cast("date")) * 12
            + month(col("l_shipdate").cast("date")) - 1).cast("long").as("mi"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("qty"))
        .localCheckpoint(true) // bounds + spine join both read it
      val bounds = pm.agg(min("mi").as("m0"), max("mi").as("m1"))
      val spine = pm.select("brand").distinct()
        .crossJoin(broadcast(bounds))
        .select(col("brand"), explode(sequence(col("m0"), col("m1"))).as("mi"))
      val series = spine.join(pm, Seq("brand", "mi"), "left")
        .select(col("brand"), col("mi"),
          coalesce(col("qty"), lit(0L)).cast("double").as("y"))
      val arrs = series.groupBy("brand")
        .agg(expr("transform(array_sort(collect_list(struct(mi, y))), s -> s.y)")
            .as("xs"),
          count(lit(1)).as("n_months"),
          sum(when(col("y") > 0, 1L).otherwise(0L)).as("n_nonzero"))
      val fit = arrs.select(col("brand"), col("n_months"), col("n_nonzero"),
        expr(
          """aggregate(xs,
            |  array(0.0D, 0.0D, 0.0D, 0.0D),
            |  (acc, y) -> CASE WHEN element_at(acc,1) < 0.5D THEN
            |      CASE WHEN y > 0.0D
            |           THEN array(1.0D, y, 1.0D, 1.0D) ELSE acc END
            |    ELSE CASE WHEN y > 0.0D
            |      THEN array(1.0D, element_at(acc,2) + 0.25D*(y - element_at(acc,2)),
            |                 element_at(acc,3)
            |                   + 0.25D*(element_at(acc,4) - element_at(acc,3)), 1.0D)
            |      ELSE array(1.0D, element_at(acc,2), element_at(acc,3),
            |                 element_at(acc,4) + 1.0D) END
            |  END)""".stripMargin).as("st"))
      fit.select(col("brand"), col("n_months"), col("n_nonzero"),
          element_at(col("st"), 2).as("z_size"),
          element_at(col("st"), 3).as("x_interval"),
          when(element_at(col("st"), 1) < 0.5, lit(null))
            .otherwise(element_at(col("st"), 2) / element_at(col("st"), 3))
            .as("croston_rate"))
        .orderBy("brand")
    },

    // R252 — net + gross revenue retention (NRR/GRR) per acquisition
    // cohort: q95's LTV matrix shows cumulative value; NRR answers the
    // SaaS-boardroom question "a year later, do the SAME customers
    // spend more or less" (expansion included), and GRR caps each
    // customer at their starting spend (contraction only — expansion
    // can't mask churn). Per customer: acquisition month mi0 = min
    // order month, r0 = cents in mi0, r12 = cents in mi0+12; cohorts
    // whose +12 month exceeds the data horizon are EXCLUDED (a partial
    // year would read as churn). All cents exact; the two ratios are
    // integer permille DIVs. One customer-keyed reduction; the cohort
    // frame is month-spine-sized.
    Q(
      "q148_nrr",
      """WITH om AS (
        |  SELECT o_custkey AS ck,
        |    CAST(year(CAST(o_orderdate AS DATE))*12
        |      + month(CAST(o_orderdate AS DATE)) - 1 AS BIGINT) AS mi,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1, 2),
        |f AS (SELECT ck, min(mi) AS mi0 FROM om GROUP BY 1),
        |h AS (SELECT max(mi) AS hmax FROM om),
        |cust AS (
        |  SELECT f.ck, f.mi0,
        |    sum(CASE WHEN om.mi = f.mi0 THEN om.cents ELSE 0 END) AS r0,
        |    sum(CASE WHEN om.mi = f.mi0 + 12 THEN om.cents ELSE 0 END) AS r12
        |  FROM f JOIN om ON om.ck = f.ck GROUP BY 1, 2)
        |SELECT mi0 // 12 AS cohort_yr, mi0 % 12 + 1 AS cohort_mo,
        |  CAST(count(*) AS BIGINT) AS n_cust,
        |  CAST(sum(r0) AS BIGINT) AS rev0_cents,
        |  CAST(sum(r12) AS BIGINT) AS rev12_cents,
        |  CAST((1000 * sum(r12)) // sum(r0) AS BIGINT) AS nrr_pm,
        |  CAST((1000 * sum(least(r0, r12))) // sum(r0) AS BIGINT) AS grr_pm
        |FROM cust CROSS JOIN h
        |WHERE mi0 + 12 <= hmax
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val om = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("ck"),
          (year(col("o_orderdate").cast("date")) * 12
            + month(col("o_orderdate").cast("date")) - 1).cast("long").as("mi"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .localCheckpoint(true) // first-month frame + rejoin both read it
      val f = om.groupBy("ck").agg(min("mi").as("mi0"))
      val h = om.agg(max("mi").as("hmax"))
      val cust = f.join(om, Seq("ck"))
        .groupBy("ck", "mi0")
        .agg(sum(when(col("mi") === col("mi0"), col("cents")).otherwise(0L))
            .as("r0"),
          sum(when(col("mi") === col("mi0") + 12, col("cents")).otherwise(0L))
            .as("r12"))
      cust.crossJoin(broadcast(h))
        .filter(col("mi0") + 12 <= col("hmax"))
        .groupBy(expr("mi0 DIV 12").as("cohort_yr"),
          (col("mi0") % 12 + 1).as("cohort_mo"))
        .agg(count(lit(1)).as("n_cust"),
          sum("r0").as("rev0_cents"), sum("r12").as("rev12_cents"),
          sum(least(col("r0"), col("r12"))).as("g"))
        .select(col("cohort_yr"), col("cohort_mo"), col("n_cust"),
          col("rev0_cents"), col("rev12_cents"),
          expr("(1000 * rev12_cents) DIV rev0_cents").as("nrr_pm"),
          expr("(1000 * g) DIV rev0_cents").as("grr_pm"))
        .orderBy("cohort_yr", "cohort_mo")
    },

    // R259 — odds ratio with Wald significance per priority segment:
    // the 2×2 effect-size readout (q153's z-tests say WHETHER segments
    // differ; the odds ratio says HOW MUCH, on the multiplicative
    // scale reviewers actually quote). Cells: exposure = order value
    // above the global mean, outcome = finalized status, +1 smoothing
    // so no cell zeroes the ratio (documented variant of Haldane's
    // correction that keeps the counts integral). ln(OR) comes from
    // graft.functions.PinnedMath (both engines run the SAME ladder
    // text → identical doubles → the e6 floor can never flip), and the
    // Wald test |lnOR| > 1.96·SE is evaluated SQUARED —
    // lnx² > 3.8416·(1/a+1/b+1/c+1/d) — in doubles whose expression
    // text is identical on both engines (÷ and + are correctly-rounded,
    // so the boolean is deterministic). One labeled pass, 5-row output.
    Q(
      "q155_odds_ratio",
      """WITH sc AS (SELECT o_orderpriority AS priority,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |  FROM orders),
        |t AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr FROM sc),
        |cells AS (SELECT priority,
        |    CAST(1 + sum(CASE WHEN cents >= thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(1 + sum(CASE WHEN cents >= thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(1 + sum(CASE WHEN cents < thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(1 + sum(CASE WHEN cents < thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM sc CROSS JOIN t GROUP BY 1),
        |terms0 AS (SELECT priority, a, b, c, d,
        |    (CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c) AS x,
        |    1E0/a + 1E0/b + 1E0/c + 1E0/d AS se2
        |  FROM cells),
        |""".stripMargin + graft.functions.PinnedMath.lnCtes("terms0") +
      """r AS (SELECT priority, a, b, c, d,
        |    CAST(floor(1000000.0 * lnx) AS BIGINT) AS lnor_micro,
        |    CAST(CASE WHEN lnx * lnx > 3.8416 * se2 THEN 1 ELSE 0 END AS BIGINT)
        |      AS sig_95
        |  FROM plF)
        |SELECT * FROM r ORDER BY priority""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        col("o_orderpriority").as("priority"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val t = sc.agg(expr("CAST(sum(cents) DIV count(*) AS BIGINT)").as("thr"))
      val cells = sc.crossJoin(broadcast(t)).groupBy("priority").agg(
        (lit(1L) + sum(when(col("cents") >= col("thr") && col("y") === 1, 1L)
          .otherwise(0L))).as("a"),
        (lit(1L) + sum(when(col("cents") >= col("thr") && col("y") === 0, 1L)
          .otherwise(0L))).as("b"),
        (lit(1L) + sum(when(col("cents") < col("thr") && col("y") === 1, 1L)
          .otherwise(0L))).as("c"),
        (lit(1L) + sum(when(col("cents") < col("thr") && col("y") === 0, 1L)
          .otherwise(0L))).as("d"))
      val terms0 = cells.select(col("priority"),
        col("a"), col("b"), col("c"), col("d"),
        expr("(CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c)").as("x"),
        expr("1E0/a + 1E0/b + 1E0/c + 1E0/d").as("se2"))
      graft.functions.PinnedMath.withLnx(terms0)
        .select(col("priority"), col("a"), col("b"), col("c"), col("d"),
          floor(lit(1000000.0) * col("lnx")).cast("long").as("lnor_micro"),
          when(col("lnx") * col("lnx") > lit(3.8416) * col("se2"), 1L)
            .otherwise(0L).as("sig_95"))
        .orderBy("priority")
    },

    // R268b — odds-ratio 95% CONFIDENCE BOUNDS (r9, the PinnedMath-exp
    // unlock): exp(lnOR ± 1.96·SE) per segment, long format (one row
    // per bound side) so ONE pinned exp chain serves both bounds. The
    // whole path — Haldane cells → pinned ln → ±1.96·sqrt(se2) (sqrt
    // is correctly rounded on both engines) → pinned exp → e6 floor —
    // is the SAME expression text on both engines, so the bounds are
    // bit-identical before quantization; the oracle recomputes all of
    // it from the raw orders table.
    Q(
      "q156_odds_ratio_ci",
      """WITH sc AS (SELECT o_orderpriority AS priority,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |  FROM orders),
        |t AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr FROM sc),
        |cells AS (SELECT priority,
        |    CAST(1 + sum(CASE WHEN cents >= thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(1 + sum(CASE WHEN cents >= thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(1 + sum(CASE WHEN cents < thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
        |    CAST(1 + sum(CASE WHEN cents < thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
        |  FROM sc CROSS JOIN t GROUP BY 1),
        |terms0 AS (SELECT priority,
        |    (CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c) AS x,
        |    1E0/a + 1E0/b + 1E0/c + 1E0/d AS se2
        |  FROM cells),
        |""".stripMargin + graft.functions.PinnedMath.lnCtes("terms0") +
        """expIn AS (
        |  SELECT priority, 'lo' AS side, lnx - 1.96 * sqrt(se2) AS x FROM plF
        |  UNION ALL
        |  SELECT priority, 'hi' AS side, lnx + 1.96 * sqrt(se2) AS x FROM plF),
        |""".stripMargin + graft.functions.PinnedMath.expCtes("expIn") +
        """fin AS (SELECT priority, side,
        |    CAST(floor(1000000.0 * expx) AS BIGINT) AS or_bound_micro
        |  FROM peF)
        |SELECT * FROM fin ORDER BY priority, side""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        col("o_orderpriority").as("priority"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val t = sc.agg(expr("CAST(sum(cents) DIV count(*) AS BIGINT)").as("thr"))
      val cells = sc.crossJoin(broadcast(t)).groupBy("priority").agg(
        (lit(1L) + sum(when(col("cents") >= col("thr") && col("y") === 1, 1L)
          .otherwise(0L))).as("a"),
        (lit(1L) + sum(when(col("cents") >= col("thr") && col("y") === 0, 1L)
          .otherwise(0L))).as("b"),
        (lit(1L) + sum(when(col("cents") < col("thr") && col("y") === 1, 1L)
          .otherwise(0L))).as("c"),
        (lit(1L) + sum(when(col("cents") < col("thr") && col("y") === 0, 1L)
          .otherwise(0L))).as("d"))
      val terms0 = cells.select(col("priority"),
        expr("(CAST(a AS DOUBLE) * d) / (CAST(b AS DOUBLE) * c)").as("x"),
        expr("1E0/a + 1E0/b + 1E0/c + 1E0/d").as("se2"))
      val withLn = graft.functions.PinnedMath.withLnx(terms0)
      val expIn = withLn.select(col("priority"), lit("lo").as("side"),
          (col("lnx") - lit(1.96) * sqrt(col("se2"))).as("x"))
        .unionByName(withLn.select(col("priority"), lit("hi").as("side"),
          (col("lnx") + lit(1.96) * sqrt(col("se2"))).as("x")))
      graft.functions.PinnedMath
        .withSteps(expIn, graft.functions.PinnedMath.expSteps)
        .select(col("priority"), col("side"),
          floor(lit(1000000.0) * col("expx")).cast("long").as("or_bound_micro"))
        .orderBy("priority", "side")
    }
  )
}
