package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Business-analytics catalog additions (r4, third continuation):
  * concentration / coverage / robust-dispersion readouts plus the
  * bitmap-exact mergeable distinct — the shapes an OLAP user reaches for
  * right after the TPC-H staples.
  *
  * Float discipline follows SURVEY.md §5: every aggregate is either an
  * exact integer (cents, counts, ranks) or ONE fixed double expression
  * tree evaluated identically on both engines; wide products go through
  * decimal(38,0) (DuckDB: HUGEINT) per the q73 overflow precedent.
  */
object Analytics {

  val catalog: Seq[Q] = Seq(
    // R80 — bitmap-exact mergeable distinct (the EXACT counterpart of
    // the HLL segment rollup T18): per-month segment bitmaps of the
    // customer-id space (bitmap_construct_agg over per-bucket bit
    // positions) are OR-merged across months (bitmap_or_agg), then
    // counted — count(DISTINCT) semantics with segment-build/rollup
    // economics, no distinct shuffle of raw ids at rollup time. Buckets
    // partition the id space so bitmaps stay fixed-size (4 KB each);
    // the oracle is the plain COUNT(DISTINCT), which the bitmap algebra
    // must reproduce EXACTLY — this is not a sketch.
    Q(
      "q78_bitmap_distinct",
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"),
          date_trunc("month", col("o_orderdate")).as("seg"),
          expr("bitmap_bucket_number(o_custkey)").as("bkt"))
        .agg(expr("bitmap_construct_agg(bitmap_bit_position(o_custkey))").as("bm"))
        .groupBy("o_orderpriority", "bkt")
        .agg(expr("bitmap_or_agg(bm)").as("bm")) // the mergeable union step
        .groupBy("o_orderpriority")
        .agg(sum(expr("bitmap_count(bm)")).as("n_cust"))
        .orderBy("o_orderpriority")
    },

    // R81 — deterministic per-group mode (most frequent value, ties to
    // the smallest value — built-in mode() has engine-defined ties, so
    // both sides replay the explicit count + total-ordered argmax).
    // Counts reduce per (group, value) map-side; the argmax window sorts
    // |distinct values| rows per group, never the fact.
    Q(
      "q79_mode",
      """SELECT l_returnflag, qty AS mode_qty, cnt FROM (
        |  SELECT l_returnflag, qty, cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY cnt DESC, qty) AS rn
        |  FROM (SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS qty,
        |          count(*) AS cnt
        |        FROM lineitem GROUP BY 1, 2))
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      val counts = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), round(col("l_quantity")).cast("long").as("qty"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("l_returnflag").orderBy(col("cnt").desc, col("qty"))
      counts.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("qty").as("mode_qty"), col("cnt"))
        .orderBy("l_returnflag")
    },

    // R82 — median absolute deviation (robust dispersion; the outlier
    // readout q47's winsorizing clips against). Two passes: per-group
    // exact median of price CENTS (4dp-rounded both engines — the q47
    // ulp license), broadcast back, then the median of the absolute
    // deviations. At 100 TB both percentiles swap to approx_percentile;
    // the two-pass broadcast-back shape is unchanged.
    Q(
      "q80_mad",
      """WITH c AS (SELECT o_orderpriority,
        |             CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |           FROM orders),
        |m AS (SELECT o_orderpriority,
        |        round(quantile_cont(cents, 0.5), 4) AS med_c
        |      FROM c GROUP BY 1)
        |SELECT c.o_orderpriority, count(*) AS n,
        |  round(quantile_cont(abs(cents - med_c), 0.5), 4) AS mad_cents
        |FROM c JOIN m ON c.o_orderpriority = m.o_orderpriority
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val c = Tables.orders(s, d).select(col("o_orderpriority"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val m = c.groupBy("o_orderpriority")
        .agg(round(expr("percentile(cents, 0.5)"), 4).as("med_c"))
      c.join(broadcast(m), Seq("o_orderpriority"))
        .withColumn("dev", abs(col("cents") - col("med_c")))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(dev, 0.5)"), 4).as("mad_cents"))
        .orderBy("o_orderpriority")
    },

    // R83 — Herfindahl–Hirschman concentration index per supplier
    // nation: HHI_ppm = 1e6 · Σ share², share = supplier revenue /
    // nation total. Revenue in exact 4dp cents; the squares go through
    // decimal(38,0) (HUGEINT in DuckDB — longs overflow past rev ≈
    // 3·10^9), and the index is ONE fixed double tree of the two exact
    // sums. Per-(nation,supplier) reduction carries the only fact
    // shuffle; the nation-level moments are dims-sized.
    Q(
      "q81_hhi",
      """WITH rs AS (
        |  SELECT n_name, s_suppkey,
        |    sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT)) AS rev
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_name, count(*) AS n_suppliers,
        |  (CAST(sum(CAST(rev AS HUGEINT) * CAST(rev AS HUGEINT)) AS DOUBLE)
        |   / (CAST(sum(rev) AS DOUBLE) * CAST(sum(rev) AS DOUBLE)))
        |  * 1000000.0 AS hhi_ppm
        |FROM rs GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val rev = round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000)
        .cast("long")
      val rs = Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "s_suppkey")
        .agg(sum(rev).as("rev"))
      val revDec = col("rev").cast("decimal(38,0)")
      rs.groupBy("n_name")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(revDec * revDec).as("sumsq"),
          sum(col("rev")).as("total"))
        .select(col("n_name"), col("n_suppliers"),
          ((col("sumsq").cast("double")
            / (col("total").cast("double") * col("total").cast("double")))
            * lit(1000000.0)).as("hhi_ppm"))
        .orderBy("n_name")
    },

    // R84 — Pareto coverage (the 80/20 readout): per customer nation,
    // how many top customers cover 80% of order revenue. Customers
    // ranked by exact cents (ties broken by custkey), running cents via
    // a ROWS frame, and the crossing test is INTEGER — a row counts
    // while the revenue BEFORE it is still short of 4/5 of the total
    // (5·(cum − rev) < 4·total), so no float share ever exists. One
    // custkey-keyed reduction; windows run per nation over the
    // customers-sized frame.
    Q(
      "q82_pareto",
      """WITH cr AS (
        |  SELECT n_name, c_custkey,
        |    sum(CAST(round(o_totalprice*100) AS BIGINT)) AS rev
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT n_name, rev,
        |    sum(rev) OVER (PARTITION BY n_name ORDER BY rev DESC, c_custkey
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(rev) OVER (PARTITION BY n_name) AS total
        |  FROM cr)
        |SELECT n_name, count(*) AS n_customers,
        |  CAST(sum(CASE WHEN 5*(cum - rev) < 4*total THEN 1 ELSE 0 END) AS BIGINT)
        |    AS k80
        |FROM w GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val cr = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "c_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
      // nation partitions scale with the data (|customers|/25 rows each):
      // blocked-within-nation running sum + 25-row broadcast totals
      val tot = cr.groupBy("n_name").agg(sum("rev").as("total"))
      val cum = graft.operators.Blocked.cumulativeBy(cr, Seq("n_name"),
          Seq(col("rev").desc, col("c_custkey")), Seq("rev"))
        .withColumnRenamed("cum_rev", "cum")
        .join(broadcast(tot), Seq("n_name"))
      cum.groupBy("n_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(when(lit(5) * (col("cum") - col("rev")) < lit(4) * col("total"), 1)
            .otherwise(0)).as("k80"))
        .orderBy("n_name")
    },

    // R87 — RFM customer segmentation (recency / frequency / monetary
    // quintile scores): the marketing-analytics staple. Scores come from
    // BROADCAST quantile boundaries + codegen'd comparison sums — q71's
    // pattern, deliberately NOT a global ntile() (a total sort through
    // one partition at 100 TB). All three boundary sets ride ONE 1-row
    // aggregate; day arithmetic is integer DATE diffs; output is the
    // ≤125-cell segment matrix. Boundaries rounded 4dp both engines
    // (q47 license); approx_percentile is the stated 100 TB swap.
    Q(
      "q83_rfm",
      """WITH cr AS (
        |  SELECT o_custkey,
        |    max(CAST(o_orderdate AS DATE)) AS last_d,
        |    count(*) AS f,
        |    sum(CAST(round(o_totalprice*100) AS BIGINT)) AS m
        |  FROM orders GROUP BY 1),
        |a AS (SELECT max(last_d) AS anchor FROM cr),
        |r AS (SELECT o_custkey, date_diff('day', last_d, anchor) AS r_days, f, m
        |      FROM cr CROSS JOIN a),
        |b AS (SELECT
        |    round(quantile_cont(r_days, 0.2), 4) AS r1, round(quantile_cont(r_days, 0.4), 4) AS r2,
        |    round(quantile_cont(r_days, 0.6), 4) AS r3, round(quantile_cont(r_days, 0.8), 4) AS r4,
        |    round(quantile_cont(f, 0.2), 4) AS f1, round(quantile_cont(f, 0.4), 4) AS f2,
        |    round(quantile_cont(f, 0.6), 4) AS f3, round(quantile_cont(f, 0.8), 4) AS f4,
        |    round(quantile_cont(m, 0.2), 4) AS m1, round(quantile_cont(m, 0.4), 4) AS m2,
        |    round(quantile_cont(m, 0.6), 4) AS m3, round(quantile_cont(m, 0.8), 4) AS m4
        |  FROM r)
        |SELECT
        |  1 + CAST(r_days > r1 AS INT) + CAST(r_days > r2 AS INT)
        |    + CAST(r_days > r3 AS INT) + CAST(r_days > r4 AS INT) AS r_score,
        |  1 + CAST(f > f1 AS INT) + CAST(f > f2 AS INT)
        |    + CAST(f > f3 AS INT) + CAST(f > f4 AS INT) AS f_score,
        |  1 + CAST(m > m1 AS INT) + CAST(m > m2 AS INT)
        |    + CAST(m > m3 AS INT) + CAST(m > m4 AS INT) AS m_score,
        |  count(*) AS n_customers
        |FROM r CROSS JOIN b
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    ) { (s, d) =>
      val cr = Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(max(col("o_orderdate").cast("date")).as("last_d"),
          count(lit(1)).as("f"),
          sum(round(col("o_totalprice") * 100).cast("long")).as("m"))
      val a = cr.agg(max("last_d").as("anchor"))
      val r = cr.crossJoin(broadcast(a))
        .select(col("o_custkey"), datediff(col("anchor"), col("last_d")).as("r_days"),
          col("f"), col("m"))
        .localCheckpoint(true) // boundary agg + assignment share the frame
      val qs = Seq(0.2, 0.4, 0.6, 0.8)
      def bounds(c: String, pfx: String) = qs.zipWithIndex.map { case (p, i) =>
        round(expr(s"percentile($c, $p)"), 4).as(s"$pfx${i + 1}")
      }
      val b = r.agg(bounds("r_days", "r").head,
        (bounds("r_days", "r").tail ++ bounds("f", "f") ++ bounds("m", "m")): _*)
      def score(c: String, pfx: String) = lit(1) +
        (1 to 4).map(i => (col(c) > col(s"$pfx$i")).cast("int")).reduce(_ + _)
      r.crossJoin(broadcast(b))
        .groupBy(score("r_days", "r").as("r_score"), score("f", "f").as("f_score"),
          score("m", "m").as("m_score"))
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    },

    // R88 — Benford leading-digit profile (fraud / data-quality
    // screening): the distribution of first digits of the money column,
    // in integer permille against the row total. Purely scan-local
    // string-of-integer arithmetic plus one 9-row aggregate.
    Q(
      "q84_benford",
      """WITH dg AS (SELECT substring(CAST(CAST(round(l_extendedprice*100) AS BIGINT)
        |                     AS VARCHAR), 1, 1) AS digit
        |            FROM lineitem),
        |t AS (SELECT count(*) AS total FROM dg)
        |SELECT digit, count(*) AS n,
        |  (count(*) * 1000) // max(total) AS permille
        |FROM dg CROSS JOIN t
        |GROUP BY digit ORDER BY digit""".stripMargin
    ) { (s, d) =>
      val dg = Tables.lineitem(s, d)
        .select(substring(round(col("l_extendedprice") * 100).cast("long")
          .cast("string"), 1, 1).as("digit"))
        .localCheckpoint(true) // total + per-digit agg share one scan
      val t = dg.agg(count(lit(1)).as("total"))
      dg.crossJoin(broadcast(t))
        .groupBy("digit")
        .agg(count(lit(1)).as("n"),
          expr("(count(1) * 1000) DIV max(total)").as("permille"))
        .orderBy("digit")
    },

    // R89 — referential-integrity audit (the data-quality gate a
    // warehouse runs before trusting joins): orphan counts per foreign
    // key, each an anti join on the pruned KEY COLUMNS only — fixed-width
    // keys shuffle (or the dim broadcasts when AQE sizes it small), the
    // fact is touched once per check. Zero orphans is the expected
    // answer on sound data; the entry certifies the CHECK, the oracle
    // certifies the zeros.
    Q(
      "q85_ref_integrity",
      """SELECT 'lineitem->orders' AS fk, (SELECT count(*) FROM lineitem
        |  WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey))
        |  AS n_orphans
        |UNION ALL
        |SELECT 'lineitem->part', (SELECT count(*) FROM lineitem
        |  WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey))
        |UNION ALL
        |SELECT 'lineitem->supplier', (SELECT count(*) FROM lineitem
        |  WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey))
        |UNION ALL
        |SELECT 'orders->customer', (SELECT count(*) FROM orders
        |  WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey))
        |ORDER BY fk""".stripMargin
    ) { (s, d) =>
      def orphans(label: String, child: org.apache.spark.sql.DataFrame, key: String,
                  parent: org.apache.spark.sql.DataFrame, pkey: String) =
        child.select(col(key))
          .join(parent.select(col(pkey)), col(key) === col(pkey), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .select(lit(label).as("fk"), col("n_orphans"))
      orphans("lineitem->orders", Tables.lineitem(s, d), "l_orderkey",
          Tables.orders(s, d), "o_orderkey")
        .unionByName(orphans("lineitem->part", Tables.lineitem(s, d), "l_partkey",
          Tables.part(s, d), "p_partkey"))
        .unionByName(orphans("lineitem->supplier", Tables.lineitem(s, d), "l_suppkey",
          Tables.supplier(s, d), "s_suppkey"))
        .unionByName(orphans("orders->customer", Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d), "c_custkey"))
        .orderBy("fk")
    },

    // R90 — Gini coefficient of customer spend per market segment (the
    // inequality readout behind every "how concentrated is our revenue"
    // question; pairs with q81's HHI and q82's Pareto share). Rank
    // formula G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) over cents: the
    // rank product sums in decimal(38,0) (HUGEINT in DuckDB), and the
    // ONE double expression at the end is the identical tree both
    // engines. Ties in x make Σ i·x_i order-independent among tied
    // ranks, so row_number's custkey tie-break is for determinism only.
    // Shape: fact→per-customer agg (one shuffle), then the rank window
    // runs on the CUSTOMER-sized frame, never the fact; at warehouse
    // scale the per-segment sort would go range-partitioned prefix-rank,
    // same algebra.
    Q(
      "q86_gini",
      """WITH spend AS (
        |  SELECT c_mktsegment, o_custkey,
        |    sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |r AS (
        |  SELECT c_mktsegment, cents,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY cents, o_custkey) AS i
        |  FROM spend)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  (2.0 * CAST(sum(CAST(i AS HUGEINT) * CAST(cents AS HUGEINT)) AS DOUBLE)
        |   - (CAST(count(*) AS DOUBLE) + 1.0) * CAST(sum(cents) AS DOUBLE))
        |  / (CAST(count(*) AS DOUBLE) * CAST(sum(cents) AS DOUBLE)) AS gini
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val spend = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      // segment partitions scale with the data (|customers|/5 rows each):
      // the rank comes from Blocked.cumulativeBy's blocked row_number
      val ranked = graft.operators.Blocked.cumulativeBy(spend,
        Seq("c_mktsegment"), Seq(col("cents"), col("o_custkey")),
        Nil, rn = Some("i"))
      ranked.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("i").cast("decimal(38,0)") * col("cents").cast("decimal(38,0)"))
            .as("ix"),
          sum("cents").as("sx"))
        .select(col("c_mktsegment"), col("n_cust"),
          ((lit(2.0) * col("ix").cast("double")
            - (col("n_cust").cast("double") + lit(1.0)) * col("sx").cast("double"))
            / (col("n_cust").cast("double") * col("sx").cast("double"))).as("gini"))
        .orderBy("c_mktsegment")
    },

    // R91 — weighted median (the revenue-weighted "typical" quantity:
    // half the DOLLARS sit at or below it, where q80's MAD and plain
    // medians weight every row equally). Exact integer algebra end to
    // end: weights are cents, the fact reduces map-side to one row per
    // (flag, qty) before any window runs, and the cumulative window
    // then walks |distinct qty| rows per flag — never the fact. The
    // answer is min{q : 2·cumw(q) ≥ totw}, pure bigint comparisons.
    Q(
      "q87_weighted_median",
      """WITH w AS (
        |  SELECT l_returnflag, CAST(round(l_quantity) AS BIGINT) AS qty,
        |    sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS wt
        |  FROM lineitem GROUP BY 1, 2),
        |c AS (
        |  SELECT l_returnflag, qty, wt,
        |    sum(wt) OVER (PARTITION BY l_returnflag ORDER BY qty
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(wt) OVER (PARTITION BY l_returnflag) AS tot
        |  FROM w)
        |SELECT l_returnflag, min(qty) AS wmedian_qty
        |FROM c WHERE 2*cum >= tot GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val byQty = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), round(col("l_quantity")).cast("long").as("qty"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("wt"))
      val ord = Window.partitionBy("l_returnflag").orderBy("qty")
      byQty
        .withColumn("cum", sum("wt").over(
          ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("tot", sum("wt").over(Window.partitionBy("l_returnflag")))
        .filter(lit(2) * col("cum") >= col("tot"))
        .groupBy("l_returnflag").agg(min("qty").as("wmedian_qty"))
        .orderBy("l_returnflag")
    },

    // R94 — Kendall tau-b rank correlation, completing the correlation
    // family (Pearson q60 measures linearity, Spearman q73 monotonicity
    // by ranks, Kendall by PAIR CONCORDANCE — the robust choice under
    // heavy ties). The fact reduces map-side to (flag, x, y, count)
    // CELLS; concordant/discordant mass comes from the cell×cell join
    // under x1<x2 (≤|cells|² pairs, never row pairs), tie corrections
    // from the x/y marginals. All quadratics in decimal(38,0)/HUGEINT
    // (q73's overflow precedent); halvings avoided by the doubled
    // identity tau_b = 2(nc−nd)/√((N0−N1)(N0−N2)) with N = n(n−1)
    // forms, so the only float is the ONE final tree.
    Q(
      "q88_kendall",
      """WITH cells AS (
        |  SELECT l_returnflag AS f, CAST(round(l_quantity) AS BIGINT) AS x,
        |    CAST(round(l_extendedprice*100) AS BIGINT) // 1000000 AS y,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1, 2, 3),
        |tot AS (SELECT f, CAST(sum(c) AS BIGINT) AS n FROM cells GROUP BY 1),
        |mx AS (SELECT f, CAST(sum(CAST(nx AS HUGEINT) * (nx - 1)) AS HUGEINT) AS n1
        |       FROM (SELECT f, CAST(sum(c) AS BIGINT) AS nx FROM cells GROUP BY f, x)
        |       GROUP BY 1),
        |my AS (SELECT f, CAST(sum(CAST(ny AS HUGEINT) * (ny - 1)) AS HUGEINT) AS n2
        |       FROM (SELECT f, CAST(sum(c) AS BIGINT) AS ny FROM cells GROUP BY f, y)
        |       GROUP BY 1),
        |pairs AS (
        |  SELECT a.f,
        |    CAST(sum(CASE WHEN a.y < b.y
        |      THEN CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT) ELSE 0 END) AS HUGEINT)
        |      AS nc,
        |    CAST(sum(CASE WHEN a.y > b.y
        |      THEN CAST(a.c AS HUGEINT) * CAST(b.c AS HUGEINT) ELSE 0 END) AS HUGEINT)
        |      AS nd
        |  FROM cells a JOIN cells b ON a.f = b.f AND a.x < b.x
        |  GROUP BY 1)
        |SELECT f AS l_returnflag, n AS n_rows,
        |  (2.0 * (CAST(nc AS DOUBLE) - CAST(nd AS DOUBLE)))
        |  / sqrt(CAST(CAST(n AS HUGEINT) * (n - 1) - n1 AS DOUBLE)
        |       * CAST(CAST(n AS HUGEINT) * (n - 1) - n2 AS DOUBLE)) AS tau_b
        |FROM pairs JOIN tot USING (f) JOIN mx USING (f) JOIN my USING (f)
        |ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val cells = Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("f"),
          round(col("l_quantity")).cast("long").as("x"),
          expr("CAST(round(l_extendedprice*100) AS BIGINT) DIV 1000000").as("y"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // marginals ×2 + totals + the pair self-join ×2
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val tot = cells.groupBy("f").agg(sum("c").as("n"))
      val mxs = cells.groupBy("f", "x").agg(sum("c").as("nx"))
        .groupBy("f").agg(sum(dec(col("nx")) * (col("nx") - 1)).as("n1"))
      val mys = cells.groupBy("f", "y").agg(sum("c").as("ny"))
        .groupBy("f").agg(sum(dec(col("ny")) * (col("ny") - 1)).as("n2"))
      val a = cells.select(col("f"), col("x").as("xa"), col("y").as("ya"), col("c").as("ca"))
      val b = cells.select(col("f"), col("x").as("xb"), col("y").as("yb"), col("c").as("cb"))
      val pairs = a.join(b, Seq("f")).filter(col("xa") < col("xb"))
        .groupBy("f")
        .agg(sum(when(col("ya") < col("yb"), dec(col("ca")) * dec(col("cb")))
            .otherwise(lit(0))).as("nc"),
          sum(when(col("ya") > col("yb"), dec(col("ca")) * dec(col("cb")))
            .otherwise(lit(0))).as("nd"))
      pairs.join(tot, Seq("f")).join(mxs, Seq("f")).join(mys, Seq("f"))
        .select(col("f").as("l_returnflag"), col("n").as("n_rows"),
          ((lit(2.0) * (col("nc").cast("double") - col("nd").cast("double")))
            / sqrt((dec(col("n")) * (col("n") - 1) - col("n1")).cast("double")
              * (dec(col("n")) * (col("n") - 1) - col("n2")).cast("double")))
            .as("tau_b"))
        .orderBy("l_returnflag")
    },

    // R97 — k-anonymity audit (privacy risk before a data release, the
    // governance sibling of ev14's pseudonymization: hashing direct
    // identifiers does NOT stop re-identification through
    // quasi-identifier combinations). Group by the quasi-identifier
    // tuple, then report per segment: the k actually achieved (min
    // group size), how many rows sit in groups below the target k=5,
    // and the exposure permille — all exact integers from two
    // fixed-width aggregates (tuple groups, then segment rollup).
    Q(
      "q89_kanonymity",
      """WITH g AS (
        |  SELECT c_mktsegment, c_nationkey,
        |    CAST(count(*) AS BIGINT) AS gsize
        |  FROM customer GROUP BY 1, 2)
        |SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(min(gsize) AS BIGINT) AS k_achieved,
        |  CAST(sum(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) AS BIGINT)
        |    AS rows_below_k,
        |  CAST(sum(CASE WHEN gsize < 5 THEN gsize ELSE 0 END) AS BIGINT) * 1000
        |    // CAST(sum(gsize) AS BIGINT) AS exposed_permille
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("gsize"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_groups"),
          min("gsize").as("k_achieved"),
          sum(when(col("gsize") < 5, col("gsize")).otherwise(0L)).as("rows_below_k"),
          sum("gsize").as("total"))
        .select(col("c_mktsegment"), col("n_groups"), col("k_achieved"),
          col("rows_below_k"),
          expr("rows_below_k * 1000 DIV total").as("exposed_permille"))
        .orderBy("c_mktsegment")
    },

    // R98 — mergeable quantile sketch rollup, completing the sketch
    // family (T18 HLL distinct, T23 count-min heavy hitters): a 64-bin
    // equi-width histogram of order value is built PER MONTH SEGMENT
    // (the nightly-build unit), merged by plain integer bin-count sums,
    // and quantiles read off the merged cumulative — segment-build/
    // rollup economics with a bin-width error bound ((hi−lo)/64,
    // deterministic, unlike GK/KLL's probabilistic bounds). The oracle
    // computes the SAME binned estimate DIRECTLY over the full table
    // with no segment intermediate, so the hash match proves the merge
    // is lossless — the sketch's whole contract. All integer: bin ids
    // by integral DIV over a broadcast 1-row (lo, hi), cumulative over
    // the 64-row merged frame, estimates as bin upper bounds in cents.
    Q(
      "q90_quantile_rollup",
      """WITH cents AS (
        |  SELECT o_orderkey, date_trunc('month', o_orderdate) AS seg,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS v
        |  FROM orders),
        |b AS (SELECT min(v) AS lo, max(v) AS hi, CAST(count(*) AS BIGINT) AS n
        |      FROM cents),
        |seg_hist AS (
        |  SELECT seg, ((v - lo) * 64) // (hi - lo + 1) AS bin,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM cents CROSS JOIN b GROUP BY 1, 2),
        |merged AS (
        |  SELECT bin, CAST(sum(cnt) AS BIGINT) AS cnt FROM seg_hist GROUP BY 1),
        |cum AS (
        |  SELECT bin, cnt,
        |    CAST(sum(cnt) OVER (ORDER BY bin
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
        |  FROM merged),
        |qs AS (SELECT unnest([50, 90, 99]) AS p100)
        |SELECT p100, min(lo + ((bin + 1) * (hi - lo + 1)) // 64) AS est_cents
        |FROM qs JOIN cum ON 100 * c >= p100 * (SELECT n FROM b)
        |CROSS JOIN b
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val cents = Tables.orders(s, d)
        .select(date_trunc("month", col("o_orderdate")).as("seg"),
          round(col("o_totalprice") * 100).cast("long").as("v"))
      val b = cents.agg(min("v").as("lo"), max("v").as("hi"),
        count(lit(1)).as("n"))
      val segHist = cents.crossJoin(broadcast(b))
        .groupBy(col("seg"), expr("((v - lo) * 64) DIV (hi - lo + 1)").as("bin"))
        .agg(count(lit(1)).as("cnt"))
      val merged = segHist.groupBy("bin").agg(sum("cnt").as("cnt"))
      val cum = merged.withColumn("c",
        sum("cnt").over(Window.orderBy("bin") // 64-row frame: bounded
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val qs = s.range(1).select(explode(array(lit(50L), lit(90L), lit(99L))).as("p100"))
      qs.crossJoin(broadcast(b)) // 3×1 rows: (p100, lo, hi, n)
        .join(cum, lit(100) * col("c") >= col("p100") * col("n"))
        .groupBy("p100")
        .agg(min(expr("lo + ((bin + 1) * (hi - lo + 1)) DIV 64")).as("est_cents"))
        .orderBy("p100")
    },

    // R99 — discrete percentiles (percentile_disc): the SQL-standard
    // WITHIN GROUP form that returns an ACTUAL data value (smallest
    // value whose cume_dist ≥ p) — q22's percentile_cont interpolates,
    // which is the wrong tool when the quantile must be a real
    // observation (a real order quantity, a real latency sample).
    // Because the result is an element, not an interpolation, the
    // cross-engine compare is exact equality with no quantization.
    // One group-by over fixed-width keys; Spark evaluates the three
    // percentiles in a single aggregate pass per group.
    Q(
      "q91_percentile_disc",
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
        |  percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity) AS p50,
        |  percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25"),
          expr("percentile_disc(0.5)  WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
          expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75"))
        .orderBy("l_returnflag")
    },

    // R125 — Theil-Sen robust trend: per user, the slope of daily spend
    // vs calendar day as the LOWER MEDIAN of all pairwise slopes —
    // the estimator that shrugs off the outlier days OLS (q60's regr_)
    // chases. Slopes are ONE fixed IEEE division of exact integers
    // (cents delta / day delta), so the multiset is engine-identical
    // and the positional median needs no quantization. Scale: the
    // pair join is per-user O(d²) with d CALENDAR-bounded (days in
    // range), never corpus-bounded — the same bound ev35's fold rides.
    Q(
      "q101_theilsen",
      """WITH daily AS (
        |  SELECT user_id, date_trunc('day', ts) AS dy,
        |         sum(CAST(round(value*100) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT user_id, CAST(cents AS BIGINT) AS cents,
        |         CAST(date_diff('day', TIMESTAMP '2024-01-01 00:00:00', dy)
        |              AS BIGINT) AS di
        |  FROM daily),
        |pairs AS (
        |  SELECT a.user_id,
        |         CAST(b.cents - a.cents AS DOUBLE) / (b.di - a.di) AS slope
        |  FROM idx a JOIN idx b
        |    ON a.user_id = b.user_id AND b.di > a.di),
        |ranked AS (
        |  SELECT user_id, slope,
        |         row_number() OVER (PARTITION BY user_id ORDER BY slope) AS rn,
        |         count(*) OVER (PARTITION BY user_id) AS cnt
        |  FROM pairs)
        |SELECT user_id, CAST(cnt AS BIGINT) AS n_pairs, slope AS theil_sen
        |FROM ranked WHERE rn = (cnt + 1) // 2
        |ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), date_trunc("day", col("ts")).as("dy"))
        .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
        .select(col("user_id"), col("cents"),
          datediff(col("dy"), lit("2024-01-01 00:00:00").cast("timestamp"))
            .cast("long").as("di"))
      val a = daily.select(col("user_id"), col("cents").as("ca"), col("di").as("da"))
      val b = daily.select(col("user_id"), col("cents").as("cb"), col("di").as("db"))
      val pairs = a.join(b, Seq("user_id")).filter(col("db") > col("da"))
        .select(col("user_id"),
          ((col("cb") - col("ca")).cast("double") / (col("db") - col("da")))
            .as("slope"))
      val w = Window.partitionBy("user_id")
      pairs
        .withColumn("rn", row_number().over(w.orderBy("slope")))
        .withColumn("cnt", count(lit(1)).over(w))
        .filter(col("rn") === expr("(cnt + 1) DIV 2"))
        .select(col("user_id"), col("cnt").as("n_pairs"),
          col("slope").as("theil_sen"))
        .orderBy("user_id")
    },

    // R137 — robust outlier counts (modified z-score): per group, flag
    // values whose |deviation from the median| exceeds 3·1.4826·MAD —
    // the robust fence that survives the heavy tails classic ±3σ
    // (ev9's shape) is dragged by. Median and MAD via exact
    // percentile_disc (no rounding license needed, unlike q80's
    // averaged-median form); the fence comparison stays in integers
    // (|c−med|·10000 > 44478·mad). Two group-aggregate passes with the
    // per-group model broadcast back — never a self-join.
    Q(
      "q102_robust_outliers",
      """WITH sc AS (SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders),
        |med AS (SELECT grp,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) AS med
        |  FROM sc GROUP BY 1),
        |mad AS (SELECT sc.grp,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(cents - med)) AS mad
        |  FROM sc JOIN med USING (grp) GROUP BY 1)
        |SELECT sc.grp, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CASE WHEN abs(cents - med) * 10000 > 44478 * mad
        |                THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  (CAST(sum(CASE WHEN abs(cents - med) * 10000 > 44478 * mad
        |                 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
        |    // CAST(count(*) AS BIGINT) AS outlier_permille
        |FROM sc JOIN med USING (grp) JOIN mad USING (grp)
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
        .localCheckpoint(true) // median pass + MAD pass + fence pass
      val med = sc.groupBy("grp").agg(
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cents)").as("med"))
      val mad = sc.join(broadcast(med), Seq("grp"))
        .groupBy("grp").agg(expr(
          "percentile_disc(0.5) WITHIN GROUP (ORDER BY abs(cents - med))").as("mad"))
      val out = when(abs(col("cents") - col("med")) * 10000 > lit(44478L) * col("mad"),
        1L).otherwise(0L)
      sc.join(broadcast(med), Seq("grp")).join(broadcast(mad), Seq("grp"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum(out).as("n_outliers"))
        .select(col("grp"), col("n"), col("n_outliers"),
          expr("(n_outliers * 1000) DIV n").as("outlier_permille"))
        .orderBy("grp")
    },

    // R143 — month-over-month / year-over-year growth: the first table
    // on every revenue dashboard. Months are INTEGER indices (y·12+m —
    // identical arithmetic both engines, no interval types, q95's
    // precedent), revenue exact cents; MoM and YoY come from lag(1) /
    // lag(12) over the CALENDAR-sized month spine (the fact is reduced
    // by one aggregate first; the window never sees it). Ratios are
    // single double divisions of exact integers — deltas can be
    // NEGATIVE, and Spark's DIV truncates toward zero while DuckDB's //
    // floors, so integer division is BANNED on signed deltas here.
    Q(
      "q104_growth_mom",
      """WITH m AS (
        |  SELECT year(CAST(o_orderdate AS DATE)) * 12
        |           + month(CAST(o_orderdate AS DATE)) - 1 AS mi,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1),
        |w AS (SELECT mi, rev,
        |        lag(rev, 1) OVER (ORDER BY mi) AS prev_m,
        |        lag(rev, 12) OVER (ORDER BY mi) AS prev_y
        |      FROM m)
        |SELECT mi // 12 AS yr, (mi % 12) + 1 AS mo, rev,
        |  CASE WHEN prev_m IS NULL THEN NULL
        |       ELSE CAST(rev - prev_m AS DOUBLE) / CAST(prev_m AS DOUBLE) END
        |    AS mom_growth,
        |  CASE WHEN prev_y IS NULL THEN NULL
        |       ELSE CAST(rev - prev_y AS DOUBLE) / CAST(prev_y AS DOUBLE) END
        |    AS yoy_growth
        |FROM w ORDER BY yr, mo""".stripMargin
    ) { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy((year(col("o_orderdate").cast("date")) * 12
          + month(col("o_orderdate").cast("date")) - 1).as("mi"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
      // the spine is calendar-bounded (≤ a few hundred rows at any SF):
      // the one place an unpartitioned window is the RIGHT plan
      val w = Window.orderBy("mi")
      m.withColumn("prev_m", lag("rev", 1).over(w))
        .withColumn("prev_y", lag("rev", 12).over(w))
        .select(expr("mi DIV 12").as("yr"), (col("mi") % 12 + 1).as("mo"),
          col("rev"),
          when(col("prev_m").isNull, lit(null))
            .otherwise((col("rev") - col("prev_m")).cast("double")
              / col("prev_m").cast("double")).as("mom_growth"),
          when(col("prev_y").isNull, lit(null))
            .otherwise((col("rev") - col("prev_y")).cast("double")
              / col("prev_y").cast("double")).as("yoy_growth"))
        .orderBy("yr", "mo")
    },

    // R144 — ABC inventory classification (the assortment-planning
    // workhorse next to q82's Pareto coverage): per brand, parts ranked
    // by lineitem revenue, A = parts inside the first 80% of cumulative
    // revenue, B = next 15%, C = tail. Same shape as q82 — one fact
    // aggregate to the (brand, part) frame, windows partitioned by
    // brand over PART-sized partitions (dimension-bounded, never the
    // fact) — with exact-integer class boundaries: 5·cum ≤ 4·total and
    // 20·cum ≤ 19·total (no percentage float anywhere). The prior-row
    // cum (cum − rev) decides the class so the straddling part counts
    // in the class it completes.
    Q(
      "q105_abc_class",
      """WITH pr AS (
        |  SELECT p_brand, l_partkey,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT p_brand, rev,
        |    sum(rev) OVER (PARTITION BY p_brand ORDER BY rev DESC, l_partkey
        |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(rev) OVER (PARTITION BY p_brand) AS total
        |  FROM pr),
        |cl AS (
        |  SELECT p_brand, rev,
        |    CASE WHEN 5 * (cum - rev) < 4 * total THEN 'A'
        |         WHEN 20 * (cum - rev) < 19 * total THEN 'B'
        |         ELSE 'C' END AS abc
        |  FROM w)
        |SELECT p_brand, abc, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(rev) AS BIGINT) AS class_cents
        |FROM cl GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val pr = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "l_partkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"))
      // brand partitions scale with the data (|parts|/25 rows each), so
      // the running sum goes BLOCKED-within-brand (Blocked.cumulativeBy)
      // and the per-brand total is a 25-row broadcast, not a window
      val tot = pr.groupBy("p_brand").agg(sum("rev").as("total"))
      val w = graft.operators.Blocked.cumulativeBy(pr, Seq("p_brand"),
          Seq(col("rev").desc, col("l_partkey")), Seq("rev"))
        .withColumnRenamed("cum_rev", "cum")
        .join(broadcast(tot), Seq("p_brand"))
      w.withColumn("abc",
          when(lit(5) * (col("cum") - col("rev")) < lit(4) * col("total"), "A")
            .when(lit(20) * (col("cum") - col("rev")) < lit(19) * col("total"), "B")
            .otherwise("C"))
        .groupBy("p_brand", "abc")
        .agg(count(lit(1)).as("n_parts"), sum("rev").as("class_cents"))
        .orderBy("p_brand", "abc")
    },

    // R150 — XYZ demand-variability classification (q105's ABC ranks by
    // VALUE; XYZ ranks by PREDICTABILITY — the two together drive every
    // stocking policy). Per part, the coefficient of variation of its
    // monthly demand — months the part didn't sell count as ZERO demand
    // (n is the global month horizon, so absent cells need no grid: S
    // and Σx² are unchanged by zeros). The CV thresholds 0.2/0.5 are
    // EXACT integer cross-multiplies on the variance identity:
    // CV² = (n·Σx² − S²)/S², so X ⟺ 25(n·Σx² − S²) ≤ S², Y ⟺ 4(...) ≤
    // S², products in decimal(38,0)/HUGEINT. One fact aggregate to
    // (part, month) cells; everything after is part-sized.
    Q(
      "q108_xyz_class",
      """WITH pm AS (
        |  SELECT l_partkey,
        |    year(CAST(l_shipdate AS DATE)) * 12
        |      + month(CAST(l_shipdate AS DATE)) - 1 AS mi,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem GROUP BY 1, 2),
        |h AS (SELECT count(DISTINCT mi) AS n FROM pm),
        |ps AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS s,
        |         CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS q2
        |       FROM pm GROUP BY 1),
        |cls AS (
        |  SELECT l_partkey, s,
        |    CASE WHEN 25 * (n * q2 - CAST(s AS HUGEINT) * s)
        |              <= CAST(s AS HUGEINT) * s THEN 'X'
        |         WHEN 4 * (n * q2 - CAST(s AS HUGEINT) * s)
        |              <= CAST(s AS HUGEINT) * s THEN 'Y'
        |         ELSE 'Z' END AS xyz
        |  FROM ps CROSS JOIN h)
        |SELECT p_brand, xyz, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(s) AS BIGINT) AS total_qty
        |FROM cls JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val pm = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"),
          (year(col("l_shipdate").cast("date")) * 12
            + month(col("l_shipdate").cast("date")) - 1).as("mi"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("q"))
        .localCheckpoint(true) // horizon count + per-part stats read it
      val h = pm.agg(countDistinct("mi").as("n"))
      val ps = pm.groupBy("l_partkey")
        .agg(sum("q").as("s"), sum(dec(col("q")) * col("q")).as("q2"))
      val cls = ps.crossJoin(broadcast(h))
        .select(col("l_partkey"), col("s"),
          when(lit(25) * (dec(col("n")) * col("q2") - dec(col("s")) * col("s"))
              <= dec(col("s")) * col("s"), "X")
            .when(lit(4) * (dec(col("n")) * col("q2") - dec(col("s")) * col("s"))
              <= dec(col("s")) * col("s"), "Y")
            .otherwise("Z").as("xyz"))
      cls.join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "xyz")
        .agg(count(lit(1)).as("n_parts"), sum("s").as("total_qty"))
        .orderBy("p_brand", "xyz")
    },

    // R152 — classical monthly seasonal index (ratio-to-overall): the
    // "is December really bigger" number, exact: index(m) =
    // mean(month-m cell revenue) / mean(all cell revenue) =
    // (rev_m · cells) / (n_m · rev_total) as ONE integer cross-multiply
    // quantized to e6 by floor DIV — numerators pass 2^63, so the
    // products ride decimal(38,0)/HUGEINT. One fact aggregate to the
    // (year, month) cell frame; everything after is calendar-sized.
    Q(
      "q109_seasonal_index",
      """WITH ym AS (
        |  SELECT year(CAST(o_orderdate AS DATE)) AS yr,
        |    month(CAST(o_orderdate AS DATE)) AS mo,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY 1, 2),
        |tot AS (SELECT CAST(sum(rev) AS BIGINT) AS rev_all,
        |          CAST(count(*) AS BIGINT) AS cells FROM ym),
        |m AS (SELECT mo, CAST(sum(rev) AS BIGINT) AS rev_m,
        |        CAST(count(*) AS BIGINT) AS n_m
        |      FROM ym GROUP BY 1)
        |SELECT CAST(mo AS BIGINT) AS mo, rev_m, n_m,
        |  CAST((1000000 * CAST(rev_m AS HUGEINT) * (SELECT cells FROM tot))
        |    // (CAST(n_m AS HUGEINT) * (SELECT rev_all FROM tot)) AS BIGINT)
        |    AS index_e6
        |FROM m ORDER BY mo""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val ym = Tables.orders(s, d)
        .groupBy(year(col("o_orderdate").cast("date")).as("yr"),
          month(col("o_orderdate").cast("date")).as("mo"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev"))
        .localCheckpoint(true) // totals + per-month both read it
      val tot = ym.agg(sum("rev").as("rev_all"), count(lit(1)).as("cells"))
      val m = ym.groupBy("mo")
        .agg(sum("rev").as("rev_m"), count(lit(1)).as("n_m"))
      m.crossJoin(broadcast(tot))
        .select(col("mo").cast("long").as("mo"), col("rev_m"), col("n_m"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * rev_m * cells) DIV (CAST(n_m AS DECIMAL(38,0)) * rev_all) AS BIGINT)")
            .as("index_e6"))
        .orderBy("mo")
    },

    // R155 — log-log price elasticity of demand per brand: the number
    // pricing teams actually move on, ε = d ln(qty)/d ln(price) as the
    // per-brand OLS slope over line items. Each ln is micro-quantized
    // ONCE to a 1e6 BIGINT at the row (tx19 discipline — qty ≥ 1 and
    // price ≥ 1 cent keep ln non-negative), so the per-brand moment
    // sums are EXACT integers under any partitioning, and the slope
    // n·Σxy − ΣxΣy / (n·Σx² − (Σx)²) is one double tree of exact
    // integers (products in decimal(38,0)/HUGEINT). One fact pass,
    // brand-sized output.
    Q(
      "q112_elasticity",
      """WITH r AS (
        |  SELECT p_brand,
        |    CAST(round(1000000 * ln(CAST(round(l_quantity) AS DOUBLE)))
        |      AS BIGINT) AS lq_e6,
        |    CAST(round(1000000 * ln(CAST(round(l_extendedprice
        |      / l_quantity * 100) AS DOUBLE))) AS BIGINT) AS lp_e6
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |m AS (SELECT p_brand, count(*) AS n,
        |        CAST(sum(lp_e6) AS BIGINT) AS sx,
        |        CAST(sum(lq_e6) AS BIGINT) AS sy,
        |        CAST(sum(CAST(lp_e6 AS HUGEINT) * lp_e6) AS HUGEINT) AS sxx,
        |        CAST(sum(CAST(lp_e6 AS HUGEINT) * lq_e6) AS HUGEINT) AS sxy
        |      FROM r GROUP BY 1)
        |SELECT p_brand, CAST(n AS BIGINT) AS n,
        |  CAST(round(1000000 * CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |    / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)) AS BIGINT)
        |    AS elasticity_e6
        |FROM m ORDER BY p_brand""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val r = Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"),
          round(lit(1000000) * log(round(col("l_quantity")).cast("double")))
            .cast("long").as("lq_e6"),
          round(lit(1000000) * log(round(col("l_extendedprice")
            / col("l_quantity") * 100).cast("double"))).cast("long").as("lp_e6"))
      val m = r.groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum("lp_e6").as("sx"), sum("lq_e6").as("sy"),
          sum(dec(col("lp_e6")) * col("lp_e6")).as("sxx"),
          sum(dec(col("lp_e6")) * col("lq_e6")).as("sxy"))
      m.select(col("p_brand"), col("n"),
          round(lit(1000000)
            * (dec(col("n")) * col("sxy") - dec(col("sx")) * col("sy")).cast("double")
            / (dec(col("n")) * col("sxx") - dec(col("sx")) * col("sx"))
              .cast("double")).cast("long").as("elasticity_e6"))
        .orderBy("p_brand")
    },

    // R158 — price waterfall / realization per brand: the revenue-
    // management table between list price and invoice — gross, discount
    // given, tax added, net realized, and the realization permille.
    // Every component is an INDEPENDENT per-line round to exact cents
    // (summing rounded components, never rounding sums — the repo-wide
    // money rule), so the waterfall reconciles by construction and the
    // permille is one floor DIV. One fact pass, brand-sized output.
    Q(
      "q113_price_waterfall",
      """SELECT p_brand,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |    AS gross_cents,
        |  CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT))
        |    AS BIGINT) AS discount_cents,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*l_tax*100)
        |    AS BIGINT)) AS BIGINT) AS tax_cents,
        |  CAST((sum(CAST(round(l_extendedprice*100) AS BIGINT))
        |    - sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT))) * 1000
        |    // sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |    AS realization_pm
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(
          sum(round(col("l_extendedprice") * 100).cast("long")).as("gross_cents"),
          sum(round(col("l_extendedprice") * col("l_discount") * 100)
            .cast("long")).as("discount_cents"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
            * col("l_tax") * 100).cast("long")).as("tax_cents"))
        .select(col("p_brand"), col("gross_cents"), col("discount_cents"),
          col("tax_cents"),
          expr("((gross_cents - discount_cents) * 1000) DIV gross_cents")
            .as("realization_pm"))
        .orderBy("p_brand")
    },

    // R159 — the ABC×XYZ policy matrix: q105 classifies parts by VALUE,
    // q108 by PREDICTABILITY; the 9-cell cross of the two (computed
    // GLOBALLY here) is the table stocking policy is actually read off
    // (AX = automate, CZ = make-to-order). Both classifications reuse
    // their entries' exact integer machinery — ABC via prior-row
    // cumulative cross-multiplies under the (rev desc, partkey) total
    // order, computed BLOCKED (Blocked.cumulative: the part frame scales
    // with the data, so the global running sum is range-partitioned
    // two-level, never one WindowExec task); XYZ via the
    // variance-identity cross-multiplies with absent months as exact
    // zeros. One fact aggregate; every later frame part-sized.
    Q(
      "q114_abc_xyz_cross",
      """WITH pm AS (
        |  SELECT l_partkey,
        |    year(CAST(l_shipdate AS DATE)) * 12
        |      + month(CAST(l_shipdate AS DATE)) - 1 AS mi,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS rev
        |  FROM lineitem GROUP BY 1, 2),
        |h AS (SELECT count(DISTINCT mi) AS nm FROM pm),
        |ps AS (SELECT l_partkey, CAST(sum(q) AS BIGINT) AS s,
        |         CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS q2,
        |         CAST(sum(rev) AS BIGINT) AS rev
        |       FROM pm GROUP BY 1),
        |w AS (SELECT l_partkey, s, q2, rev,
        |        sum(rev) OVER (ORDER BY rev DESC, l_partkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |        sum(rev) OVER () AS total
        |      FROM ps),
        |cls AS (
        |  SELECT l_partkey, rev,
        |    CASE WHEN 5 * (cum - rev) < 4 * total THEN 'A'
        |         WHEN 20 * (cum - rev) < 19 * total THEN 'B'
        |         ELSE 'C' END AS abc,
        |    CASE WHEN 25 * (nm * q2 - CAST(s AS HUGEINT) * s)
        |              <= CAST(s AS HUGEINT) * s THEN 'X'
        |         WHEN 4 * (nm * q2 - CAST(s AS HUGEINT) * s)
        |              <= CAST(s AS HUGEINT) * s THEN 'Y'
        |         ELSE 'Z' END AS xyz
        |  FROM w CROSS JOIN h)
        |SELECT abc, xyz, CAST(count(*) AS BIGINT) AS n_parts,
        |  CAST(sum(rev) AS BIGINT) AS rev_cents
        |FROM cls GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val pm = Tables.lineitem(s, d)
        .groupBy(col("l_partkey"),
          (year(col("l_shipdate").cast("date")) * 12
            + month(col("l_shipdate").cast("date")) - 1).as("mi"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("q"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"))
        .localCheckpoint(true) // horizon + per-part stats read it
      val h = pm.agg(countDistinct("mi").as("nm"))
      val ps = pm.groupBy("l_partkey")
        .agg(sum("q").as("s"), sum(dec(col("q")) * col("q")).as("q2"),
          sum("rev").as("rev"))
      // the part frame scales WITH the data (~200k×SF) — the global
      // cumulative runs BLOCKED (range-partitioned two-level form), not
      // through one WindowExec task; the grand total is a broadcast scalar
      val tot = ps.agg(sum("rev").as("total"))
      val w = Blocked.cumulative(ps,
          Seq(col("rev").desc, col("l_partkey")), Seq("rev"))
        .withColumnRenamed("cum_rev", "cum")
        .crossJoin(broadcast(tot))
      w.crossJoin(broadcast(h))
        .select(col("l_partkey"), col("rev"),
          when(lit(5) * (col("cum") - col("rev")) < lit(4) * col("total"), "A")
            .when(lit(20) * (col("cum") - col("rev")) < lit(19) * col("total"),
              "B")
            .otherwise("C").as("abc"),
          when(lit(25) * (dec(col("nm")) * col("q2") - dec(col("s")) * col("s"))
              <= dec(col("s")) * col("s"), "X")
            .when(lit(4) * (dec(col("nm")) * col("q2") - dec(col("s")) * col("s"))
              <= dec(col("s")) * col("s"), "Y")
            .otherwise("Z").as("xyz"))
        .groupBy("abc", "xyz")
        .agg(count(lit(1)).as("n_parts"), sum("rev").as("rev_cents"))
        .orderBy("abc", "xyz")
    },

    // R185 — Lorenz curve by spend decile: q86's Gini is the scalar,
    // this is the CURVE analysts actually plot (cumulative customer
    // share vs cumulative revenue share). Deciles are exact integer
    // arithmetic on the rank — ((rn−1)·10) DIV n + 1 under the
    // (spend, custkey) total order — so every engine cuts the same
    // customers; cumulative permilles are floor DIVs on the 10-row
    // decile frame. Scale: one fact aggregate to customer spend; the
    // global rank runs BLOCKED (Blocked.cumulative — the customer frame
    // scales with the data); everything after is 10 rows, cumulated via
    // a triangular broadcast join so no unpartitioned window remains.
    Q(
      "q123_lorenz",
      """WITH sp AS (
        |  SELECT o_custkey AS ck,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sp),
        |rk AS (SELECT cents,
        |         row_number() OVER (ORDER BY cents, ck) AS rn FROM sp),
        |dc AS (SELECT ((rn - 1) * 10) // n.n + 1 AS decile, cents FROM rk, n),
        |agg AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_cust,
        |          CAST(sum(cents) AS BIGINT) AS rev_c
        |        FROM dc GROUP BY 1),
        |cum AS (SELECT decile, n_cust, rev_c,
        |          sum(n_cust) OVER (ORDER BY decile) AS cum_cust,
        |          sum(rev_c) OVER (ORDER BY decile) AS cum_rev,
        |          sum(n_cust) OVER () AS tot_cust,
        |          sum(rev_c) OVER () AS tot_rev
        |        FROM agg)
        |SELECT decile, n_cust, rev_c,
        |  CAST((cum_cust * 1000) // tot_cust AS BIGINT) AS cum_pop_pm,
        |  CAST((cum_rev * 1000) // tot_rev AS BIGINT) AS cum_rev_pm
        |FROM cum ORDER BY decile""".stripMargin
    ) { (s, d) =>
      val sp = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("ck"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val n = sp.agg(count(lit(1)).as("n"))
      // customer frame scales with the data — the global rank runs BLOCKED
      // (range-partitioned two-level row_number), never one WindowExec task
      val rk = Blocked.cumulative(sp, Seq(col("cents"), col("ck")), Nil,
        rn = Some("rn"))
      val agg = rk.crossJoin(broadcast(n))
        .select(expr("((rn - 1) * 10) DIV n + 1").as("decile"), col("cents"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n_cust"), sum("cents").as("rev_c"))
        .localCheckpoint(true) // triangular cum + totals both read it
      // cumulative over the 10-row decile frame: triangular broadcast join
      // (no unpartitioned window anywhere in this plan)
      val prev = agg.select(col("decile").as("d2"), col("n_cust").as("nc2"),
        col("rev_c").as("rc2"))
      val tot = agg.agg(sum("n_cust").as("tot_cust"), sum("rev_c").as("tot_rev"))
      agg.join(broadcast(prev), col("d2") <= col("decile"))
        .groupBy("decile", "n_cust", "rev_c")
        .agg(sum("nc2").as("cum_cust"), sum("rc2").as("cum_rev"))
        .crossJoin(broadcast(tot))
        .select(col("decile"), col("n_cust"), col("rev_c"),
          expr("(cum_cust * 1000) DIV tot_cust").as("cum_pop_pm"),
          expr("(cum_rev * 1000) DIV tot_rev").as("cum_rev_pm"))
        .orderBy("decile")
    },

    // R186 — price-point (ending-digit) profile: the psychological-
    // pricing audit — which cents endings dominate the assortment and
    // what share the charm endings (.99/.95/.49) carry. Pure
    // scan-local arithmetic (cents mod 100) + one dimension-sized
    // aggregate; share one floor DIV vs the broadcast total.
    Q(
      "q124_price_points",
      """WITH p AS (
        |  SELECT CAST(round(p_retailprice*100) AS BIGINT) % 100 AS ending
        |  FROM part),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM p)
        |SELECT ending,
        |  CAST(count(*) AS BIGINT) AS n_parts,
        |  (CAST(count(*) AS BIGINT) * 1000) // (SELECT total FROM t) AS share_pm,
        |  CASE WHEN ending IN (99, 95, 49) THEN 1 ELSE 0 END AS is_charm
        |FROM p GROUP BY ending ORDER BY ending""".stripMargin
    ) { (s, d) =>
      val p = Tables.part(s, d)
        .select((round(col("p_retailprice") * 100).cast("long") % 100).as("ending"))
      val t = p.agg(count(lit(1)).as("total"))
      p.groupBy("ending").agg(count(lit(1)).as("n_parts"))
        .crossJoin(broadcast(t))
        .select(col("ending"), col("n_parts"),
          expr("(n_parts * 1000) DIV total").as("share_pm"),
          when(col("ending").isin(99L, 95L, 49L), 1L).otherwise(0L).as("is_charm"))
        .orderBy("ending")
    },

    // R193 — median with a DISTRIBUTION-FREE 95% CI (order-statistic
    // binomial bounds): the point estimate q111 reports, plus the
    // uncertainty no parametric formula gives for a discrete skewed
    // count. CI ranks are the standard normal-approximation bounds
    // lo=⌊(n−1.96√n)/2⌋, hi=1+⌈(n+1.96√n)/2⌉ clamped to [1,n] — sqrt
    // is IEEE-portable, floor/ceil of the identical double tree land
    // on the same integers; all three picks are exact rank lookups on
    // (segment, orders-per-customer) CELLS (count domain is small, so
    // cells stay bounded at any scale — the ev19 discipline). One
    // customer-keyed aggregate, windows only on cells.
    Q(
      "q126_median_ci",
      """WITH oc AS (
        |  SELECT o_custkey AS ck, c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS k
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |cells AS (SELECT seg, k, CAST(count(*) AS BIGINT) AS c FROM oc GROUP BY 1, 2),
        |cum AS (SELECT seg, k, c,
        |          sum(c) OVER (PARTITION BY seg ORDER BY k) AS cum,
        |          sum(c) OVER (PARTITION BY seg) AS n
        |        FROM cells),
        |idx AS (SELECT seg, CAST(max(n) AS BIGINT) AS n,
        |          greatest(1, CAST(floor((max(n) - 1.96*sqrt(max(n)))/2) AS BIGINT)) AS lo_r,
        |          (CAST(max(n) AS BIGINT) + 1) // 2 AS med_r,
        |          least(CAST(max(n) AS BIGINT),
        |            1 + CAST(ceil((max(n) + 1.96*sqrt(max(n)))/2) AS BIGINT)) AS hi_r
        |        FROM cum GROUP BY seg),
        |pick AS (SELECT c.seg,
        |           min(CASE WHEN c.cum >= i.lo_r THEN c.k END) AS ci_lo,
        |           min(CASE WHEN c.cum >= i.med_r THEN c.k END) AS median_orders,
        |           min(CASE WHEN c.cum >= i.hi_r THEN c.k END) AS ci_hi
        |         FROM cum c JOIN idx i ON c.seg = i.seg GROUP BY c.seg)
        |SELECT p.seg, i.n, p.median_orders, p.ci_lo, p.ci_hi, i.lo_r, i.hi_r
        |FROM pick p JOIN idx i ON p.seg = i.seg ORDER BY p.seg""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val oc = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey").as("ck"), col("seg"))
        .agg(count(lit(1)).as("k"))
      val cells = oc.groupBy("seg", "k").agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // cum windows + idx + picks read it
      val cum = cells
        .withColumn("cum", sum("c").over(Window.partitionBy("seg").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum("c").over(Window.partitionBy("seg")))
        .localCheckpoint(true)
      val idx = cum.groupBy("seg").agg(
        max("n").as("n"),
        greatest(lit(1L),
          expr("CAST(floor((max(n) - 1.96*sqrt(max(n)))/2) AS BIGINT)")).as("lo_r"),
        expr("(max(n) + 1) DIV 2").as("med_r"),
        least(max("n"),
          expr("1 + CAST(ceil((max(n) + 1.96*sqrt(max(n)))/2) AS BIGINT)")).as("hi_r"))
      val pick = cum.join(broadcast(idx.withColumnRenamed("n", "nn")), "seg")
        .groupBy("seg").agg(
          min(when(col("cum") >= col("lo_r"), col("k"))).as("ci_lo"),
          min(when(col("cum") >= col("med_r"), col("k"))).as("median_orders"),
          min(when(col("cum") >= col("hi_r"), col("k"))).as("ci_hi"))
      pick.join(broadcast(idx), "seg")
        .select(col("seg"), col("n"), col("median_orders"),
          col("ci_lo"), col("ci_hi"), col("lo_r"), col("hi_r"))
        .orderBy("seg")
    },

    // R197 — CR-k concentration ratios (CR4 / CR8 / CR20): the
    // antitrust companion to q81's HHI — what revenue share do the
    // top-k customers hold. Top-20 by a distributed TakeOrdered under
    // the (spend, custkey) total order (never a rank window over the
    // customer frame); the three shares come from ONE pass over the
    // 20-row frame vs the broadcast total. Output is one row.
    Q(
      "q127_cr_k",
      """WITH sp AS (
        |  SELECT o_custkey AS ck,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_cust,
        |        CAST(sum(cents) AS BIGINT) AS total FROM sp),
        |top AS (SELECT cents,
        |          row_number() OVER (ORDER BY cents DESC, ck) AS rn
        |        FROM sp ORDER BY cents DESC, ck LIMIT 20)
        |SELECT t.n_cust, t.total,
        |  (CAST(sum(CASE WHEN rn <= 4 THEN cents ELSE 0 END) AS BIGINT) * 1000)
        |    // t.total AS cr4_pm,
        |  (CAST(sum(CASE WHEN rn <= 8 THEN cents ELSE 0 END) AS BIGINT) * 1000)
        |    // t.total AS cr8_pm,
        |  (CAST(sum(cents) AS BIGINT) * 1000) // t.total AS cr20_pm
        |FROM top, t GROUP BY t.n_cust, t.total""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val sp = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("ck"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
        .localCheckpoint(true) // totals + top-k both read it
      val t = sp.agg(count(lit(1)).as("n_cust"), sum("cents").as("total"))
      // distributed top-k first; the rank window then runs on 20 rows
      val top = sp.orderBy(desc("cents"), col("ck")).limit(20)
        .withColumn("rn", row_number().over(Window.orderBy(desc("cents"), col("ck"))))
      top.crossJoin(broadcast(t))
        .groupBy("n_cust", "total")
        .agg(
          expr("(sum(CASE WHEN rn <= 4 THEN cents ELSE 0 END) * 1000) DIV total").as("cr4_pm"),
          expr("(sum(CASE WHEN rn <= 8 THEN cents ELSE 0 END) * 1000) DIV total").as("cr8_pm"),
          expr("(sum(cents) * 1000) DIV total").as("cr20_pm"))
        .select("n_cust", "total", "cr4_pm", "cr8_pm", "cr20_pm")
    },

    // R208 — Simpson's-paradox detector: does the AUTOMOBILE-vs-
    // BUILDING mean-order-value comparison flip sign inside any
    // nation stratum vs the aggregate — the confounding audit every
    // segment comparison should run before shipping a conclusion.
    // Sign compares are integer cross-multiplies (sa·nb vs sb·na — no
    // mean float ever), strata are nation-sized cells off ONE
    // fact⨝broadcast(customer) pass; the aggregate verdict broadcasts
    // from a 1-row frame.
    Q(
      "q131_simpsons",
      """WITH oc AS (
        |  SELECT c_nationkey AS nk, c_mktsegment AS seg,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')),
        |cell AS (SELECT nk,
        |    CAST(sum(CASE WHEN seg = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(sum(CASE WHEN seg = 'AUTOMOBILE' THEN cents ELSE 0 END) AS BIGINT) AS sa,
        |    CAST(sum(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
        |    CAST(sum(CASE WHEN seg = 'BUILDING' THEN cents ELSE 0 END) AS BIGINT) AS sb
        |  FROM oc GROUP BY 1),
        |g AS (SELECT CAST(sum(na) AS BIGINT) AS na, CAST(sum(sa) AS BIGINT) AS sa,
        |        CAST(sum(nb) AS BIGINT) AS nb, CAST(sum(sb) AS BIGINT) AS sb
        |      FROM cell),
        |gs AS (SELECT CASE WHEN sa * nb > sb * na THEN 1
        |                   WHEN sa * nb < sb * na THEN -1 ELSE 0 END AS overall_sign
        |       FROM g)
        |SELECT cell.nk AS nation, cell.na, cell.nb,
        |  CASE WHEN cell.na > 0 THEN cell.sa // cell.na END AS mean_a_c,
        |  CASE WHEN cell.nb > 0 THEN cell.sb // cell.nb END AS mean_b_c,
        |  gs.overall_sign,
        |  CASE WHEN cell.na = 0 OR cell.nb = 0 THEN 0
        |       WHEN cell.sa * cell.nb > cell.sb * cell.na THEN 1
        |       WHEN cell.sa * cell.nb < cell.sb * cell.na THEN -1 ELSE 0 END AS stratum_sign,
        |  CASE WHEN cell.na > 0 AND cell.nb > 0
        |        AND (CASE WHEN cell.sa * cell.nb > cell.sb * cell.na THEN 1
        |                  WHEN cell.sa * cell.nb < cell.sb * cell.na THEN -1
        |                  ELSE 0 END) * gs.overall_sign = -1
        |       THEN 1 ELSE 0 END AS reversal
        |FROM cell, gs ORDER BY nation""".stripMargin
    ) { (s, d) =>
      val oc = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey").as("nk"),
            col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .filter(col("seg").isin("AUTOMOBILE", "BUILDING"))
        .select(col("nk"), col("seg"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
      val cell = oc.groupBy("nk").agg(
        sum(when(col("seg") === "AUTOMOBILE", 1L).otherwise(0L)).as("na"),
        sum(when(col("seg") === "AUTOMOBILE", col("cents")).otherwise(0L)).as("sa"),
        sum(when(col("seg") === "BUILDING", 1L).otherwise(0L)).as("nb"),
        sum(when(col("seg") === "BUILDING", col("cents")).otherwise(0L)).as("sb"))
        .localCheckpoint(true) // aggregate verdict + strata read it
      val gs = cell.agg(sum("na").as("na"), sum("sa").as("sa"),
          sum("nb").as("nb"), sum("sb").as("sb"))
        .select(when(expr("sa * nb > sb * na"), 1L)
          .when(expr("sa * nb < sb * na"), -1L).otherwise(0L).as("overall_sign"))
      cell.crossJoin(broadcast(gs))
        .select(col("nk").cast("long").as("nation"), col("na"), col("nb"),
          when(col("na") > 0, expr("sa DIV na")).as("mean_a_c"),
          when(col("nb") > 0, expr("sb DIV nb")).as("mean_b_c"),
          col("overall_sign"),
          when(col("na") === 0 || col("nb") === 0, 0L)
            .when(expr("sa * nb > sb * na"), 1L)
            .when(expr("sa * nb < sb * na"), -1L).otherwise(0L).as("stratum_sign"))
        .withColumn("reversal",
          when(col("na") > 0 && col("nb") > 0
            && col("stratum_sign") * col("overall_sign") === -1, 1L).otherwise(0L))
        .orderBy("nation")
    },

    // R228 — Theil's T with within/between decomposition: the
    // DECOMPOSABLE inequality index beside q86's Gini (Gini doesn't
    // split) — how much customer-spend inequality lives INSIDE market
    // segments vs BETWEEN them. tx27's quantized-ln discipline: each
    // row term x·⌊10⁶·ln(x·n/S)⌉ quantized ONCE (the log argument is
    // an exact-integer rational, identical tree both engines), summed
    // exactly, normalized by one floor DIV; the between term runs the
    // same recipe on the 5-row segment frame; within = T − between
    // by construction. One customer-spend aggregate feeds everything.
    Q(
      "q138_theil",
      """WITH sp AS (
        |  SELECT o_custkey AS ck, c_mktsegment AS seg,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS s FROM sp),
        |rowt AS (SELECT
        |    CAST(sum(x * CAST(round(1000000 *
        |      ln(CAST(x AS DOUBLE) * g.n / g.s)) AS BIGINT)) AS HUGEINT) AS tsum
        |  FROM sp, g),
        |segf AS (SELECT seg, CAST(count(*) AS BIGINT) AS ng,
        |           CAST(sum(x) AS BIGINT) AS sg
        |         FROM sp GROUP BY 1),
        |bt AS (SELECT
        |    CAST(sum(sg * CAST(round(1000000 *
        |      ln((CAST(sg AS DOUBLE) * g.n) / (CAST(g.s AS DOUBLE) * ng)))
        |      AS BIGINT)) AS HUGEINT) AS bsum
        |  FROM segf, g)
        |SELECT g.n AS n_cust,
        |  CAST(rowt.tsum // g.s AS BIGINT) AS theil_e6,
        |  CAST(bt.bsum // g.s AS BIGINT) AS between_e6,
        |  CAST(rowt.tsum // g.s - bt.bsum // g.s AS BIGINT) AS within_e6
        |FROM g, rowt, bt""".stripMargin
    ) { (s, d) =>
      val sp = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey").as("ck"), col("seg"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
        .localCheckpoint(true) // totals + row terms + segment terms
      val g = sp.agg(count(lit(1)).as("n"), sum("x").as("s"))
      val rowt = sp.crossJoin(broadcast(g)).agg(
        sum(col("x") * round(lit(1000000)
            * log(col("x").cast("double") * col("n") / col("s"))).cast("long"))
          .cast("decimal(38,0)").as("tsum"))
      val segf = sp.groupBy("seg").agg(count(lit(1)).as("ng"), sum("x").as("sg"))
      val bt = segf.crossJoin(broadcast(g)).agg(
        sum(col("sg") * round(lit(1000000)
            * log((col("sg").cast("double") * col("n"))
              / (col("s").cast("double") * col("ng")))).cast("long"))
          .cast("decimal(38,0)").as("bsum"))
      g.crossJoin(broadcast(rowt)).crossJoin(broadcast(bt))
        .select(col("n").as("n_cust"),
          expr("CAST(tsum DIV s AS BIGINT)").as("theil_e6"),
          expr("CAST(bsum DIV s AS BIGINT)").as("between_e6"),
          expr("CAST(tsum DIV s - bsum DIV s AS BIGINT)").as("within_e6"))
    },

    // R238 — correlation MATRIX in one pass: all pairwise Pearson
    // correlations of (quantity, price, discount) from a SINGLE
    // moments aggregate — the multi-metric version of q60's pairwise
    // corr, and the shape a feature-selection step consumes. Nine
    // exact sums (3 firsts, 3 squares, 3 cross-products) in
    // decimal/HUGEINT, each correlation ONE identical-tree double of
    // exact ints e6-rounded; the fact is touched ONCE for the entire
    // matrix. Output: the 3 off-diagonal cells.
    Q(
      "q140_corr_matrix",
      """WITH v AS (SELECT
        |    CAST(round(l_quantity) AS BIGINT) AS q,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS p,
        |    CAST(round(l_discount*10000) AS BIGINT) AS dsc
        |  FROM lineitem),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(q) AS BIGINT) AS sq, CAST(sum(p) AS BIGINT) AS sp,
        |    CAST(sum(dsc) AS BIGINT) AS sd,
        |    CAST(sum(CAST(q AS HUGEINT) * q) AS HUGEINT) AS qq,
        |    CAST(sum(CAST(p AS HUGEINT) * p) AS HUGEINT) AS pp,
        |    CAST(sum(CAST(dsc AS HUGEINT) * dsc) AS HUGEINT) AS dd,
        |    CAST(sum(CAST(q AS HUGEINT) * p) AS HUGEINT) AS qp,
        |    CAST(sum(CAST(q AS HUGEINT) * dsc) AS HUGEINT) AS qd,
        |    CAST(sum(CAST(p AS HUGEINT) * dsc) AS HUGEINT) AS pd
        |  FROM v)
        |SELECT 'price' AS var_a, 'quantity' AS var_b,
        |  CAST(round(1000000 * (CAST(n AS DOUBLE) * qp - CAST(sq AS DOUBLE) * sp)
        |    / sqrt((CAST(n AS DOUBLE) * qq - CAST(sq AS DOUBLE) * sq)
        |         * (CAST(n AS DOUBLE) * pp - CAST(sp AS DOUBLE) * sp))) AS BIGINT) AS corr_e6
        |FROM m
        |UNION ALL
        |SELECT 'discount', 'quantity',
        |  CAST(round(1000000 * (CAST(n AS DOUBLE) * qd - CAST(sq AS DOUBLE) * sd)
        |    / sqrt((CAST(n AS DOUBLE) * qq - CAST(sq AS DOUBLE) * sq)
        |         * (CAST(n AS DOUBLE) * dd - CAST(sd AS DOUBLE) * sd))) AS BIGINT)
        |FROM m
        |UNION ALL
        |SELECT 'discount', 'price',
        |  CAST(round(1000000 * (CAST(n AS DOUBLE) * pd - CAST(sp AS DOUBLE) * sd)
        |    / sqrt((CAST(n AS DOUBLE) * pp - CAST(sp AS DOUBLE) * sp)
        |         * (CAST(n AS DOUBLE) * dd - CAST(sd AS DOUBLE) * sd))) AS BIGINT)
        |FROM m
        |ORDER BY var_a, var_b""".stripMargin
    ) { (s, d) =>
      val v = Tables.lineitem(s, d).select(
        round(col("l_quantity")).cast("long").as("q"),
        round(col("l_extendedprice") * 100).cast("long").as("p"),
        round(col("l_discount") * 10000).cast("long").as("dsc"))
      def dec(c: String) = expr(s"CAST($c AS DECIMAL(38,0))")
      val m = v.agg(count(lit(1)).as("n"),
        sum("q").as("sq"), sum("p").as("sp"), sum("dsc").as("sd"),
        sum(dec("q") * col("q")).cast("decimal(38,0)").as("qq"),
        sum(dec("p") * col("p")).cast("decimal(38,0)").as("pp"),
        sum(dec("dsc") * col("dsc")).cast("decimal(38,0)").as("dd"),
        sum(dec("q") * col("p")).cast("decimal(38,0)").as("qp"),
        sum(dec("q") * col("dsc")).cast("decimal(38,0)").as("qd"),
        sum(dec("p") * col("dsc")).cast("decimal(38,0)").as("pd"))
        .localCheckpoint(true) // three correlation rows read it
      def cell(a: String, b: String, sxy: String, sx: String, sy: String,
               sxx: String, syy: String) =
        m.select(lit(a).as("var_a"), lit(b).as("var_b"),
          expr(s"""CAST(round(1000000 * (CAST(n AS DOUBLE) * $sxy - CAST($sx AS DOUBLE) * $sy)
            | / sqrt((CAST(n AS DOUBLE) * $sxx - CAST($sx AS DOUBLE) * $sx)
            |      * (CAST(n AS DOUBLE) * $syy - CAST($sy AS DOUBLE) * $sy))) AS BIGINT)"""
            .stripMargin).as("corr_e6"))
      cell("price", "quantity", "qp", "sq", "sp", "qq", "pp")
        .unionByName(cell("discount", "quantity", "qd", "sq", "sd", "qq", "dd"))
        .unionByName(cell("discount", "price", "pd", "sp", "sd", "pp", "dd"))
        .orderBy("var_a", "var_b")
    },

    // R246 — Benford conformance χ² (the TEST on top of q84's
    // profile): observed leading-digit counts against the Benford
    // expectation, with the nine log10(1+1/d) probabilities embedded
    // as e6 integer constants (libm log10 never runs at query time on
    // either engine). Each χ² term (o·10⁶ − n·p_e6)² DIV (n·p_e6) is
    // e6-floor-quantized in decimal/HUGEINT (the dq8 recipe — the
    // squared term passes 2⁶³), summed exactly; the verdict compares
    // to the e6-scaled χ²₈ 95% critical value. One fact pass to 9
    // digit cells.
    Q(
      "q142_benford_chi",
      """WITH dg AS (SELECT substring(CAST(CAST(round(l_extendedprice*100) AS BIGINT)
        |                     AS VARCHAR), 1, 1) AS digit
        |            FROM lineitem),
        |o AS (SELECT digit, CAST(count(*) AS BIGINT) AS o FROM dg GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
        |exp AS (SELECT * FROM (VALUES
        |  ('1', 301030), ('2', 176091), ('3', 124939), ('4', 96910),
        |  ('5', 79181), ('6', 66947), ('7', 57992), ('8', 51153),
        |  ('9', 45757)) AS t(digit, p_e6)),
        |term AS (SELECT
        |    CAST((CAST(o.o * 1000000 - n.n * exp.p_e6 AS HUGEINT)
        |          * (o.o * 1000000 - n.n * exp.p_e6))
        |         // (CAST(n.n AS HUGEINT) * exp.p_e6) AS BIGINT) AS t_e6
        |  FROM exp JOIN o ON o.digit = exp.digit CROSS JOIN n)
        |SELECT (SELECT n FROM n) AS n_values,
        |  CAST(sum(t_e6) AS BIGINT) AS chisq_e6,
        |  CASE WHEN sum(t_e6) <= 15507000 THEN 1 ELSE 0 END AS conforms_95
        |FROM term""".stripMargin
    ) { (s, d) =>
      val dg = Tables.lineitem(s, d).select(
        substring(round(col("l_extendedprice") * 100).cast("long").cast("string"),
          1, 1).as("digit"))
      val o = dg.groupBy("digit").agg(count(lit(1)).as("o"))
        .localCheckpoint(true) // total + terms read it
      val n = o.agg(sum("o").as("n"))
      val expFrame = Seq(("1", 301030L), ("2", 176091L), ("3", 124939L),
        ("4", 96910L), ("5", 79181L), ("6", 66947L), ("7", 57992L),
        ("8", 51153L), ("9", 45757L))
      import s.implicits._
      val exp0 = expFrame.toDF("digit", "p_e6")
      val term = broadcast(exp0).join(o, "digit").crossJoin(broadcast(n))
        .select(expr("""CAST((CAST(o * 1000000 - n * p_e6 AS DECIMAL(38,0))
          |  * (o * 1000000 - n * p_e6))
          | DIV (CAST(n AS DECIMAL(38,0)) * p_e6) AS BIGINT)""".stripMargin)
          .as("t_e6"))
      term.crossJoin(broadcast(n))
        .agg(max("n").as("n_values"), sum("t_e6").as("chisq_e6"))
        .withColumn("conforms_95",
          when(col("chisq_e6") <= 15507000L, 1L).otherwise(0L))
    },

    // R247 — Bowley (quartile) skewness per segment: the robust
    // skewness a moment-based estimate can't give on heavy tails —
    // (Q1 + Q3 − 2·Q2)/(Q3 − Q1), all three quartiles exact ceil-rank
    // picks on (segment, orders-per-customer) CELLS (q126's CI
    // machinery extended to Q1/Q3), the ratio one permille floor DIV
    // NULL-guarded on a degenerate IQR. One customer-keyed aggregate;
    // windows cell-bounded.
    Q(
      "q143_bowley_skew",
      """WITH oc AS (
        |  SELECT o_custkey AS ck, c_mktsegment AS seg, CAST(count(*) AS BIGINT) AS k
        |  FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1, 2),
        |cells AS (SELECT seg, k, CAST(count(*) AS BIGINT) AS c FROM oc GROUP BY 1, 2),
        |cum AS (SELECT seg, k, c,
        |          sum(c) OVER (PARTITION BY seg ORDER BY k) AS cum,
        |          sum(c) OVER (PARTITION BY seg) AS n
        |        FROM cells),
        |pick AS (SELECT seg, CAST(max(n) AS BIGINT) AS n,
        |           min(CASE WHEN cum * 4 >= n THEN k END) AS q1,
        |           min(CASE WHEN cum * 2 >= n THEN k END) AS q2,
        |           min(CASE WHEN cum * 4 >= 3 * n THEN k END) AS q3
        |         FROM cum GROUP BY seg)
        |SELECT seg, n, q1, q2, q3,
        |  CASE WHEN q3 = q1 THEN NULL
        |       ELSE ((q1 + q3 - 2*q2) * 1000) // (q3 - q1) END AS bowley_pm
        |FROM pick ORDER BY seg""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val oc = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_custkey").as("ck"), col("seg"))
        .agg(count(lit(1)).as("k"))
      val cum = oc.groupBy("seg", "k").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(Window.partitionBy("seg").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", sum("c").over(Window.partitionBy("seg")))
      cum.groupBy("seg").agg(
          max("n").as("n"),
          min(when(col("cum") * 4 >= col("n"), col("k"))).as("q1"),
          min(when(col("cum") * 2 >= col("n"), col("k"))).as("q2"),
          min(when(col("cum") * 4 >= col("n") * 3, col("k"))).as("q3"))
        .withColumn("bowley_pm",
          when(col("q3") === col("q1"), lit(null))
            .otherwise(expr("((q1 + q3 - 2*q2) * 1000) DIV (q3 - q1)")))
        .orderBy("seg")
    },

    // R248 — Hoover (Robin Hood) index per nation: the share of total
    // spend that would have to move to equalize customers — the third
    // leg of the inequality triptych (q86 Gini integrates the Lorenz
    // curve, q123 plots it; Hoover is its max vertical gap). NO ranking
    // at all: H = Σ|x_i − μ| / (2S) = Σ|n·x_i − S| / (2nS), so the
    // numerator is a single pass of exact integer products over the
    // customer frame (decimal(38,0)/HUGEINT per the q73 wide-product
    // precedent) — no window, no sort, nothing data-ordered anywhere;
    // the one double division is the final readout. The identity needs
    // n and S first: a 25-row broadcast join feeds them back.
    Q(
      "q144_hoover",
      """WITH cr AS (
        |  SELECT n_name, o_custkey,
        |    sum(CAST(round(o_totalprice*100) AS BIGINT)) AS cents
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |t AS (SELECT n_name, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(cents) AS BIGINT) AS s
        |      FROM cr GROUP BY 1)
        |SELECT cr.n_name, max(t.n) AS n_cust,
        |  CAST(sum(abs(CAST(t.n AS HUGEINT) * cr.cents - t.s)) AS DOUBLE)
        |    / (2.0 * CAST(max(t.n) AS DOUBLE) * CAST(max(t.s) AS DOUBLE))
        |    AS hoover
        |FROM cr JOIN t ON cr.n_name = t.n_name
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val cr = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "o_custkey")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      val t = cr.groupBy("n_name")
        .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      cr.join(broadcast(t), Seq("n_name"))
        .groupBy("n_name")
        .agg(max("n").as("n_cust"),
          sum(abs(col("n").cast("decimal(38,0)") * col("cents") - col("s")))
            .as("dev"),
          max("n").as("nn"), max("s").as("ss"))
        .select(col("n_name"), col("n_cust"),
          (col("dev").cast("double")
            / (lit(2.0) * col("nn").cast("double") * col("ss").cast("double")))
            .as("hoover"))
        .orderBy("n_name")
    },

    // R249 — 10% two-sided trimmed mean of order value per segment: the
    // robust-location sibling of q47's winsorized aggregate (winsorize
    // CLAMPS the tails, trim DROPS them — both kill the heavy-tail bias
    // a plain mean carries). lo = ⌊n/10⌋ rows come off each end; the
    // kept mass is total − (sum of the lo smallest) − (sum of the lo
    // largest), and each tail sum reads off the (segment, cents) CELL
    // frame: full cells below the cut plus a partial cell straddling
    // it — cnt·cents arithmetic, exact. The trimmed mean in cents is
    // one exact floor division at the end. SCALE: order-value cents are
    // a near-continuous domain (cells ~ 0.9·n here), so the per-segment
    // cell cumulative runs BLOCKED (Blocked.cumulativeBy, never a
    // segment-partitioned window whose partitions scale with the data);
    // the oracle uses the plain window form.
    Q(
      "q145_trimmed_mean",
      """WITH oc AS (
        |  SELECT c_mktsegment AS seg,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |cells AS (SELECT seg, cents, CAST(count(*) AS BIGINT) AS cnt
        |          FROM oc GROUP BY 1, 2),
        |cum AS (SELECT seg, cents, cnt,
        |    sum(cnt) OVER (PARTITION BY seg ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(CAST(cnt AS HUGEINT) * cents) OVER (PARTITION BY seg
        |      ORDER BY cents
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv
        |  FROM cells),
        |t AS (SELECT seg, CAST(max(cum) AS BIGINT) AS n,
        |        CAST(max(cumv) AS HUGEINT) AS s FROM cum GROUP BY 1),
        |lo AS (SELECT cum.seg, t.n, t.s, t.n // 10 AS k,
        |    -- smallest-tail sum: full cells with cum ≤ k, plus the
        |    -- straddling cell's partial k − (cum − cnt) rows
        |    CAST(sum(CASE WHEN cum <= t.n // 10 THEN CAST(cnt AS HUGEINT) * cents
        |             WHEN cum - cnt < t.n // 10
        |               THEN (t.n // 10 - (cum - cnt)) * CAST(cents AS HUGEINT)
        |             ELSE 0 END) AS HUGEINT) AS s_lo,
        |    CAST(sum(CASE WHEN t.n - (cum - cnt) <= t.n // 10
        |               THEN CAST(cnt AS HUGEINT) * cents
        |             WHEN t.n - cum < t.n // 10
        |               THEN (t.n // 10 - (t.n - cum)) * CAST(cents AS HUGEINT)
        |             ELSE 0 END) AS HUGEINT) AS s_hi
        |  FROM cum JOIN t ON cum.seg = t.seg
        |  GROUP BY 1, 2, 3, 4)
        |SELECT seg, n, k AS trimmed_each_side,
        |  CAST((s - s_lo - s_hi) // (n - 2 * k) AS BIGINT) AS trimmed_mean_cents
        |FROM lo ORDER BY seg""".stripMargin
    ) { (s, d) =>
      val oc = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("seg"), round(col("o_totalprice") * 100).cast("long").as("cents"))
      val cells = oc.groupBy("seg", "cents").agg(count(lit(1)).as("cnt"))
        .withColumn("v", col("cnt").cast("decimal(38,0)") * col("cents"))
      val cum = Blocked.cumulativeBy(cells, Seq("seg"), Seq(col("cents")),
          Seq("cnt", "v"))
        .withColumnRenamed("cum_cnt", "cum").withColumnRenamed("cum_v", "cumv")
      val t = cum.groupBy("seg")
        .agg(max("cum").as("n"), max("cumv").as("s"))
        .withColumn("k", expr("n DIV 10"))
      val j = cum.join(broadcast(t), Seq("seg"))
      val cLo = when(col("cum") <= col("k"),
          col("cnt").cast("decimal(38,0)") * col("cents"))
        .when(col("cum") - col("cnt") < col("k"),
          (col("k") - (col("cum") - col("cnt"))).cast("decimal(38,0)") * col("cents"))
        .otherwise(lit(0).cast("decimal(38,0)"))
      val cHi = when(col("n") - (col("cum") - col("cnt")) <= col("k"),
          col("cnt").cast("decimal(38,0)") * col("cents"))
        .when(col("n") - col("cum") < col("k"),
          (col("k") - (col("n") - col("cum"))).cast("decimal(38,0)") * col("cents"))
        .otherwise(lit(0).cast("decimal(38,0)"))
      j.groupBy("seg")
        .agg(max("n").as("n"), max("k").as("trimmed_each_side"),
          max("s").as("s"), sum(cLo).as("s_lo"), sum(cHi).as("s_hi"))
        .select(col("seg"), col("n"), col("trimmed_each_side"),
          { // exact truncating quotient (ev89's pmod discipline — decimal
            // `/` rounds HALF_UP at result scale, DuckDB `//` truncates)
            val num = col("s") - col("s_lo") - col("s_hi")
            val den = col("n") - lit(2) * col("trimmed_each_side")
            ((num - pmod(num, den)) / den).cast("long").as("trimmed_mean_cents")
          })
        .orderBy("seg")
    },

    // R253 — price-volume (PVM) bridge per brand, 1995 → 1996: q107's
    // mix-shift bridge decomposes against a parent's SHARE; the finance
    // close wants the other split — how much of Δrevenue came from
    // charging differently (price) vs selling more units (volume). The
    // exact identity p₁q₁ − p₀q₀ = (p₁−p₀)q₁ + (q₁−q₀)p₀ is evaluated
    // WITHOUT ever forming a unit price: price = (rev₁·q₀ − q₁·rev₀)/q₀
    // and volume = (q₁−q₀)·rev₀/q₀, numerators exact in decimal(38,0)/
    // HUGEINT, the one truncating division per effect is signed —
    // portable because both engines truncate toward zero (the −7//2=−3
    // identity). Effects reconcile to Δrev within ±1 cent of
    // truncation, asserted nowhere but stated here. One fact pass to
    // the (brand, year) frame.
    Q(
      "q150_pvm_bridge",
      """WITH by AS (
        |  SELECT p_brand AS brand, year(CAST(l_shipdate AS DATE)) AS yr,
        |    CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |      AS rev,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE year(CAST(l_shipdate AS DATE)) IN (1995, 1996)
        |  GROUP BY 1, 2),
        |w AS (
        |  SELECT a.brand, a.rev AS rev0, a.qty AS q0, b.rev AS rev1,
        |    b.qty AS q1
        |  FROM by a JOIN by b ON a.brand = b.brand
        |  WHERE a.yr = 1995 AND b.yr = 1996 AND a.qty > 0 AND b.qty > 0)
        |SELECT brand, rev0, rev1, q0, q1, rev1 - rev0 AS delta_cents,
        |  CAST((CAST(rev1 AS HUGEINT) * q0 - CAST(q1 AS HUGEINT) * rev0) // q0
        |    AS BIGINT) AS price_effect_cents,
        |  CAST(((CAST(q1 AS HUGEINT) - q0) * rev0) // q0 AS BIGINT)
        |    AS volume_effect_cents
        |FROM w ORDER BY brand""".stripMargin
    ) { (s, d) =>
      val by = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand").as("brand"))),
          col("l_partkey") === col("p_partkey"))
        .withColumn("yr", year(col("l_shipdate").cast("date")))
        .filter(col("yr").isin(1995, 1996))
        .groupBy("brand", "yr")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rev"),
          sum(round(col("l_quantity")).cast("long")).as("qty"))
        .localCheckpoint(true) // both years read it
      val a = by.filter(col("yr") === 1995 && col("qty") > 0)
        .select(col("brand"), col("rev").as("rev0"), col("qty").as("q0"))
      val b = by.filter(col("yr") === 1996 && col("qty") > 0)
        .select(col("brand"), col("rev").as("rev1"), col("qty").as("q1"))
      a.join(b, Seq("brand"))
        .select(col("brand"), col("rev0"), col("rev1"), col("q0"), col("q1"),
          (col("rev1") - col("rev0")).as("delta_cents"),
          { // signed TRUNCATING quotient: (num − num % den)/den — Spark %
            // keeps the dividend's sign, so this matches DuckDB's
            // toward-zero // on negative effects (pmod would give FLOOR)
            val num = col("rev1").cast("decimal(38,0)") * col("q0") -
              col("q1").cast("decimal(38,0)") * col("rev0")
            ((num - num % col("q0")) / col("q0")).cast("long")
              .as("price_effect_cents") },
          { val num = (col("q1").cast("decimal(38,0)") - col("q0")) * col("rev0")
            ((num - num % col("q0")) / col("q0")).cast("long")
              .as("volume_effect_cents") })
        .orderBy("brand")
    },

    // R255 — discount-depth response curve: q112's log-log elasticity
    // fits ONE slope; merchandising wants the whole curve — at each
    // discount depth, how much MORE volume moves than at full price,
    // per brand. Response index = (avg qty at depth d) / (avg qty at
    // d=0), held as the exact cross-multiplied permille
    // (1000·q_d·n_0) DIV (n_d·q_0) — no float mean ever exists. The
    // discount domain is 11 cells (0–10%), so the (brand, depth) frame
    // is constant-sized after one fact pass; the zero-depth baseline
    // joins back brand-keyed (broadcast).
    Q(
      "q151_discount_response",
      """WITH bd AS (
        |  SELECT p_brand AS brand,
        |    CAST(round(l_discount * 100) AS BIGINT) AS depth,
        |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |base AS (SELECT brand, q AS q0, n AS n0 FROM bd WHERE depth = 0)
        |SELECT bd.brand, bd.depth, bd.q AS qty, bd.n AS n_lines,
        |  CAST((1000 * CAST(bd.q AS HUGEINT) * b.n0)
        |    // (CAST(bd.n AS HUGEINT) * b.q0) AS BIGINT) AS response_pm
        |FROM bd JOIN base b ON b.brand = bd.brand
        |WHERE b.q0 > 0 AND bd.n > 0
        |ORDER BY bd.brand, bd.depth""".stripMargin
    ) { (s, d) =>
      val bd = Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand").as("brand"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("brand"),
          round(col("l_discount") * 100).cast("long").as("depth"))
        .agg(sum(round(col("l_quantity")).cast("long")).as("q"),
          count(lit(1)).as("n"))
        .localCheckpoint(true) // baseline + curve both read it
      val base = bd.filter(col("depth") === 0 && col("q") > 0)
        .select(col("brand"), col("q").as("q0"), col("n").as("n0"))
      bd.filter(col("n") > 0)
        .join(broadcast(base), Seq("brand"))
        .select(col("brand"), col("depth"), col("q").as("qty"),
          col("n").as("n_lines"),
          { val num = lit(1000).cast("decimal(38,0)") * col("q") * col("n0")
            val den = col("n").cast("decimal(38,0)") * col("q0")
            ((num - pmod(num, den)) / den).cast("long").as("response_pm") })
        .orderBy("brand", "depth")
    },

    // R256 — cross-column IQR fence audit: q48 profiles central
    // moments, q102 counts robust outliers for ONE measure — the
    // data-quality gate wants Tukey fences for EVERY numeric column in
    // one artifact. Columns UNPIVOT to (col, value-cell) rows first
    // (scan-local stack), quartiles are exact ceil-rank picks on the
    // per-column cell cumulative (q143's machinery), fences at
    // 4·Q1 − 6·(Q3−Q1)... kept integer: x is an outlier iff
    // 2·x < 2·Q1 − 3·IQR or 2·x > 2·Q3 + 3·IQR (the 1.5×IQR rule
    // cross-multiplied by 2). Counts per column + fence values out.
    // SCALE: cents/qty cells are value-domain frames; the per-column
    // cumulative is partitioned BY COLUMN over cells and runs blocked
    // (Blocked.cumulativeBy) since cents cells scale with data.
    Q(
      "q152_fence_audit",
      """WITH stacked AS (
        |  SELECT 'extendedprice' AS colname,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS v FROM lineitem
        |  UNION ALL
        |  SELECT 'quantity', CAST(round(l_quantity) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'tax', CAST(round(l_tax*100) AS BIGINT) FROM lineitem),
        |cells AS (SELECT colname, v, CAST(count(*) AS BIGINT) AS c
        |          FROM stacked GROUP BY 1, 2),
        |cum AS (SELECT colname, v, c,
        |    sum(c) OVER (PARTITION BY colname ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(c) OVER (PARTITION BY colname) AS n
        |  FROM cells),
        |qq AS (SELECT colname, CAST(max(n) AS BIGINT) AS n,
        |    min(CASE WHEN cum * 4 >= n THEN v END) AS q1,
        |    min(CASE WHEN cum * 4 >= 3 * n THEN v END) AS q3
        |  FROM cum GROUP BY 1),
        |fl AS (SELECT s.colname, q.n, q.q1, q.q3,
        |    CAST(sum(CASE WHEN 2 * s.v < 2 * q.q1 - 3 * (q.q3 - q.q1)
        |                    OR 2 * s.v > 2 * q.q3 + 3 * (q.q3 - q.q1)
        |             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |  FROM stacked s JOIN qq q ON q.colname = s.colname
        |  GROUP BY 1, 2, 3, 4)
        |SELECT colname, n, q1, q3, n_outliers,
        |  (n_outliers * 1000000) // n AS outlier_ppm
        |FROM fl ORDER BY colname""".stripMargin
    ) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val stacked = li.select(lit("extendedprice").as("colname"),
          round(col("l_extendedprice") * 100).cast("long").as("v"))
        .unionByName(li.select(lit("quantity").as("colname"),
          round(col("l_quantity")).cast("long").as("v")))
        .unionByName(li.select(lit("tax").as("colname"),
          round(col("l_tax") * 100).cast("long").as("v")))
        // persist, not localCheckpoint: the stacked frame is 3× the FACT
        // table — O(table) executor-local checkpoint storage would both
        // pin that much space and make executor loss unrecoverable
        // (ADVICE r6); MEMORY_AND_DISK keeps the lineage replayable
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cells = stacked.groupBy("colname", "v").agg(count(lit(1)).as("c"))
      val cum = Blocked.cumulativeBy(cells, Seq("colname"), Seq(col("v")),
        Seq("c")).withColumnRenamed("cum_c", "cum")
      // quartile picks need n first — two-phase like q143
      val n2 = cum.groupBy("colname").agg(max("cum").as("n"))
      val picks = cum.join(broadcast(n2), Seq("colname"))
        .groupBy("colname")
        .agg(max("n").as("n"),
          min(when(col("cum") * 4 >= col("n"), col("v"))).as("q1"),
          min(when(col("cum") * 4 >= col("n") * 3, col("v"))).as("q3"))
      val iqr3 = lit(3) * (col("q3") - col("q1"))
      stacked.join(broadcast(picks), Seq("colname"))
        .groupBy("colname")
        .agg(max("n").as("n"), max("q1").as("q1"), max("q3").as("q3"),
          sum(when(lit(2) * col("v") < lit(2) * col("q1") - iqr3
            || lit(2) * col("v") > lit(2) * col("q3") + iqr3, 1L)
            .otherwise(0L)).as("n_outliers"))
        .select(col("colname"), col("n"), col("q1"), col("q3"),
          col("n_outliers"),
          expr("(n_outliers * 1000000) DIV n").as("outlier_ppm"))
        .orderBy("colname")
    },

    // R271 — PinnedMath BIT-IDENTITY certificate (r9): the chains'
    // whole point is that Spark and DuckDB produce the SAME double, so
    // this entry emits the RAW (unquantized) ln/exp/atan2 doubles over
    // a corpus-derived probe grid and lets the driver hash them — a
    // single flipped bit anywhere fails the round. The grid stresses
    // the regions that can diverge: ln over 13 decades on BOTH sides of
    // 1 (the k-ladder region whose decimal-typed literals silently
    // diverged ~2.4e-8 and crashed DuckDB for k·ln2 ≥ 10 before the r9
    // E-notation fix), exp across ±690 (the full ±512-level scale
    // ladder), atan2 over all quadrants and axes including the origin.
    // WIDENED r10 (verdict item 3): a MULTI-OCTAVE column xt (±6200
    // radians, fractional steps — quadrant counts n up to ~3900) runs
    // the full-argument-reduction trig chain (PinnedMath.trigSteps,
    // Cody–Waite fold + quadrant CASE) next to the |x| ≤ π/2 Taylor
    // pair, so the reduction's floor/fold arithmetic is raw-bits
    // certified across thousands of quadrants, both signs, and the
    // near-multiple-of-π/2 cells where a wrong fold flips the sign.
    Q(
      "q157_pinned_math",
      """WITH probe AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN CAST((doc_id + 1) * ((doc_id * doc_id) % 9973 + 1) AS DOUBLE)
        |      ELSE 1E0 / CAST((doc_id + 1) * ((doc_id * doc_id) % 9973 + 1) AS DOUBLE)
        |    END AS x,
        |    CAST(doc_id % 1381 AS DOUBLE) / 2E0
        |      * CASE WHEN doc_id % 4 < 2 THEN 1E0 ELSE -1E0 END AS xe,
        |    CAST((doc_id % 315) - 157 AS DOUBLE) / 100E0 AS xs,
        |    CAST((doc_id % 40009) - 20004 AS DOUBLE) * 31E0 / 100E0 AS xt,
        |    CAST((doc_id % 17) - 8 AS DOUBLE) AS yy,
        |    CAST((doc_id % 13) - 6 AS DOUBLE) AS xx
        |  FROM documents),
        |""".stripMargin + graft.functions.PinnedMath.lnCtes("probe") +
        """e0 AS (SELECT doc_id, lnx, yy, xx, xs, xt, xe AS x FROM plF),
        |""".stripMargin + graft.functions.PinnedMath.expCtes("e0") +
        """a0 AS (SELECT doc_id, lnx, expx, yy, xx, xs, xt FROM peF),
        |""".stripMargin + graft.functions.PinnedMath.atan2Ctes("a0") +
        """t0 AS (SELECT doc_id, lnx, expx, at2, xt, xs AS x FROM paF),
        |""".stripMargin +
        graft.functions.PinnedMath.stepCtes(
          graft.functions.PinnedMath.sinSteps, "t0", "psF") +
        graft.functions.PinnedMath.stepCtes(
          graft.functions.PinnedMath.cosSteps, "psF", "pcF") +
        graft.functions.PinnedMath.stepCtes(
          graft.functions.PinnedMath.renamed(
            graft.functions.PinnedMath.trigSteps, "f", Map("x" -> "xt")),
          "pcF", "ptF") +
        """fin AS (SELECT doc_id, lnx, expx, at2, sinx, cosx,
        |    fsinx AS sinx_f, fcosx AS cosx_f FROM ptF)
        |SELECT * FROM fin ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val pm = graft.functions.PinnedMath
      val probe = Tables.documents(s, d).select(col("doc_id"),
        expr("""CASE WHEN doc_id % 2 = 0
          | THEN CAST((doc_id + 1) * ((doc_id * doc_id) % 9973 + 1) AS DOUBLE)
          | ELSE 1E0 / CAST((doc_id + 1) * ((doc_id * doc_id) % 9973 + 1) AS DOUBLE)
          | END""".stripMargin).as("x"),
        expr("""CAST(doc_id % 1381 AS DOUBLE) / 2E0
          | * CASE WHEN doc_id % 4 < 2 THEN 1E0 ELSE -1E0 END""".stripMargin)
          .as("xe"),
        expr("CAST((doc_id % 315) - 157 AS DOUBLE) / 100E0").as("xs"),
        expr("CAST((doc_id % 40009) - 20004 AS DOUBLE) * 31E0 / 100E0")
          .as("xt"),
        expr("CAST((doc_id % 17) - 8 AS DOUBLE)").as("yy"),
        expr("CAST((doc_id % 13) - 6 AS DOUBLE)").as("xx"))
      val e0 = pm.withLnx(probe)
        .select(col("doc_id"), col("lnx"), col("yy"), col("xx"), col("xs"),
          col("xt"), col("xe").as("x"))
      val a0 = pm.withSteps(e0, pm.expSteps)
        .select(col("doc_id"), col("lnx"), col("expx"), col("yy"), col("xx"),
          col("xs"), col("xt"))
      val t0 = pm.withSteps(a0, pm.atan2Steps)
        .select(col("doc_id"), col("lnx"), col("expx"), col("at2"),
          col("xt"), col("xs").as("x"))
      pm.withSteps(
          pm.withSteps(pm.withSteps(t0, pm.sinSteps), pm.cosSteps),
          pm.renamed(pm.trigSteps, "f", Map("x" -> "xt")))
        .select(col("doc_id"), col("lnx"), col("expx"), col("at2"),
          col("sinx"), col("cosx"),
          col("fsinx").as("sinx_f"), col("fcosx").as("cosx_f"))
        .orderBy("doc_id")
    },

    // R274 — PinnedMath POW composition certificate (r10, early r11
    // seed 5): x^y = exp(y·ln x) composed from the two certified
    // chains — the composition is bit-identical cross-engine BY
    // CONSTRUCTION (ln and exp are, and the y·lnx multiply is
    // correctly rounded), but this entry pins it END TO END with raw
    // unquantized doubles over the q157 ln decade grid × y ∈ [-2.5,
    // 2.5] (y·lnx spans ±38.6 — well inside exp's certified range),
    // so any future chain edit that breaks composition lands here as
    // a flipped bit. PinnedMathSpec pins libm closeness (~|y·lnx|·1e-9
    // relative — the ln chain's relative error scaled by the exponent).
    Q(
      "q158_pinned_pow",
      """WITH probe AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0
        |      THEN CAST((doc_id + 1) * ((doc_id * doc_id) % 9973 + 1) AS DOUBLE)
        |      ELSE 1E0 / CAST((doc_id + 1) * ((doc_id * doc_id) % 9973 + 1) AS DOUBLE)
        |    END AS x,
        |    CAST((doc_id % 11) - 5 AS DOUBLE) / 2E0 AS yv
        |  FROM documents),
        |""".stripMargin + graft.functions.PinnedMath.lnCtes("probe") +
        """m AS (SELECT doc_id, yv, yv * lnx AS x FROM plF),
        |""".stripMargin + graft.functions.PinnedMath.expCtes("m") +
        """fin AS (SELECT doc_id, yv, expx AS powx FROM peF)
        |SELECT * FROM fin ORDER BY doc_id""".stripMargin
    ) { (s, d) =>
      val pm = graft.functions.PinnedMath
      val probe = Tables.documents(s, d).select(col("doc_id"),
        expr("""CASE WHEN doc_id % 2 = 0
          | THEN CAST((doc_id + 1) * ((doc_id * doc_id) % 9973 + 1) AS DOUBLE)
          | ELSE 1E0 / CAST((doc_id + 1) * ((doc_id * doc_id) % 9973 + 1) AS DOUBLE)
          | END""".stripMargin).as("x"),
        expr("CAST((doc_id % 11) - 5 AS DOUBLE) / 2E0").as("yv"))
      val m = pm.withLnx(probe)
        .select(col("doc_id"), col("yv"), (col("yv") * col("lnx")).as("x"))
      pm.withSteps(m, pm.expSteps)
        .select(col("doc_id"), col("yv"), col("expx").as("powx"))
        .orderBy("doc_id")
    }
  )
}
