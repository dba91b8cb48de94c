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
      val ord = Window.partitionBy("n_name").orderBy(col("rev").desc, col("c_custkey"))
      val cum = cr
        .withColumn("cum", sum("rev").over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum("rev").over(Window.partitionBy("n_name")))
      cum.groupBy("n_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(when(lit(5) * (col("cum") - col("rev")) < lit(4) * col("total"), 1)
            .otherwise(0)).as("k80"))
        .orderBy("n_name")
    }
  )
}
