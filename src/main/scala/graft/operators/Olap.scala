package graft.operators

import graft.{Q, Tables}
import graft.functions.Stable
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-4 OLAP catalog additions: the remaining classic TPC-H shapes
  * adapted to this schema (no partsupp — see q44/q45 for the precedent),
  * plus an integer-exact statistical anomaly detector over the events
  * table.
  *
  * Float discipline (SURVEY.md §5) is the design driver here: every
  * aggregate is either exact fixed-point (cents via `round(x·10^s)` as
  * BIGINT) or a single deterministic FP division of two exact integers —
  * so the DuckDB hash compare is a true equality, not a tolerance. The
  * anomaly test goes further and clears the usual sqrt/variance floats
  * entirely by comparing (n·x−S)² > 4·(n·SS−S²) in longs.
  */
object Olap {

  /** Exact cents of `l_extendedprice*(1-l_discount)` at 4dp — the same
    * revenue fixed-point q42/q44/q45 use. */
  private def rev4: org.apache.spark.sql.Column =
    round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000).cast("long")

  /** Batch twin of [[graft.streaming.EventStream.sliding]]: 10-minute
    * windows every 5, each event exploded into its exactly-two windows
    * (the k∈{0,1} back-shift of the event's 5-minute grid floor — the
    * same assignment `window(ts, '10 minutes', '5 minutes')` makes).
    * Scan-local explode (2× rows, fixed) into one fixed-width shuffle. */
  def slidingBatch(events: DataFrame): DataFrame =
    events
      .withColumn("k", explode(array(lit(0), lit(1))))
      .withColumn("win_start",
        expr("timestamp_seconds((unix_timestamp(ts) DIV 300) * 300 - k * 300)"))
      .groupBy("win_start", "event_type")
      .agg(count(lit(1)).as("n"), Stable.moneySum(col("value")).as("sum_v"))
      .orderBy("win_start", "event_type")

  val catalog: Seq[Q] = Seq(
    // R46 — TPC-H Q11 shape (important stock): per-part shipped value
    // from one supplier group (EUROPE), kept when the part's value
    // exceeds 1/1000 of the group total. The share test is INTEGER
    // (val_c > total DIV 1000 — the division keeps magnitudes inside a
    // long at any SF, where the multiply form val_c*1000 > total would
    // overflow at 100 TB). One fact scan into a per-part aggregate; the
    // global total is a 1-row aggregate OVER that dims-sized frame
    // (localCheckpoint'd so the two consumers don't re-run the scan),
    // broadcast back — Q11's scalar subquery without an unpartitioned
    // window.
    Q(
      "q49_value_share",
      """WITH eu AS (SELECT s_suppkey FROM supplier
        |            JOIN nation ON s_nationkey = n_nationkey
        |            JOIN region ON n_regionkey = r_regionkey
        |            WHERE r_name = 'EUROPE'),
        |  v AS (SELECT l_partkey,
        |          sum(CAST(round(l_extendedprice*100) AS BIGINT)
        |              * CAST(round(l_quantity) AS BIGINT)) AS val_c
        |        FROM lineitem JOIN eu ON l_suppkey = s_suppkey
        |        GROUP BY 1)
        |SELECT l_partkey, CAST(val_c AS DOUBLE)/100.0 AS value
        |FROM v WHERE val_c > (SELECT sum(val_c) FROM v) // 1000
        |ORDER BY value DESC, l_partkey""".stripMargin
    ) { (s, d) =>
      val eu = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .select("s_suppkey")
      val v = Tables.lineitem(s, d)
        .join(broadcast(eu), col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")
          * round(col("l_quantity")).cast("long")).as("val_c"))
        .localCheckpoint(true) // two consumers below — one scan+agg run
      v.crossJoin(broadcast(v.agg(sum(col("val_c")).as("total"))))
        .filter(col("val_c") > expr("total DIV 1000"))
        .select(col("l_partkey"), (col("val_c").cast("double") / 100.0).as("value"))
        .orderBy(desc("value"), col("l_partkey"))
    },

    // R47 — TPC-H Q8 shape (market share): within one market (ASIA
    // customers buying STANDARD parts), the per-year revenue share
    // supplied by EUROPE suppliers. Numerator and denominator are exact
    // cent sums; the share is ONE double division of two exact integers
    // — bit-portable. All five dims broadcast; the only big shuffle is
    // lineitem⨝orders on orderkey.
    Q(
      "q50_market_share",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(sum(CASE WHEN eu THEN c ELSE 0 END) AS DOUBLE)
        |    / CAST(sum(c) AS DOUBLE) AS eu_share,
        |  CAST(sum(c) AS DOUBLE)/10000.0 AS mkt_total
        |FROM (
        |  SELECT o_orderdate,
        |    CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT) AS c,
        |    (sr.r_name = 'EUROPE') AS eu
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |  JOIN region cr ON cn.n_regionkey = cr.r_regionkey
        |  JOIN part ON l_partkey = p_partkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN region sr ON sn.n_regionkey = sr.r_regionkey
        |  WHERE cr.r_name = 'ASIA' AND p_type = 'STANDARD')
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val asiaCust = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("c_custkey")
      val suppEu = Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("sn_key"), col("n_regionkey").as("sn_reg"))),
          col("s_nationkey") === col("sn_key"))
        .join(broadcast(Tables.region(s, d)
          .select(col("r_regionkey").as("sr_key"), col("r_name").as("sr_name"))),
          col("sn_reg") === col("sr_key"))
        .select(col("s_suppkey"), (col("sr_name") === "EUROPE").as("eu"))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.part(s, d).filter(col("p_type") === "STANDARD")
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(suppEu), col("l_suppkey") === col("s_suppkey"))
        .select(year(col("o_orderdate")).cast("long").as("yr"),
          rev4.as("c"), col("eu"))
        .groupBy("yr")
        .agg((sum(when(col("eu"), col("c")).otherwise(lit(0L))).cast("double")
          / sum(col("c")).cast("double")).as("eu_share"),
          (sum(col("c")).cast("double") / 10000.0).as("mkt_total"))
        .orderBy("yr")
    },

    // R48 — TPC-H Q9 shape (product-type profit by nation and year):
    // revenue (no supplycost in this schema) from 'red *' parts, grouped
    // by supplier nation and order year. lineitem⨝orders is the one big
    // shuffle; part filter and supplier→nation broadcast.
    Q(
      "q51_product_profit",
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))
        |       AS DOUBLE)/10000.0 AS profit
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_name LIKE 'red %'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.part(s, d).filter(col("p_name").like("red %"))
          .select("p_partkey")), col("l_partkey") === col("p_partkey"))
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("yr"))
        .agg((sum(rev4).cast("double") / 10000.0).as("profit"))
        .orderBy("nation", "yr")
    },

    // R49 — TPC-H Q10 shape (returned-item revenue ranking): top 20
    // customers by revenue on returned lineitems. The fact reduces
    // per-customer BEFORE customer/nation join (they broadcast onto the
    // aggregate); desc ranking tie-broken by custkey.
    Q(
      "q52_returned_customers",
      """SELECT c_custkey, c_name, n_name,
        |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*10000) AS BIGINT))
        |       AS DOUBLE)/10000.0 AS rev
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1,2,3 ORDER BY rev DESC, c_custkey LIMIT 20""".stripMargin
    ) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(sum(rev4).as("rev_c"))
        .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"),
          (col("rev_c").cast("double") / 10000.0).as("rev"))
        .orderBy(desc("rev"), col("c_custkey"))
        .limit(20)
    },

    // R50 — statistical anomaly detection over hourly event counts:
    // hours whose count sits > 2σ from that event type's mean. The
    // whole test is EXACT LONG ARITHMETIC — (n·x − S)² > 4·(n·SS − S²)
    // is (x−μ)² > 4σ² with both sides multiplied by n², so no float
    // mean/variance/sqrt ever enters and the oracle compare is exact.
    // Two fixed-width shuffles (hour-count, then per-type stats joined
    // back via broadcast — stats frame is |event_types| rows).
    Q(
      "ev9_anomaly_hours",
      """WITH h AS (SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hr,
        |             count(*) AS c
        |           FROM events GROUP BY 1,2),
        |  st AS (SELECT event_type, count(*) AS n, sum(c) AS s, sum(c*c) AS ss
        |         FROM h GROUP BY 1)
        |SELECT h.event_type, hr, CAST(c AS BIGINT) AS c
        |FROM h JOIN st USING(event_type)
        |WHERE (n*c - s)*(n*c - s) > 4*(n*ss - s*s)
        |ORDER BY event_type, hr""".stripMargin
    ) { (s, d) =>
      val h = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // consumed by the stats agg AND the join
      val st = h.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("ss"))
      h.join(broadcast(st), Seq("event_type"))
        .filter((col("n") * col("c") - col("s")) * (col("n") * col("c") - col("s"))
          > lit(4L) * (col("n") * col("ss") - col("s") * col("s")))
        .select(col("event_type"), col("hr"), col("c"))
        .orderBy("event_type", "hr")
    },

    // T11 — sliding-window aggregation (batch twin of the streaming
    // form; StreamingSpec proves the two paths agree value-for-value).
    // Every event contributes to exactly 2 overlapping 10-min windows.
    Q(
      "ev10_sliding",
      """SELECT make_timestamp(((epoch_us(CAST(ts AS TIMESTAMP)) // 300000000)
        |         * 300 - k * 300) * 1000000) AS win_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_v
        |FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) s
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) => slidingBatch(Tables.events(s, d)) }
  )
}
