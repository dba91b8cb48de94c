package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Temporal-join catalog entries built on [[AsOfJoin]]: as-of (latest
  * earlier match) and interval range joins — operators Spark has no
  * built-in form for, composed from union+window / bucketed equi-join so
  * they stay single-shuffle at scale.
  */
object Temporal {

  val catalog: Seq[Q] = Seq(
    // As-of join: each purchase attaches the user's latest VIEW
    // at-or-before it (the view→purchase attribution join). Right side
    // pre-aggregated to one row per (user, ts) so the match is
    // well-defined on both engines (DuckDB ASOF JOIN oracle).
    Q(
      "aj1_asof_join",
      """WITH v AS (SELECT user_id, ts AS view_ts, max(value) AS view_value
        |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
        |SELECT c.event_id, c.user_id, c.ts, v.view_ts, v.view_value
        |FROM c ASOF LEFT JOIN v
        |  ON c.user_id = v.user_id AND c.ts >= v.view_ts
        |ORDER BY c.event_id""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max("value").as("view_value"))
        .withColumn("view_ts", col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      AsOfJoin.asof(purchases, views, Seq("user_id"), "ts",
          Seq("view_ts", "view_value"), rightTiebreak = lit(0))
        .orderBy("event_id")
    },

    // Range join: orders bucketed into 50k price bands via the
    // bucketed-equi-join formulation (never a nested loop).
    Q(
      "rj1_range_join",
      """WITH bands AS (SELECT g AS band_lo, g + 50000 AS band_hi
        |               FROM generate_series(0, 450000, 50000) t(g))
        |SELECT band_lo, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS tot
        |FROM orders JOIN bands
        |  ON o_totalprice >= band_lo AND o_totalprice < band_hi
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val bands = s.range(10)
        .select((col("id") * 50000L).as("band_lo"),
          ((col("id") + 1) * 50000L).as("band_hi"))
      AsOfJoin.rangeJoin(Tables.orders(s, d), "o_totalprice",
          bands, "band_lo", "band_hi", bucketWidth = 50000L)
        .groupBy("band_lo")
        .agg(count(lit(1)).as("n"),
          graft.functions.Stable.moneySum(col("o_totalprice")).as("tot"))
        .orderBy("band_lo")
    }
  )
}
