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

    // aj1 again THROUGH THE PHYSICAL OPERATOR (graft.plans.AsOfJoinExec,
    // planned from the asof_match marker by the injected strategy): the
    // same DuckDB ASOF oracle certifies the custom exec end-to-end, and
    // AsOfExecSpec pins that the plan really contains AsOfJoinExec — so
    // this entry is to the physical rung what q74 is to the optimizer
    // rung.
    Q(
      "aj2_asof_exec",
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
        .groupBy(col("user_id"), col("ts").as("view_ts"))
        .agg(max("value").as("view_value"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      AsOfJoin.asofNative(purchases, views, "user_id", "ts", "view_ts")
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
    },

    // L36 — INTERVAL-OVERLAP join (interval × interval, vs rj1's
    // value-in-interval): per-user 10-minute activity intervals matched
    // against recurring "maintenance windows" (every 7th hour), with
    // per-user overlap count and total overlapped microseconds. The
    // scalable formulation: both sides keyed by HOUR BUCKET — an
    // interval lands in its (≤2, distinct) covering buckets, a window
    // IS one bucket — so the pair search is an equi-join on the bucket
    // with the overlap test as residual, never an unbounded
    // inequality-only join. All integer µs; half-open [s, e) on both
    // engines, so boundary-touching pairs are excluded identically.
    Q(
      "rj2_interval_overlap",
      """WITH iv AS (SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP)) AS s,
        |    epoch_us(CAST(ts AS TIMESTAMP)) + 600000000 AS e
        |  FROM events),
        |  b AS (SELECT min(s) // 3600000000 AS hl, max(s) // 3600000000 AS hh
        |        FROM iv),
        |  mw AS (SELECT g * 3600000000 AS ws, (g + 1) * 3600000000 AS we
        |         FROM (SELECT unnest(range((SELECT hl FROM b),
        |                                   (SELECT hh FROM b) + 1)) AS g)
        |         WHERE g % 7 = 0),
        |  ov AS (SELECT user_id,
        |           least(iv.e, mw.we) - greatest(iv.s, mw.ws) AS o_us
        |         FROM iv JOIN mw ON iv.s < mw.we AND mw.ws < iv.e)
        |SELECT user_id, count(*) AS n_overlaps,
        |  CAST(sum(o_us) AS BIGINT) AS overlap_us
        |FROM ov GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val iv = Tables.events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("s"))
        .withColumn("e", col("s") + 600000000L)
        .localCheckpoint(true) // bounds agg + bucket join share one scan
      val bounds = iv.agg(expr("min(s) DIV 3600000000").as("hl"),
        expr("max(s) DIV 3600000000").as("hh"))
      val mw = bounds
        .select(explode(sequence(col("hl"), col("hh"))).as("hb"))
        .filter(col("hb") % 7 === 0)
        .select(col("hb"), (col("hb") * 3600000000L).as("ws"),
          ((col("hb") + 1) * 3600000000L).as("we"))
      val ivb = iv.withColumn("hb",
        explode(array_distinct(array(expr("s DIV 3600000000"), expr("e DIV 3600000000")))))
      ivb.join(broadcast(mw), Seq("hb")) // window set is calendar-sized;
        // at real scale this becomes a key-shuffle join on hb
        .filter(col("s") < col("we") && col("ws") < col("e"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_overlaps"),
          sum(least(col("e"), col("we")) - greatest(col("s"), col("ws")))
            .as("overlap_us"))
        .orderBy("user_id")
    },

    // T38 — forward fill / LOCF (last observation carried forward): the
    // time-series staple T22's spine INTERPOLATION deliberately isn't —
    // every event carries the user's latest purchase value AT OR BEFORE
    // it, nulls until the first observation. Declarative on both
    // engines as `last_value(x IGNORE NULLS)` over the (user, time)
    // window — one user-key shuffle, no self-join, no explode; carried
    // values are RAW doubles copied (never recomputed), so equality is
    // exact. Deterministic total order: (ts, event_id) — same-timestamp
    // events fill in event-id order on both engines.
    Q(
      "ev30_forward_fill",
      """SELECT event_id, user_id,
        |  last_value(CASE WHEN event_type = 'purchase' THEN value END
        |             IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS last_purchase_value
        |FROM events ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          last(when(col("event_type") === "purchase", col("value")),
            ignoreNulls = true).over(w).as("last_purchase_value"))
        .orderBy("event_id")
    },

    // R176 — as-of join with a TOLERANCE bound (pandas merge_asof's
    // `tolerance`, QuestDB/kdb's windowed asof): attach the latest
    // earlier view ONLY if it happened within 7 days, else no match.
    // Implementation insight that keeps it one AsOfJoin pass: the
    // latest-earlier match overall IS the latest-earlier match within
    // tolerance whenever it falls inside the window, and if it falls
    // outside then NO view is inside (anything inside would be later
    // and would have won) — so tolerance is a post-asof NULL-out, not
    // a different join. The oracle takes the explicit bounded-max
    // form; both compute the identical match set.
    Q(
      "aj3_asof_tolerance",
      """WITH v AS (SELECT user_id, ts AS view_ts, max(value) AS view_value
        |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT c.event_id, c.user_id, c.ts, max(v.view_ts) AS view_ts
        |      FROM c LEFT JOIN v
        |        ON c.user_id = v.user_id AND v.view_ts <= c.ts
        |       AND epoch_us(c.ts) - epoch_us(v.view_ts) <= 604800000000
        |      GROUP BY 1, 2, 3)
        |SELECT m.event_id, m.user_id, m.ts, m.view_ts, v.view_value,
        |  CASE WHEN m.view_ts IS NULL THEN 0 ELSE 1 END AS matched
        |FROM m LEFT JOIN v ON m.user_id = v.user_id AND m.view_ts = v.view_ts
        |ORDER BY m.event_id""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max("value").as("view_value"))
        .withColumn("view_ts", col("ts"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val tolUs = 7L * 86400L * 1000000L
      AsOfJoin.asof(purchases, views, Seq("user_id"), "ts",
          Seq("view_ts", "view_value"), rightTiebreak = lit(0))
        .withColumn("in_tol",
          col("view_ts").isNotNull
            && unix_micros(col("ts")) - unix_micros(col("view_ts")) <= tolUs)
        .select(col("event_id"), col("user_id"), col("ts"),
          when(col("in_tol"), col("view_ts")).as("view_ts"),
          when(col("in_tol"), col("view_value")).as("view_value"),
          when(col("in_tol"), 1L).otherwise(0L).as("matched"))
        .orderBy("event_id")
    },

    // R203 — BAND self-join (|a−b| ≤ δ) via the bucketed-equi-join
    // technique: customers whose balances sit within $50 of each
    // other. A naive |a−b|≤δ condition is a nested-loop cross product;
    // bucketing by δ (bal DIV 5000) turns it into THREE equi-joins —
    // each LEFT row probes its own and both adjacent buckets (explode
    // of 3 scan-local probe keys), every qualifying pair is produced
    // exactly once (the right row's bucket is unique), then the exact
    // |diff| ≤ δ predicate prunes the band edges. Fan-out is bounded
    // by bucket occupancy, never n². Rolled up to the segment-pair
    // matrix so the output stays ≤|segments|² at any scale; the total
    // pair count cross-checks the oracle's direct quadratic form.
    Q(
      "rj3_band_join",
      """WITH c AS (SELECT c_custkey AS ck, c_mktsegment AS seg,
        |    CAST(round(c_acctbal*100) AS BIGINT) AS bal FROM customer),
        |p AS (SELECT a.seg AS seg_a, b.seg AS seg_b,
        |        abs(a.bal - b.bal) AS dc
        |      FROM c a JOIN c b ON a.ck < b.ck AND abs(a.bal - b.bal) <= 5000)
        |SELECT seg_a, seg_b,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(dc) // count(*) AS BIGINT) AS mean_diff_c,
        |  CAST(max(dc) AS BIGINT) AS max_diff_c
        |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
    ) { (s, d) =>
      val c = Tables.customer(s, d).select(
        col("c_custkey").as("ck"), col("c_mktsegment").as("seg"),
        round(col("c_acctbal") * 100).cast("long").as("bal"))
        .withColumn("bk", expr("bal DIV 5000"))
        .localCheckpoint(true) // probe side + build side
      // each left row probes bucket-1, bucket, bucket+1 (equi-join,
      // never a nested loop); exact band predicate prunes the edges
      val probes = c.select(col("ck"), col("seg"), col("bal"),
        explode(array(col("bk") - 1, col("bk"), col("bk") + 1)).as("bk"))
      val pairs = probes.as("a")
        .join(c.select(col("ck").as("bck"), col("seg").as("bseg"),
          col("bal").as("bbal"), col("bk")), Seq("bk"))
        .filter(col("ck") < col("bck") && abs(col("bal") - col("bbal")) <= 5000)
        .select(col("seg").as("seg_a"), col("bseg").as("seg_b"),
          abs(col("bal") - col("bbal")).as("dc"))
      pairs.groupBy("seg_a", "seg_b")
        .agg(count(lit(1)).as("n_pairs"),
          expr("sum(dc) DIV count(*)").as("mean_diff_c"),
          max("dc").as("max_diff_c"))
        .orderBy("seg_a", "seg_b")
    },

    // R262 — as-of join, NEAREST direction (pandas merge_asof
    // direction='nearest'): each purchase attaches the user's view
    // CLOSEST in time, either side — the sensor-alignment semantics
    // aj1's backward-only match can't express (a reading logged just
    // AFTER the probe is the right match when nothing precedes it).
    // Built as TWO linear as-of passes over the same machinery:
    // backward on the micros axis, forward as backward on the NEGATED
    // axis (latest −v ≤ −t ⇔ earliest v ≥ t), then one row-local pick
    // of the smaller |Δ| with ties to the earlier (backward) view —
    // two key-shuffles total, no per-row probe, exactly aj1's 100 TB
    // shape. The oracle is the brute quadratic argmin under the same
    // (|Δ|, view_ts) total order; purchases from users with no views
    // drop on both engines.
    Q(
      "aj4_asof_nearest",
      """WITH v AS (SELECT user_id, ts AS view_ts, max(value) AS view_value
        |           FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |c AS (SELECT event_id, user_id, ts FROM events
        |      WHERE event_type = 'purchase'),
        |j AS (SELECT c.event_id, c.user_id, c.ts, v.view_ts, v.view_value,
        |        abs(epoch_us(c.ts) - epoch_us(v.view_ts)) AS delta_us,
        |        row_number() OVER (PARTITION BY c.event_id
        |          ORDER BY abs(epoch_us(c.ts) - epoch_us(v.view_ts)), v.view_ts)
        |          AS rk
        |      FROM c JOIN v ON c.user_id = v.user_id)
        |SELECT event_id, user_id, ts, view_ts, view_value,
        |  CAST(delta_us AS BIGINT) AS delta_us,
        |  CASE WHEN view_ts <= ts THEN 'backward' ELSE 'forward' END
        |    AS direction
        |FROM j WHERE rk = 1 ORDER BY event_id""".stripMargin
    ) { (s, d) =>
      val ev = Tables.events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts"))
        .agg(max("value").as("view_value"))
        .withColumn("view_ts", col("ts"))
        .drop("ts")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      def pass(sign: Int, suffix: String) = AsOfJoin.asof(
          purchases.withColumn("__k", lit(sign) * unix_micros(col("ts"))),
          views.withColumn("__k", lit(sign) * unix_micros(col("view_ts"))),
          Seq("user_id"), "__k", Seq("view_ts", "view_value"),
          rightTiebreak = lit(0))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("view_ts").as(s"view_ts_$suffix"),
          col("view_value").as(s"view_value_$suffix"))
      val back = pass(1, "b")
      val fwd = pass(-1, "f").select("event_id", "view_ts_f", "view_value_f")
      val db = unix_micros(col("ts")) - unix_micros(col("view_ts_b"))
      val df = unix_micros(col("view_ts_f")) - unix_micros(col("ts"))
      val useBack = col("view_ts_b").isNotNull &&
        (col("view_ts_f").isNull || db <= df)
      back.join(fwd, Seq("event_id"))
        .select(col("event_id"), col("user_id"), col("ts"),
          when(useBack, col("view_ts_b")).otherwise(col("view_ts_f"))
            .as("view_ts"),
          when(useBack, col("view_value_b")).otherwise(col("view_value_f"))
            .as("view_value"),
          when(useBack, db).otherwise(df).as("delta_us"),
          when(useBack, lit("backward")).otherwise(lit("forward"))
            .as("direction"))
        .filter(col("view_ts").isNotNull) // users with no views drop
        .orderBy("event_id")
    }
  )
}
