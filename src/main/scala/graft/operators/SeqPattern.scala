package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Event-sequence pattern matching (SURVEY §2 T49) — the
  * MATCH_RECOGNIZE shape: per user, the time-ordered event stream is
  * encoded as a one-char-per-event string and a regex over that
  * alphabet finds non-overlapping behavioral episodes (here
  * `V[CE]*P` — a view, any interleaved clicks/errors, then a
  * purchase). This is the classic session-pattern operator funnels
  * can't express (funnels are subsequence matches; this is CONTIGUOUS
  * matching with repetition).
  *
  * Portability: for patterns of the `a X* b` family with b ∉ X,
  * leftmost-greedy (java.util.regex) and leftmost-longest (RE2/DuckDB)
  * semantics provably coincide — the match at a given start is the
  * maximal X-run iff followed by b — so the cross-engine hash match is
  * sound, not lucky. Scale: ONE groupBy(user) shuffle; per-user state
  * is the bounded per-key event string (the same bound sessionization
  * and the funnel already rely on); match metrics are exact integers.
  */
object SeqPattern {

  val catalog: Seq[Q] = Seq(
    Q(
      "ev42_pattern_match",
      """WITH enc AS (
        |  SELECT user_id,
        |    string_agg(CASE event_type
        |                 WHEN 'signup' THEN 'S' WHEN 'click' THEN 'C'
        |                 WHEN 'view' THEN 'V' WHEN 'purchase' THEN 'P'
        |                 ELSE 'E' END, '' ORDER BY ts, event_id) AS s,
        |    count(*) AS n_events
        |  FROM events GROUP BY user_id
        |), m AS (
        |  SELECT user_id, n_events, regexp_extract_all(s, 'V[CE]*P') AS ms
        |  FROM enc
        |)
        |SELECT user_id,
        |  CAST(n_events AS BIGINT) AS n_events,
        |  CAST(len(ms) AS BIGINT) AS n_match,
        |  CAST(coalesce(list_sum(list_transform(ms, x -> length(x))), 0)
        |       AS BIGINT) AS total_len,
        |  CAST(coalesce(list_max(list_transform(ms, x -> length(x))), 0)
        |       AS BIGINT) AS max_len
        |FROM m ORDER BY user_id""".stripMargin
    ) { (s, d) =>
      val enc = Tables.events(s, d)
        .select(col("user_id"),
          struct(col("ts"), col("event_id"),
            when(col("event_type") === "signup", "S")
              .when(col("event_type") === "click", "C")
              .when(col("event_type") === "view", "V")
              .when(col("event_type") === "purchase", "P")
              .otherwise("E").as("c")).as("ev"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          array_join(transform(array_sort(collect_list(col("ev"))),
            e => e.getField("c")), "").as("str"))
      enc
        .withColumn("ms", expr("regexp_extract_all(str, 'V[CE]*P', 0)"))
        .select(col("user_id"), col("n_events"),
          size(col("ms")).cast("long").as("n_match"),
          expr("aggregate(transform(ms, x -> length(x)), 0L, (a, x) -> a + x)")
            .as("total_len"),
          coalesce(array_max(transform(col("ms"), x => length(x))), lit(0))
            .cast("long").as("max_len"))
        .orderBy("user_id")
    },
  )
}
