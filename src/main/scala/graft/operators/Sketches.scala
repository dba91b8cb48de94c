package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** KMV (k-minimum-values, "theta") sketch — the mergeable distinct-count
  * sketch that, unlike HLL (q30_hll_union), supports set INTERSECTION
  * estimates: keep the k smallest values of a uniform hash over the set;
  * θ = the k-th smallest; |S| ≈ (k-1)·M/θ for hash space [0,M); for two
  * sketches, the k smallest of their union is a valid sketch of A∪B and
  * ρ = |K ∩ A-sketch ∩ B-sketch| gives Jaccard ≈ ρ/k, hence
  * |A∩B| ≈ (ρ/k)·est(A∪B). (Beyer et al., "On Synopses for Distinct-
  * Value Estimation Under Multiset Operations", SIGMOD'07.)
  *
  * The hash is md5 truncated to 15 hex chars (60 bits) — deterministic
  * AND engine-portable, so unlike the HLL/quantile sketches this
  * approximate operator is FULLY oracle-checked: DuckDB computes the
  * identical sketch bit for bit (`CAST('0x'||substr(md5(..)..) AS
  * BIGINT)` ↔ Spark `conv(substr(md5(..)..), 16, 10)`).
  *
  * Scale design: each per-set sketch is `ORDER BY h LIMIT k` — Spark
  * plans that as TakeOrderedAndProject (a bounded per-partition heap +
  * tiny driver merge, NO global sort shuffle), the same shape a
  * 1000-executor sketch build wants; everything after the two k-row
  * sketches is constant-size work. Membership of union-sketch values in
  * the per-set sketches is sound because θ(union) ≤ θ(A): the union's
  * k smallest are a subset of the concatenated per-set sketches.
  *
  * Reference intent: the reference's approximate-aggregation surface
  * (SURVEY.md §2 R31/R32) — this adds the intersectable member of the
  * sketch family.
  */
object Sketches {

  /** 60-bit engine-portable uniform hash of a key column. */
  def portableHash(key: Column): Column =
    expr(s"CAST(conv(substr(md5(CAST(${key.toString} AS STRING)), 1, 15), 16, 10) AS BIGINT)")

  /** The k smallest distinct hash values of `key` in `df` — a KMV
    * sketch, planned as TakeOrderedAndProject (bounded heap, no global
    * sort). */
  def kmvSketch(df: DataFrame, key: String, k: Int): DataFrame =
    df.select(portableHash(col(key)).as("h")).distinct()
      .orderBy("h").limit(k)

  private val M = "1152921504606846976" // 16^15 = 2^60

  val catalog: Seq[Q] = Seq(
    // R112 — KMV union + intersection estimate over two customer
    // cohorts (big-ticket buyers before/after 1998), alongside the
    // exact counts so the estimate quality is part of the checked
    // output. All arithmetic integral: DECIMAL(38,0)/HUGEINT products
    // with truncating DIV on both engines.
    Q(
      "sk1_kmv_intersect",
      s"""WITH a AS (SELECT DISTINCT o_custkey AS k FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1998-01-01' AND o_totalprice > 300000),
        |b AS (SELECT DISTINCT o_custkey AS k FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_totalprice > 300000),
        |ha AS (SELECT CAST('0x'||substr(md5(CAST(k AS VARCHAR)),1,15) AS BIGINT) AS h FROM a),
        |hb AS (SELECT CAST('0x'||substr(md5(CAST(k AS VARCHAR)),1,15) AS BIGINT) AS h FROM b),
        |ka AS (SELECT h FROM ha ORDER BY h LIMIT 128),
        |kb AS (SELECT h FROM hb ORDER BY h LIMIT 128),
        |ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb)
        |       ORDER BY h LIMIT 128),
        |th AS (SELECT max(h) AS theta, count(*) AS kk FROM ku),
        |rho AS (SELECT count(*) AS r FROM ku
        |  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
        |eu AS (SELECT CASE WHEN kk < 128 THEN CAST(kk AS HUGEINT)
        |         ELSE CAST(kk-1 AS HUGEINT) * $M // theta END AS est_u,
        |         theta, kk FROM th),
        |ex AS (SELECT (SELECT count(*) FROM a) AS na, (SELECT count(*) FROM b) AS nb,
        |  (SELECT count(*) FROM a WHERE k IN (SELECT k FROM b)) AS ni)
        |SELECT kk AS k, theta,
        |  CAST(est_u AS BIGINT) AS est_union,
        |  CAST(CAST(r AS HUGEINT) * est_u // kk AS BIGINT) AS est_intersect,
        |  na + nb - ni AS exact_union, ni AS exact_intersect
        |FROM eu, rho, ex""".stripMargin
    ) { (s, d) =>
      val o = Tables.orders(s, d)
      def cohort(pred: Column): DataFrame =
        o.filter(pred && col("o_totalprice") > 300000)
          .select(col("o_custkey").as("k")).distinct()
      val a = cohort(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .localCheckpoint(true)
      val b = cohort(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .localCheckpoint(true)
      val ka = kmvSketch(a, "k", 128).localCheckpoint(true)
      val kb = kmvSketch(b, "k", 128).localCheckpoint(true)
      val ku = ka.union(kb).distinct().orderBy("h").limit(128)
        .localCheckpoint(true)
      val th = ku.agg(max("h").as("theta"), count(lit(1)).as("kk"))
      val rho = ku.join(ka, Seq("h"), "left_semi")
        .join(kb, Seq("h"), "left_semi")
        .agg(count(lit(1)).as("r"))
      val ex = a.agg(count(lit(1)).as("na")).crossJoin(
          b.agg(count(lit(1)).as("nb"))).crossJoin(
          a.join(b, Seq("k"), "left_semi").agg(count(lit(1)).as("ni")))
      th.crossJoin(rho).crossJoin(ex)
        .withColumn("est_u", expr(
          s"CASE WHEN kk < 128 THEN CAST(kk AS DECIMAL(38,0)) " +
          s"ELSE CAST(kk-1 AS DECIMAL(38,0)) * $M DIV theta END"))
        .select(col("kk").as("k"), col("theta"),
          expr("CAST(est_u AS BIGINT)").as("est_union"),
          expr("CAST(CAST(r AS DECIMAL(38,0)) * est_u DIV kk AS BIGINT)")
            .as("est_intersect"),
          (col("na") + col("nb") - col("ni")).as("exact_union"),
          col("ni").as("exact_intersect"))
    },

    // R117 — Count-Min sketch (Cormode–Muthukrishnan): 4×8192 counters
    // over the portable hash, probe estimates = min over the 4 rows,
    // emitted next to the exact counts (CMS never underestimates —
    // pinned in SketchesSpec). Build is one explode(4) + groupBy on
    // (row, bucket) with map-side combine to ≤32k partials per task;
    // probes join the ≤32k-row sketch — constant-size state however
    // large the fact table.
    Q(
      "sk2_countmin",
      """WITH rws AS (SELECT unnest(generate_series(1, 4)) AS i),
        |cnt AS (SELECT i,
        |    CAST('0x'||substr(md5(i||'_'||l_partkey),1,15) AS BIGINT) % 8192 AS b,
        |    count(*) AS c
        |  FROM lineitem, rws GROUP BY 1, 2),
        |probes AS (SELECT unnest(generate_series(1, 20)) AS k),
        |pc AS (SELECT k, i,
        |    CAST('0x'||substr(md5(i||'_'||k),1,15) AS BIGINT) % 8192 AS b
        |  FROM probes, rws),
        |est AS (SELECT k, min(coalesce(c, 0)) AS est
        |  FROM pc LEFT JOIN cnt USING (i, b) GROUP BY 1),
        |ex AS (SELECT l_partkey AS k, count(*) AS exact FROM lineitem GROUP BY 1)
        |SELECT k, CAST(est AS BIGINT) AS est,
        |  CAST(coalesce(exact, 0) AS BIGINT) AS exact
        |FROM est LEFT JOIN ex USING (k) ORDER BY k""".stripMargin
    ) { (s, d) =>
      val li = Tables.lineitem(s, d).select("l_partkey")
      val cnt = li
        .withColumn("i", explode(expr("sequence(1, 4)")))
        .groupBy(col("i"), expr(
          "CAST(conv(substr(md5(concat(CAST(i AS STRING),'_',CAST(l_partkey AS STRING))),1,15),16,10) AS BIGINT) % 8192")
          .as("b"))
        .agg(count(lit(1)).as("c"))
      val pc = s.range(1, 21).select(col("id").as("k"))
        .withColumn("i", explode(expr("sequence(1, 4)")))
        .withColumn("b", expr(
          "CAST(conv(substr(md5(concat(CAST(i AS STRING),'_',CAST(k AS STRING))),1,15),16,10) AS BIGINT) % 8192"))
      val est = pc.join(cnt, Seq("i", "b"), "left")
        .groupBy("k").agg(min(coalesce(col("c"), lit(0L))).as("est"))
      val ex = li.groupBy(col("l_partkey").as("k"))
        .agg(count(lit(1)).as("exact"))
      est.join(ex, Seq("k"), "left")
        .select(col("k"), col("est"),
          coalesce(col("exact"), lit(0L)).as("exact"))
        .orderBy("k")
    },

    // R118 — AMS F2 sketch (Alon–Matias–Szegedy): the second frequency
    // moment (= self-join size) of l_partkey estimated as the lower median of 8 group-means of 8 estimators (Σ ±1 per key)² each, ±1 from the portable
    // hash's low bit. Each estimator is ONE map-side-combined sum — the
    // whole sketch state is 16 longs. Exact F2 alongside for the
    // checked error.
    Q(
      "sk3_ams_f2",
      """WITH ests AS (SELECT j, s * s AS e2 FROM (
        |  SELECT j, sum(CASE WHEN
        |      CAST('0x'||substr(md5(j||'#'||l_partkey),1,15) AS BIGINT) % 2 = 0
        |    THEN 1 ELSE -1 END) AS s
        |  FROM lineitem, (SELECT unnest(generate_series(1, 64)) AS j) GROUP BY 1)),
        |grp AS (SELECT (j - 1) // 8 AS g, sum(e2) // 8 AS m
        |  FROM ests GROUP BY 1),
        |med AS (SELECT m FROM grp ORDER BY m LIMIT 4),
        |ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM
        |  (SELECT count(*) AS c FROM lineitem GROUP BY l_partkey))
        |SELECT CAST(max(m) AS BIGINT) AS f2_est, max(f2_exact) AS f2_exact
        |FROM med, ex""".stripMargin
    ) { (s, d) =>
      val li = Tables.lineitem(s, d).select("l_partkey")
      val ests = li
        .withColumn("j", explode(expr("sequence(1, 64)")))
        .groupBy("j")
        .agg(sum(expr(
          "CASE WHEN CAST(conv(substr(md5(concat(CAST(j AS STRING),'#',CAST(l_partkey AS STRING))),1,15),16,10) AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END"))
          .as("s"))
        .select(col("j"), (col("s") * col("s")).as("e2"))
      // canonical AMS median-of-means: a single (Σ±1)² estimator is
      // χ²₁-shaped (median ≈ 0.46·mean — the raw median underestimated
      // 4× in bring-up); averaging groups of 4 re-centers it
      val grp = ests.groupBy(expr("(j - 1) DIV 8").as("g"))
        .agg(expr("sum(e2) DIV 8").as("m"))
      val med = grp.orderBy("m").limit(4)
      val ex = li.groupBy("l_partkey").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("f2_exact"))
      med.agg(max("m").as("f2_est")).crossJoin(broadcast(ex))
        .select(col("f2_est"), col("f2_exact"))
    }
  )
}
