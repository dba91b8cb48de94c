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

    // R117 — Count-Min sketch (Cormode–Muthukrishnan): 4×8192 counters,
    // probe estimates = min over the 4 rows, emitted next to the exact
    // counts (CMS never underestimates — pinned in SketchesSpec). The 4
    // row-hash functions are 4 disjoint 8-hex-char SLICES of ONE md5 —
    // the first bring-up salted the key per row (4 md5 per fact row)
    // and md5 dominated the bench at 5.9 s/sf0.1; slicing one digest is
    // 4× cheaper and the slices are independent bits of a PRF. Build is
    // explode(4) + groupBy with map-side combine to ≤32k partials —
    // constant-size state however large the fact table.
    Q(
      "sk2_countmin",
      """WITH rws AS (SELECT unnest(generate_series(1, 4)) AS i),
        |cnt AS (SELECT i,
        |    CAST('0x'||substr(md5(CAST(l_partkey AS VARCHAR)), 1+(i-1)*8, 8)
        |         AS BIGINT) % 8192 AS b,
        |    count(*) AS c
        |  FROM lineitem, rws GROUP BY 1, 2),
        |probes AS (SELECT unnest(generate_series(1, 20)) AS k),
        |pc AS (SELECT k, i,
        |    CAST('0x'||substr(md5(CAST(k AS VARCHAR)), 1+(i-1)*8, 8)
        |         AS BIGINT) % 8192 AS b
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
        .withColumn("dg", md5(col("l_partkey").cast("string")))
        .withColumn("i", explode(expr("sequence(1, 4)")))
        .groupBy(col("i"), expr(
          "CAST(conv(substr(dg, 1+(i-1)*8, 8),16,10) AS BIGINT) % 8192")
          .as("b"))
        .agg(count(lit(1)).as("c"))
      val pc = s.range(1, 21).select(col("id").as("k"))
        .withColumn("dg", md5(col("k").cast("string")))
        .withColumn("i", explode(expr("sequence(1, 4)")))
        .withColumn("b", expr(
          "CAST(conv(substr(dg, 1+(i-1)*8, 8),16,10) AS BIGINT) % 8192"))
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
    // moment (= self-join size) of l_partkey, lower median of 8
    // group-means of 8 (Σ±1)² estimators. Two bring-up lessons are
    // baked in: (a) a raw median of squared sign-sums is χ²₁-shaped
    // (median ≈ 0.46·mean) and underestimated 4× — median-of-MEANS
    // re-centers it; (b) 64 per-row salted md5 calls cost 30 s/sf0.1 —
    // the 64 signs are now 64 BITS of one md5 (h1/h2 = two 60-bit
    // slices), and the 64 estimators are 64 conditional sums in ONE
    // map-side-combined aggregate (the dd3 SimHash pattern): no row
    // explosion, no shuffle, sketch state = 64 longs.
    Q(
      "sk3_ams_f2",
      s"""WITH h AS (SELECT
        |    CAST('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),1,15) AS BIGINT) AS h1,
        |    CAST('0x'||substr(md5(CAST(l_partkey AS VARCHAR)),16,15) AS BIGINT) AS h2
        |  FROM lineitem),
        |sums AS (SELECT ${amsSumsSql("//")} FROM h),
        |ests AS (SELECT unnest(generate_series(0, 63)) AS pos,
        |  unnest([${(1 to 64).map("s" + _).mkString(",")}]) AS sgn FROM sums),
        |grp AS (SELECT pos // 8 AS g,
        |  sum(CAST(sgn AS BIGINT) * sgn) // 8 AS m FROM ests GROUP BY 1),
        |med AS (SELECT m FROM grp ORDER BY m LIMIT 4),
        |ex AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM
        |  (SELECT count(*) AS c FROM lineitem GROUP BY l_partkey))
        |SELECT CAST(max(m) AS BIGINT) AS f2_est, max(f2_exact) AS f2_exact
        |FROM med, ex""".stripMargin
    ) { (s, d) =>
      val li = Tables.lineitem(s, d).select("l_partkey")
      val h = li.select(
        expr("CAST(conv(substr(md5(CAST(l_partkey AS STRING)),1,15),16,10) AS BIGINT)").as("h1"),
        expr("CAST(conv(substr(md5(CAST(l_partkey AS STRING)),16,15),16,10) AS BIGINT)").as("h2"))
      val aggs = (1 to 64).map { j => amsSign(j, "DIV").as(s"s$j") }
      val sums = h.agg(aggs.head, aggs.tail: _*)
      val ests = sums.select(posexplode(
        array((1 to 64).map(j => col(s"s$j")): _*)).as(Seq("pos", "sgn")))
      val grp = ests.groupBy(expr("pos DIV 8").as("g"))
        .agg(expr("sum(sgn * sgn) DIV 8").as("m"))
      val med = grp.orderBy("m").limit(4)
      val ex = li.groupBy("l_partkey").agg(count(lit(1)).as("c"))
        .agg(sum(col("c") * col("c")).as("f2_exact"))
      med.agg(max("m").as("f2_est")).crossJoin(broadcast(ex))
        .select(col("f2_est"), col("f2_exact"))
    }
  )

  /** Estimator j's ±1 sign from bit (j−1) of h1 (j ≤ 32) or bit (j−33)
    * of h2 — one md5 per row feeds all 64 AMS estimators. */
  private def amsSign(j: Int, div: String): Column = {
    val (src, bit) = if (j <= 32) ("h1", j - 1) else ("h2", j - 33)
    sum(expr(s"CASE WHEN (($src $div ${1L << bit}) % 2) = 0 THEN 1 ELSE -1 END"))
  }

  /** The 64 AMS sign-sum columns as oracle SQL (generated — single
    * source of truth with [[amsSign]]'s bit layout). */
  private def amsSumsSql(div: String): String =
    (1 to 64).map { j =>
      val (src, bit) = if (j <= 32) ("h1", j - 1) else ("h2", j - 33)
      s"sum(CASE WHEN (($src $div ${1L << bit}) % 2) = 0 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(", ")
}
