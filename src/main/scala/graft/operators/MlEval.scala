package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model-evaluation aggregates (SURVEY §2 L66–L68): the metrics a
  * training-data pipeline runs over scored eval sets — ROC AUC,
  * calibration bins, NDCG. The reference's surface stops at relational
  * aggregation; these follow the same oracle discipline as MlPrep
  * (reference: DistributedQueryEngine.diff aggregation hunks): every
  * metric is exact integer algebra as far as the math allows, any
  * transcendental term is micro-quantized ONCE to a 1e6-unit BIGINT so
  * sums are order-invariant and engine-exact, and final doubles are a
  * single division (+ 6-dp round where a transcendental entered).
  *
  * Scale: all three are one or two keyed shuffles over the scored set —
  * no driver-side math, no per-group collect. AUC's rank windows
  * partition by the group key (bounded groups at any corpus size);
  * NDCG's windows partition by customer (top-k rows per key survive).
  */
object MlEval {

  // Engine-pinned ln shared with tx50/tx51/q155 — see
  // graft.functions.PinnedMath for the ladder + series derivation.
  private def pinnedLnCtes(from: String): String =
    graft.functions.PinnedMath.lnCtes(from)

  val catalog: Seq[Q] = Seq(

    // L66 — ROC AUC per group from the rank-sum (Mann-Whitney U)
    // identity: AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) / (n⁺ n⁻), with average
    // ranks for ties. Doubled ranks keep the tie-average integral:
    // 2·avgrank = 2·minrank + ties − 1. The checked auc column is ONE
    // exact-integer division evaluated identically by both engines.
    Q(
      "ml5_auc",
      """WITH scored AS (
        |  SELECT o_orderpriority AS grp,
        |         CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
        |  FROM orders
        |), ranked AS (
        |  SELECT grp, label,
        |         2*rank() OVER (PARTITION BY grp ORDER BY cents)
        |           + count(*) OVER (PARTITION BY grp, cents) - 1 AS dubrank
        |  FROM scored
        |)
        |SELECT grp,
        |  CAST(sum(label) AS BIGINT) AS n_pos,
        |  CAST(count(*) - sum(label) AS BIGINT) AS n_neg,
        |  CAST(sum(CASE WHEN label = 1 THEN dubrank ELSE 0 END)
        |       - sum(label)*(sum(label)+1) AS BIGINT) AS auc_num,
        |  CAST(2*sum(label)*(count(*)-sum(label)) AS BIGINT) AS auc_den,
        |  CASE WHEN 2*sum(label)*(count(*)-sum(label)) = 0 THEN NULL
        |       ELSE CAST(sum(CASE WHEN label = 1 THEN dubrank ELSE 0 END)
        |                 - sum(label)*(sum(label)+1) AS DOUBLE)
        |            / (2*sum(label)*(count(*)-sum(label))) END AS auc
        |FROM ranked GROUP BY grp ORDER BY grp""".stripMargin
    ) { (s, d) =>
      val scored = Tables.orders(s, d).select(
        col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("label"))
      // rank() is IntegerType — cast to long BEFORE the multiply, or
      // groups past ~1.07B rows silently wrap under non-ANSI arithmetic
      // (DuckDB's rank() is BIGINT, so the oracle would diverge).
      val ranked = scored.select(col("grp"), col("label"),
        (lit(2L) * rank().over(Window.partitionBy("grp").orderBy("cents")).cast("long")
          + count(lit(1)).over(Window.partitionBy("grp", "cents")) - 1)
          .cast("long").as("dubrank"))
      ranked.groupBy("grp")
        .agg(
          sum("label").as("n_pos"),
          (count(lit(1)) - sum("label")).as("n_neg"),
          (sum(when(col("label") === 1, col("dubrank")).otherwise(0L))
            - sum("label") * (sum("label") + 1)).as("auc_num"),
          (lit(2) * sum("label") * (count(lit(1)) - sum("label"))).as("auc_den"))
        .select(col("grp"), col("n_pos"), col("n_neg"), col("auc_num"),
          col("auc_den"),
          // all-positive / all-negative group: AUC undefined — NULL on
          // BOTH engines (Spark's lazy divide returns NULL, DuckDB's
          // double division would emit inf and break the compare)
          when(col("auc_den") === 0, lit(null))
            .otherwise(col("auc_num").cast("double") / col("auc_den"))
            .as("auc"))
        .orderBy("grp")
    },

    // L67 — calibration table: scores normalized against the global max
    // into 10 equal-width bins by pure integer floor-division (cents*10
    // DIV max — no float boundary anywhere), per-bin counts + exact
    // cent sums; observed rate and mean predicted score are single
    // exact-integer divisions.
    Q(
      "ml6_calibration",
      """WITH scored AS (
        |  SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
        |  FROM orders
        |), mx AS (SELECT max(cents) AS max_cents FROM scored)
        |SELECT
        |  CAST(CASE WHEN cents = max_cents THEN 9
        |            ELSE (cents*10) // max_cents END AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(label) AS BIGINT) AS n_pos,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(sum(label) AS DOUBLE) / count(*) AS frac_pos,
        |  CAST(sum(cents) AS DOUBLE) / (CAST(count(*) AS BIGINT) * max_cents)
        |    AS mean_score
        |FROM scored, mx
        |GROUP BY 1, max_cents ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val scored = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("label"))
      val mx = scored.agg(max("cents").as("max_cents"))
      scored.crossJoin(broadcast(mx))
        .withColumn("bin",
          when(col("cents") === col("max_cents"), lit(9L))
            .otherwise(expr("(cents*10) DIV max_cents")).cast("long"))
        .groupBy("bin", "max_cents")
        .agg(count(lit(1)).as("n"), sum("label").as("n_pos"),
          sum("cents").as("sum_cents"))
        .select(col("bin"), col("n"), col("n_pos"), col("sum_cents"),
          (col("n_pos").cast("double") / col("n")).as("frac_pos"),
          (col("sum_cents").cast("double") / (col("n") * col("max_cents")))
            .as("mean_score"))
        .orderBy("bin")
    },

    // L68 — NDCG@5 per customer: ranking = top-5 orders by price
    // (orderkey tiebreak), graded relevance 6−priority digit (1..5, so
    // IDCG can never be zero). Each rel/log2(pos+1) term is
    // micro-quantized to a 1e6-unit BIGINT (tx19 discipline — the sum
    // is order-invariant and engine-exact); ndcg is one division of the
    // two exact sums, 6-dp rounded (q47 precedent for the single
    // transcendental that entered each term).
    Q(
      "ml7_ndcg",
      """WITH scored AS (
        |  SELECT o_custkey,
        |         CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |         o_orderkey,
        |         6 - CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS rel
        |  FROM orders
        |), top5 AS (
        |  SELECT o_custkey, cents, o_orderkey, rel,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY cents DESC, o_orderkey) AS pos
        |  FROM scored
        |  QUALIFY pos <= 5
        |), ideal AS (
        |  SELECT o_custkey, rel, pos,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY rel DESC, cents DESC, o_orderkey)
        |           AS ipos
        |  FROM top5
        |)
        |SELECT o_custkey,
        |  CAST(sum(CAST(round(1e6 * rel / log2(pos + 1)) AS BIGINT))
        |       AS BIGINT) AS dcg_micro,
        |  CAST(sum(CAST(round(1e6 * rel / log2(ipos + 1)) AS BIGINT))
        |       AS BIGINT) AS idcg_micro,
        |  round(CAST(sum(CAST(round(1e6 * rel / log2(pos + 1)) AS BIGINT))
        |             AS DOUBLE)
        |        / sum(CAST(round(1e6 * rel / log2(ipos + 1)) AS BIGINT)), 6)
        |    AS ndcg
        |FROM ideal GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
    ) { (s, d) =>
      val scored = Tables.orders(s, d).select(
        col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"),
        (lit(6) - substring(col("o_orderpriority"), 1, 1).cast("long"))
          .as("rel"))
      val top5 = scored
        .withColumn("pos", row_number().over(
          Window.partitionBy("o_custkey")
            .orderBy(col("cents").desc, col("o_orderkey"))))
        .filter(col("pos") <= 5)
      val ideal = top5.withColumn("ipos", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("rel").desc, col("cents").desc, col("o_orderkey"))))
      ideal.groupBy("o_custkey")
        .agg(
          sum(expr("CAST(round(1e6 * rel / log2(pos + 1)) AS BIGINT)"))
            .as("dcg_micro"),
          sum(expr("CAST(round(1e6 * rel / log2(ipos + 1)) AS BIGINT)"))
            .as("idcg_micro"))
        .select(col("o_custkey"), col("dcg_micro"), col("idcg_micro"),
          expr("round(CAST(dcg_micro AS DOUBLE) / idcg_micro, 6)").as("ndcg"))
        .orderBy("o_custkey")
    },

    // L72 — two-feature OLS via closed-form normal equations (Cramer's
    // rule), completing the regression family (q60's regr_ is single-
    // feature): per priority group, order cents regressed on (lineitem
    // count, total quantity). Every moment is an exact integer; the
    // n-scaled centered forms and the 2×2 determinant algebra ride
    // decimal(38,0)/HUGEINT (q73/q88 overflow precedent) so b1/b2/b0
    // are each ONE double division of exact integers, 6-dp rounded.
    // Two fixed-width shuffles (per-order reduce, per-group moments);
    // the solve itself is O(|groups|).
    Q(
      "ml8_ols2",
      """WITH feat AS (
        |  SELECT o.o_orderpriority AS grp,
        |    CAST(round(o.o_totalprice*100) AS BIGINT) AS y,
        |    f.x1, f.x2
        |  FROM orders o JOIN (
        |    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS x1,
        |      CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS x2
        |    FROM lineitem GROUP BY 1) f ON f.l_orderkey = o.o_orderkey),
        |m AS (
        |  SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x1*x1) AS BIGINT) AS s11, CAST(sum(x2*x2) AS BIGINT) AS s22,
        |    CAST(sum(x1*x2) AS BIGINT) AS s12,
        |    CAST(sum(x1*y) AS BIGINT) AS s1y, CAST(sum(x2*y) AS BIGINT) AS s2y
        |  FROM feat GROUP BY 1),
        |c AS (
        |  SELECT grp, n, s1, s2, sy,
        |    CAST(n AS HUGEINT)*s11 - CAST(s1 AS HUGEINT)*s1 AS a,
        |    CAST(n AS HUGEINT)*s12 - CAST(s1 AS HUGEINT)*s2 AS b,
        |    CAST(n AS HUGEINT)*s22 - CAST(s2 AS HUGEINT)*s2 AS cc,
        |    CAST(n AS HUGEINT)*s1y - CAST(s1 AS HUGEINT)*sy AS d1,
        |    CAST(n AS HUGEINT)*s2y - CAST(s2 AS HUGEINT)*sy AS d2
        |  FROM m),
        |k AS (SELECT grp, n, s1, s2, sy, a*cc - b*b AS det,
        |        cc*d1 - b*d2 AS n1, a*d2 - b*d1 AS n2
        |      FROM c)
        |SELECT grp, n,
        |  round(CAST(CAST(sy AS HUGEINT)*det - n1*s1 - n2*s2 AS DOUBLE)
        |        / CAST(CAST(n AS HUGEINT)*det AS DOUBLE), 6) AS b0,
        |  round(CAST(n1 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b1,
        |  round(CAST(n2 AS DOUBLE) / CAST(det AS DOUBLE), 6) AS b2
        |FROM k ORDER BY grp""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val f = Tables.lineitem(s, d).groupBy("l_orderkey")
        .agg(count(lit(1)).as("x1"),
          sum(round(col("l_quantity")).cast("long")).as("x2"))
      val feat = Tables.orders(s, d)
        .join(f, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_orderpriority").as("grp"),
          round(col("o_totalprice") * 100).cast("long").as("y"),
          col("x1"), col("x2"))
      val m = feat.groupBy("grp").agg(count(lit(1)).as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"), sum("y").as("sy"),
        sum(col("x1") * col("x1")).as("s11"),
        sum(col("x2") * col("x2")).as("s22"),
        sum(col("x1") * col("x2")).as("s12"),
        sum(col("x1") * col("y")).as("s1y"),
        sum(col("x2") * col("y")).as("s2y"))
      val c = m.select(col("grp"), col("n"), col("s1"), col("s2"), col("sy"),
        (dec(col("n")) * col("s11") - dec(col("s1")) * col("s1")).as("a"),
        (dec(col("n")) * col("s12") - dec(col("s1")) * col("s2")).as("b"),
        (dec(col("n")) * col("s22") - dec(col("s2")) * col("s2")).as("cc"),
        (dec(col("n")) * col("s1y") - dec(col("s1")) * col("sy")).as("d1"),
        (dec(col("n")) * col("s2y") - dec(col("s2")) * col("sy")).as("d2"))
      val k = c.select(col("grp"), col("n"), col("s1"), col("s2"), col("sy"),
        (col("a") * col("cc") - col("b") * col("b")).as("det"),
        (col("cc") * col("d1") - col("b") * col("d2")).as("n1"),
        (col("a") * col("d2") - col("b") * col("d1")).as("n2"))
      k.select(col("grp"), col("n"),
          round((dec(col("sy")) * col("det") - col("n1") * col("s1")
            - col("n2") * col("s2")).cast("double")
            / (dec(col("n")) * col("det")).cast("double"), 6).as("b0"),
          round(col("n1").cast("double") / col("det").cast("double"), 6).as("b1"),
          round(col("n2").cast("double") / col("det").cast("double"), 6).as("b2"))
        .orderBy("grp")
    },

    // L83 — confusion matrix + threshold metrics: the operating-point
    // readout beside ml5's threshold-free AUC. Classifier = "cents
    // above the corpus mean" (threshold from ONE exact integer
    // aggregate, sum DIV count — no float boundary); label = order
    // status F. Cells are one conditional aggregate over the scan;
    // precision/recall/F1 in exact integer permille. Scale: a single
    // map-side-combinable pass, threshold broadcast as a 1-row scalar.
    Q(
      "ml9_confusion",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
        |t AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr FROM sc),
        |cm AS (SELECT
        |    CAST(sum(CASE WHEN cents >= thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN cents >= thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN cents < thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN cents < thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM sc CROSS JOIN t)
        |SELECT tp, fp, tn, fn,
        |  (tp * 1000) // (tp + fp) AS precision_permille,
        |  (tp * 1000) // (tp + fn) AS recall_permille,
        |  (2 * tp * 1000) // (2 * tp + fp + fn) AS f1_permille
        |FROM cm""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val t = sc.agg(expr("sum(cents) DIV count(*)").cast("long").as("thr"))
      sc.crossJoin(broadcast(t))
        .agg(
          sum(when(col("cents") >= col("thr") && col("y") === 1, 1L).otherwise(0L)).as("tp"),
          sum(when(col("cents") >= col("thr") && col("y") === 0, 1L).otherwise(0L)).as("fp"),
          sum(when(col("cents") < col("thr") && col("y") === 0, 1L).otherwise(0L)).as("tn"),
          sum(when(col("cents") < col("thr") && col("y") === 1, 1L).otherwise(0L)).as("fn"))
        .select(col("tp"), col("fp"), col("tn"), col("fn"),
          expr("(tp * 1000) DIV (tp + fp)").as("precision_permille"),
          expr("(tp * 1000) DIV (tp + fn)").as("recall_permille"),
          expr("(2 * tp * 1000) DIV (2 * tp + fp + fn)").as("f1_permille"))
    },

    // L84 — cumulative gains by decile (the lift chart): deciles cut by
    // NINE exact percentile_disc boundaries on the DESC-sorted score —
    // a value-deterministic assignment (ties stay in the upper decile),
    // NOT an ntile global window, so the fact is touched by one scan +
    // one 10-group aggregate and nothing funnels through a single task.
    // Cumulative share via a 10×10 self-join on the decile frame (no
    // global window, lint-clean). The "top 20% of scored customers
    // hold X% of the positives" targeting readout.
    Q(
      "ml10_gain",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
        |thr AS (SELECT
        |    percentile_disc(0.1) WITHIN GROUP (ORDER BY cents DESC) AS t1,
        |    percentile_disc(0.2) WITHIN GROUP (ORDER BY cents DESC) AS t2,
        |    percentile_disc(0.3) WITHIN GROUP (ORDER BY cents DESC) AS t3,
        |    percentile_disc(0.4) WITHIN GROUP (ORDER BY cents DESC) AS t4,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY cents DESC) AS t5,
        |    percentile_disc(0.6) WITHIN GROUP (ORDER BY cents DESC) AS t6,
        |    percentile_disc(0.7) WITHIN GROUP (ORDER BY cents DESC) AS t7,
        |    percentile_disc(0.8) WITHIN GROUP (ORDER BY cents DESC) AS t8,
        |    percentile_disc(0.9) WITHIN GROUP (ORDER BY cents DESC) AS t9
        |  FROM sc),
        |tagged AS (SELECT y,
        |    1 + (CASE WHEN cents < t1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN cents < t2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN cents < t3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN cents < t4 THEN 1 ELSE 0 END)
        |      + (CASE WHEN cents < t5 THEN 1 ELSE 0 END)
        |      + (CASE WHEN cents < t6 THEN 1 ELSE 0 END)
        |      + (CASE WHEN cents < t7 THEN 1 ELSE 0 END)
        |      + (CASE WHEN cents < t8 THEN 1 ELSE 0 END)
        |      + (CASE WHEN cents < t9 THEN 1 ELSE 0 END) AS dc
        |  FROM sc CROSS JOIN thr),
        |g AS (SELECT CAST(dc AS BIGINT) AS decile, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS pos FROM tagged GROUP BY 1),
        |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS tp FROM g)
        |SELECT a.decile, a.n, a.pos,
        |  (CAST(sum(b.pos) AS BIGINT) * 1000) // max(tot.tp) AS cum_gain_permille
        |FROM g a JOIN g b ON b.decile <= a.decile CROSS JOIN tot
        |GROUP BY a.decile, a.n, a.pos
        |ORDER BY a.decile""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        .localCheckpoint(true) // threshold agg + tagging pass both consume it
      val thr = sc.agg(
        (1 to 9).map(k => expr(
          s"percentile_disc(0.$k) WITHIN GROUP (ORDER BY cents DESC)").as(s"t$k")).head,
        (2 to 9).map(k => expr(
          s"percentile_disc(0.$k) WITHIN GROUP (ORDER BY cents DESC)").as(s"t$k")): _*)
      val dc = (1 to 9).map(k =>
        when(col("cents") < col(s"t$k"), 1).otherwise(0)).reduce(_ + _) + 1
      val g = sc.crossJoin(broadcast(thr))
        .select(col("y"), dc.cast("long").as("decile"))
        .groupBy("decile")
        .agg(count(lit(1)).as("n"), sum("y").as("pos"))
        .localCheckpoint(true) // self-join + total both consume the 10-row frame
      val tot = g.agg(sum("pos").as("tp"))
      g.as("a").join(g.as("b"), col("b.decile") <= col("a.decile"))
        .crossJoin(broadcast(tot))
        .groupBy(col("a.decile").as("decile"), col("a.n").as("n"),
          col("a.pos").as("pos"))
        .agg(expr("(sum(b.pos) * 1000) DIV max(tp)").as("cum_gain_permille"))
        .orderBy("decile")
    },

    // L86 — Brier score + skill: the PROPER-scoring sibling of ml6's
    // calibration bins. Score p = cents / max-cents, so the per-row
    // term (p − y)² = (cents − y·maxc)² / maxc² has an EXACT integer
    // numerator; per-group Brier is one decimal(38,0)/HUGEINT sum
    // (numerators reach ~3e15 each — a long sum overflows within
    // thousands of rows) over a single scan with the 1-row max
    // broadcast, and brier / the climatology reference / the skill
    // score are a fixed double tree over exact integers (ml8's
    // cast-to-double discipline). BSS = 1 − BS/BS_ref with BS_ref =
    // base·(1−base); a one-class group has BS_ref = 0 → NULL skill on
    // both engines (ml5's NULL-AUC precedent).
    Q(
      "ml11_brier",
      """WITH sc AS (SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
        |mx AS (SELECT max(cents) AS maxc FROM sc),
        |g AS (SELECT grp, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS n_pos,
        |    sum((CAST(cents AS HUGEINT) - CAST(y AS HUGEINT)*maxc)
        |        * (CAST(cents AS HUGEINT) - CAST(y AS HUGEINT)*maxc)) AS num,
        |    max(maxc) AS maxc
        |  FROM sc CROSS JOIN mx GROUP BY grp)
        |SELECT grp, n, n_pos,
        |  CAST(num AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT)*maxc*maxc AS DOUBLE) AS brier,
        |  CASE WHEN n_pos = 0 OR n_pos = n THEN NULL
        |       ELSE 1 - (CAST(num AS DOUBLE)
        |                 / CAST(CAST(n AS HUGEINT)*maxc*maxc AS DOUBLE))
        |               / (CAST(CAST(n_pos AS HUGEINT)*(n-n_pos) AS DOUBLE)
        |                  / CAST(CAST(n AS HUGEINT)*n AS DOUBLE)) END AS skill
        |FROM g ORDER BY grp""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val sc = Tables.orders(s, d).select(
        col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val mx = sc.agg(max("cents").as("maxc"))
      val g = sc.crossJoin(broadcast(mx))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
          sum((dec(col("cents")) - dec(col("y")) * col("maxc"))
            * (dec(col("cents")) - dec(col("y")) * col("maxc"))).as("num"),
          max("maxc").as("maxc"))
      g.select(col("grp"), col("n"), col("n_pos"),
          (col("num").cast("double")
            / (dec(col("n")) * col("maxc") * col("maxc")).cast("double"))
            .as("brier"),
          when(col("n_pos") === 0 || col("n_pos") === col("n"), lit(null))
            .otherwise(lit(1) - (col("num").cast("double")
                / (dec(col("n")) * col("maxc") * col("maxc")).cast("double"))
              / ((dec(col("n_pos")) * (col("n") - col("n_pos"))).cast("double")
                / (dec(col("n")) * col("n")).cast("double")))
            .as("skill"))
        .orderBy("grp")
    },

    // L87 — average precision (the area under the step-interpolated PR
    // curve): AP = mean over positives of precision-at-their-rank,
    // ml5's threshold-free discipline carried to the precision axis
    // (AUC is insensitive to class skew; AP is the skew-honest twin).
    // Rank = row_number on (cents DESC, orderkey) — fully deterministic;
    // each P(k) = cumpos/k is floor-quantized to a 1e6-unit BIGINT by
    // pure integer DIV (no float boundary anywhere), so the per-group
    // sum is exact and ap is ONE double division. Windows partition by
    // the group key exactly as ml5's rank does.
    Q(
      "ml12_avg_precision",
      """WITH sc AS (SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents, o_orderkey,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
        |rk AS (SELECT grp, y,
        |    row_number() OVER (PARTITION BY grp ORDER BY cents DESC, o_orderkey)
        |      AS k,
        |    sum(y) OVER (PARTITION BY grp ORDER BY cents DESC, o_orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumpos
        |  FROM sc)
        |SELECT grp, CAST(sum(y) AS BIGINT) AS n_pos,
        |  CAST(sum(CASE WHEN y = 1
        |        THEN (1000000 * cumpos) // k ELSE 0 END) AS BIGINT) AS ap_e6_sum,
        |  CAST(sum(CASE WHEN y = 1
        |        THEN (1000000 * cumpos) // k ELSE 0 END) AS DOUBLE)
        |    / (CAST(sum(y) AS DOUBLE) * 1000000) AS ap
        |FROM rk GROUP BY grp ORDER BY grp""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        col("o_orderkey"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val w = Window.partitionBy("grp").orderBy(col("cents").desc, col("o_orderkey"))
      val rk = sc.select(col("grp"), col("y"),
        row_number().over(w).cast("long").as("k"),
        sum("y").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cumpos"))
      rk.groupBy("grp")
        .agg(sum("y").as("n_pos"),
          sum(when(col("y") === 1, expr("(1000000 * cumpos) DIV k"))
            .otherwise(0L)).as("ap_e6_sum"))
        .select(col("grp"), col("n_pos"), col("ap_e6_sum"),
          (col("ap_e6_sum").cast("double")
            / (col("n_pos").cast("double") * 1000000)).as("ap"))
        .orderBy("grp")
    },

    // L88 — item-item cosine from behavioral co-occurrence (the
    // neighborhood-model recommender primitive; ev15 counts same-context
    // pairs, this normalizes them into a similarity): items = event
    // types, users = the incidence dimension, sim(a,b) =
    // |U_a ∩ U_b| / √(|U_a|·|U_b|) over DISTINCT (user, type). The
    // pair join fans out per user by (types-per-user)² — bounded by the
    // type vocabulary, never the event count — and the √ is IEEE
    // correctly-rounded on both engines so even the raw double is
    // hash-exact (the e6 quantization is belt and braces).
    Q(
      "ml13_item_cosine",
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |sz AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nu
        |       FROM ut GROUP BY 1),
        |co AS (SELECT a.event_type AS t1, b.event_type AS t2,
        |         CAST(count(*) AS BIGINT) AS cou
        |       FROM ut a JOIN ut b ON a.user_id = b.user_id
        |         AND a.event_type < b.event_type
        |       GROUP BY 1, 2)
        |SELECT t1, t2, cou, s1.nu AS n1, s2.nu AS n2,
        |  CAST(round(1000000 * CAST(cou AS DOUBLE)
        |       / sqrt(CAST(s1.nu AS DOUBLE) * CAST(s2.nu AS DOUBLE)))
        |    AS BIGINT) AS cosine_e6
        |FROM co JOIN sz s1 ON co.t1 = s1.event_type
        |        JOIN sz s2 ON co.t2 = s2.event_type
        |ORDER BY t1, t2""".stripMargin
    ) { (s, d) =>
      val ut = Tables.events(s, d).select("user_id", "event_type").distinct()
        .localCheckpoint(true) // sizes + both self-join sides consume it
      val sz = ut.groupBy("event_type").agg(count(lit(1)).as("nu"))
      val co = ut.as("a")
        .join(ut.as("b"), col("a.user_id") === col("b.user_id")
          && col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("t1"), col("b.event_type").as("t2"))
        .agg(count(lit(1)).as("cou"))
      co.join(broadcast(sz.select(col("event_type").as("t1"), col("nu").as("n1"))), Seq("t1"))
        .join(broadcast(sz.select(col("event_type").as("t2"), col("nu").as("n2"))), Seq("t2"))
        .select(col("t1"), col("t2"), col("cou"), col("n1"), col("n2"),
          round(lit(1000000) * col("cou").cast("double")
            / sqrt(col("n1").cast("double") * col("n2").cast("double")))
            .cast("long").as("cosine_e6"))
        .orderBy("t1", "t2")
    },

    // L90 — Cohen's kappa (chance-corrected agreement): ml9's confusion
    // cells re-read as rater-vs-truth agreement — accuracy looks good
    // on skewed labels by accident, kappa subtracts what agreement
    // chance alone would produce. Fully EXACT rational algebra: kappa =
    // (n·(tp+tn) − (p̂₁·p₁ + n̂₀·n₀)) / (n² − (p̂₁·p₁ + n̂₀·n₀)) where
    // the marginal products ride HUGEINT/decimal(38,0) (n² passes 2^63
    // within real warehouse row counts); the displayed kappa is ONE
    // double division of the two exact integers. Same single
    // map-side-combinable pass as ml9 with the mean threshold broadcast.
    Q(
      "ml14_kappa",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
        |t AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr FROM sc),
        |cm AS (SELECT
        |    CAST(sum(CASE WHEN cents >= thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN cents >= thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN cents < thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN cents < thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM sc CROSS JOIN t),
        |k AS (SELECT tp, fp, tn, fn, tp + fp + tn + fn AS n,
        |        CAST(tp + fp AS HUGEINT) * (tp + fn)
        |          + CAST(tn + fn AS HUGEINT) * (tn + fp) AS chance
        |      FROM cm)
        |SELECT tp, fp, tn, fn,
        |  CAST(CAST(n AS HUGEINT) * (tp + tn) - chance AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * n - chance AS DOUBLE) AS kappa
        |FROM k""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val t = sc.agg(expr("sum(cents) DIV count(*)").cast("long").as("thr"))
      val cm = sc.crossJoin(broadcast(t))
        .agg(
          sum(when(col("cents") >= col("thr") && col("y") === 1, 1L).otherwise(0L)).as("tp"),
          sum(when(col("cents") >= col("thr") && col("y") === 0, 1L).otherwise(0L)).as("fp"),
          sum(when(col("cents") < col("thr") && col("y") === 0, 1L).otherwise(0L)).as("tn"),
          sum(when(col("cents") < col("thr") && col("y") === 1, 1L).otherwise(0L)).as("fn"))
      val k = cm
        .withColumn("n", col("tp") + col("fp") + col("tn") + col("fn"))
        .withColumn("chance",
          dec(col("tp") + col("fp")) * (col("tp") + col("fn"))
            + dec(col("tn") + col("fn")) * (col("tn") + col("fp")))
      k.select(col("tp"), col("fp"), col("tn"), col("fn"),
        ((dec(col("n")) * (col("tp") + col("tn")) - col("chance")).cast("double")
          / (dec(col("n")) * col("n") - col("chance")).cast("double")).as("kappa"))
    },

    // L92 — histogram split finder (the GBDT/decision-tree inner loop,
    // XGBoost's "approximate greedy" in one SQL pass): feature binned
    // into 32 equal-width buckets by EXACT integer arithmetic (shifted
    // numerator is non-negative, so DIV floors identically on both
    // engines), one aggregate to the 32-cell frame, cumulative
    // left-child counts via a window over the CELL frame (bounded by
    // the bin count, never the fact), and each candidate split's
    // weighted Gini from the closed form n_L − (pos_L²+neg_L²)/n_L
    // (+ right twin), all over n. Squares ride decimal(38,0)/HUGEINT —
    // n² passes 2^63 at warehouse counts (ml14's discipline) — and the
    // gini double comes from ONE identical expression tree of exact
    // integers, micro-quantized to e6 for the artifact. The argmin is
    // the consumer's one ORDER BY over ≤31 rows.
    Q(
      "ml15_best_split",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM sc),
        |binned AS (SELECT ((cents - mn) * 32) // (mx - mn + 1) AS bin, y
        |           FROM sc CROSS JOIN b),
        |cells AS (SELECT bin, count(*) AS n_b,
        |            CAST(sum(y) AS BIGINT) AS pos_b
        |          FROM binned GROUP BY 1),
        |cum AS (SELECT bin,
        |          sum(n_b) OVER (ORDER BY bin
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
        |          sum(pos_b) OVER (ORDER BY bin
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS posl,
        |          sum(n_b) OVER () AS n, sum(pos_b) OVER () AS pos
        |        FROM cells),
        |cand AS (SELECT bin, nl, posl, n - nl AS nr, pos - posl AS posr, n
        |         FROM cum WHERE nl > 0 AND n - nl > 0)
        |SELECT CAST(bin AS BIGINT) AS split_bin, CAST(nl AS BIGINT) AS nl,
        |  CAST(posl AS BIGINT) AS posl, CAST(nr AS BIGINT) AS nr,
        |  CAST(posr AS BIGINT) AS posr,
        |  CAST(round(1000000 * (
        |    CAST(CAST(nl AS HUGEINT)*nl - CAST(posl AS HUGEINT)*posl
        |         - CAST(nl-posl AS HUGEINT)*(nl-posl) AS DOUBLE) / nl
        |    + CAST(CAST(nr AS HUGEINT)*nr - CAST(posr AS HUGEINT)*posr
        |         - CAST(nr-posr AS HUGEINT)*(nr-posr) AS DOUBLE) / nr) / n)
        |    AS BIGINT) AS gini_e6
        |FROM cand ORDER BY split_bin""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val b = sc.agg(min("cents").as("mn"), max("cents").as("mx"))
      val cells = sc.crossJoin(broadcast(b))
        .select(expr("((cents - mn) * 32) DIV (mx - mn + 1)").as("bin"), col("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum("y").as("pos_b"))
      // the window runs over the 32-row CELL frame — bounded by the bin
      // count at any SF, so the unpartitioned frame is the right plan
      val wc = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wt = Window.partitionBy()
      val cum = cells.select(col("bin"),
        sum("n_b").over(wc).as("nl"), sum("pos_b").over(wc).as("posl"),
        sum("n_b").over(wt).as("n"), sum("pos_b").over(wt).as("pos"))
      val cand = cum
        .select(col("bin"), col("nl"), col("posl"),
          (col("n") - col("nl")).as("nr"), (col("pos") - col("posl")).as("posr"),
          col("n"))
        .filter(col("nl") > 0 && col("nr") > 0)
      cand.select(col("bin").as("split_bin"), col("nl"), col("posl"),
          col("nr"), col("posr"),
          round(lit(1000000) * (
            (dec(col("nl")) * col("nl") - dec(col("posl")) * col("posl")
              - dec(col("nl") - col("posl")) * (col("nl") - col("posl")))
              .cast("double") / col("nl")
            + (dec(col("nr")) * col("nr") - dec(col("posr")) * col("posr")
              - dec(col("nr") - col("posr")) * (col("nr") - col("posr")))
              .cast("double") / col("nr")) / col("n"))
            .cast("long").as("gini_e6"))
        .orderBy("split_bin")
    },

    // L93 — multinomial naive-Bayes training (count-based, the one ML
    // trainer that IS a SQL aggregate): class = document language,
    // features = tx1's token alphabet. One (lang, token) aggregate over
    // the corpus (the corpus is touched once; every later frame is
    // vocabulary-sized), Laplace-smoothed log-likelihoods ln((ct+1)/
    // (T_lang+V)) micro-quantized ONCE to e6, class priors as exact
    // permille. Top-15 tokens per class under a total order keep the
    // output stable; the window partitions by lang over
    // vocabulary-sized partitions.
    Q(
      "ml16_naive_bayes",
      """WITH tok AS (
        |  SELECT lang, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS token
        |  FROM documents),
        |ct AS (SELECT lang, token, count(*) AS ct FROM tok GROUP BY 1, 2),
        |tot AS (SELECT lang, CAST(sum(ct) AS BIGINT) AS t FROM ct GROUP BY 1),
        |v AS (SELECT count(DISTINCT token) AS v FROM ct),
        |pri AS (SELECT lang, count(*) AS nd FROM documents GROUP BY 1),
        |ptot AS (SELECT CAST(sum(nd) AS BIGINT) AS ndall FROM pri),
        |scored AS (
        |  SELECT ct.lang, ct.token, CAST(ct.ct AS BIGINT) AS ct,
        |    CAST(round(1000000 * ln(CAST(ct.ct + 1 AS DOUBLE) / (t + v)))
        |      AS BIGINT) AS logp_e6,
        |    row_number() OVER (PARTITION BY ct.lang
        |      ORDER BY ct.ct DESC, ct.token) AS rnk
        |  FROM ct JOIN tot ON ct.lang = tot.lang CROSS JOIN v)
        |SELECT s.lang, s.token, s.ct, s.logp_e6, CAST(s.rnk AS BIGINT) AS rnk,
        |  (pri.nd * 1000) // ptot.ndall AS prior_permille
        |FROM scored s JOIN pri ON s.lang = pri.lang CROSS JOIN ptot
        |WHERE s.rnk <= 15 ORDER BY s.lang, s.rnk""".stripMargin
    ) { (s, d) =>
      val docs = Tables.documents(s, d)
      val tok = docs.select(col("lang"),
        explode(expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).as("token"))
      val ct = tok.groupBy("lang", "token").agg(count(lit(1)).as("ct"))
        .localCheckpoint(true) // totals, vocab, and the scored frame all read it
      val tot = ct.groupBy("lang").agg(sum("ct").as("t"))
      val v = ct.agg(countDistinct("token").as("v"))
      val pri = docs.groupBy("lang").agg(count(lit(1)).as("nd"))
      val ptot = pri.agg(sum("nd").as("ndall"))
      val scored = ct
        .join(tot, "lang").crossJoin(broadcast(v))
        .select(col("lang"), col("token"), col("ct"),
          round(lit(1000000) * log((col("ct") + 1).cast("double")
            / (col("t") + col("v")))).cast("long").as("logp_e6"),
          row_number().over(Window.partitionBy("lang")
            .orderBy(col("ct").desc, col("token"))).cast("long").as("rnk"))
      scored.filter(col("rnk") <= 15)
        .join(pri, "lang").crossJoin(broadcast(ptot))
        .select(col("lang"), col("token"), col("ct"), col("logp_e6"), col("rnk"),
          expr("(nd * 1000) DIV ndall").as("prior_permille"))
        .orderBy("lang", "rnk")
    },

    // L95 — k-means (Lloyd), 3 EXACT unrolled rounds: the canonical
    // clustering trainer, made fully oracle-checkable by keeping every
    // quantity integral — centroids ride 1e6-scaled BIGINTs, squared
    // distances are decimal(38,0)/HUGEINT products of exact integer
    // deltas (identical on both engines), the argmin's tie order is
    // (distance, cid), and each update is (1e6·Σ) DIV n floor division.
    // Deterministic init = the k lowest-id points. Spark assigns via a
    // map-side-combinable min(struct) per (pid,x,y) group — NO window
    // over the fact — with the k-row centroid frame BROADCAST; the fact
    // is scanned once per round (Lloyd's floor). Empty clusters keep
    // their previous centroid (left-join coalesce on both engines). The
    // oracle unrolls the identical 3 rounds as generated CTEs (gr2's
    // recipe).
    Q(
      "ml17_kmeans", {
        val rounds = (1 to 3).map { i =>
          s"""a$i AS (
             |  SELECT pid, x, y, cid FROM (
             |    SELECT p.pid, p.x, p.y, c.cid,
             |      row_number() OVER (PARTITION BY p.pid ORDER BY
             |        CAST(1000000*p.x - c.cx_e6 AS HUGEINT)*(1000000*p.x - c.cx_e6)
             |        + CAST(1000000*p.y - c.cy_e6 AS HUGEINT)*(1000000*p.y - c.cy_e6),
             |        c.cid) AS rn
             |    FROM pts p CROSS JOIN c${i - 1} c) z WHERE rn = 1),
             |u$i AS (
             |  SELECT cid, count(*) AS n,
             |    CAST((CAST(1000000 AS HUGEINT) * sum(x)) // count(*) AS BIGINT) AS ux,
             |    CAST((CAST(1000000 AS HUGEINT) * sum(y)) // count(*) AS BIGINT) AS uy
             |  FROM a$i GROUP BY 1),
             |c$i AS (
             |  SELECT c.cid, coalesce(u.ux, c.cx_e6) AS cx_e6,
             |    coalesce(u.uy, c.cy_e6) AS cy_e6
             |  FROM c${i - 1} c LEFT JOIN u$i u ON u.cid = c.cid)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH pts AS (SELECT p_partkey AS pid, CAST(p_size AS BIGINT) AS x,
           |    CAST(round(p_retailprice*100) AS BIGINT) AS y FROM part),
           |c0 AS (SELECT row_number() OVER (ORDER BY pid) AS cid,
           |         1000000*x AS cx_e6, 1000000*y AS cy_e6
           |       FROM (SELECT * FROM pts ORDER BY pid LIMIT 4)),
           |$rounds
           |SELECT c3.cid, coalesce(u3.n, 0) AS n, c3.cx_e6, c3.cy_e6
           |FROM c3 LEFT JOIN u3 ON u3.cid = c3.cid ORDER BY c3.cid""".stripMargin
      }
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val pts = Tables.part(s, d).select(col("p_partkey").as("pid"),
          col("p_size").cast("long").as("x"),
          round(col("p_retailprice") * 100).cast("long").as("y"))
        .localCheckpoint(true) // scanned once per round
      var c = pts.orderBy("pid").limit(4)
        .select(row_number().over(Window.orderBy("pid")).cast("long").as("cid"),
          (col("x") * 1000000).as("cx_e6"), (col("y") * 1000000).as("cy_e6"))
      var u: DataFrame = null
      for (_ <- 1 to 3) {
        val dx = col("x") * 1000000 - col("cx_e6")
        val dy = col("y") * 1000000 - col("cy_e6")
        val a = pts.crossJoin(broadcast(c))
          .select(col("pid"), col("x"), col("y"), col("cid"),
            (dec(dx) * dx + dec(dy) * dy).as("dist"))
          .groupBy("pid", "x", "y")
          .agg(min(struct(col("dist"), col("cid"))).as("m"))
          .select(col("pid"), col("x"), col("y"), col("m.cid").as("cid"))
        u = a.groupBy("cid")
          .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"))
          .select(col("cid"), col("n"),
            expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sx) DIV n AS BIGINT)")
              .as("ux"),
            expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * sy) DIV n AS BIGINT)")
              .as("uy"))
        c = graft.plans.Lineage.truncate(
          c.join(u, Seq("cid"), "left")
            .select(col("cid"), coalesce(col("ux"), col("cx_e6")).as("cx_e6"),
              coalesce(col("uy"), col("cy_e6")).as("cy_e6")))
      }
      c.join(u.select(col("cid"), col("n")), Seq("cid"), "left")
        .select(col("cid"), coalesce(col("n"), lit(0L)).as("n"),
          col("cx_e6"), col("cy_e6"))
        .orderBy("cid")
    },

    // L96 — macro-F1 multiclass evaluation: per-class precision/recall
    // collapse into F1 = 2tp/(2tp+fp+fn), which is PURE integer
    // rational — f1_e6 = (2e6·tp) DIV (2tp+fp+fn) needs no float at
    // all, and the macro average is one more integer DIV. Classes are
    // the 5 order priorities; the "prediction" is the equal-width price
    // bucket (ml15's scan-local shifted-integer binning — no global
    // rank window over the fact). One conditional aggregate builds the
    // whole confusion; per-class cells come off the 25-cell frame.
    Q(
      "ml18_macro_f1",
      """WITH sc AS (SELECT
        |    CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS actual,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM sc),
        |p AS (SELECT actual, ((cents - mn) * 5) // (mx - mn + 1) + 1 AS pred
        |      FROM sc CROSS JOIN b),
        |cm AS (SELECT actual, pred, count(*) AS n FROM p GROUP BY 1, 2),
        |cls AS (SELECT k.k AS class,
        |    coalesce((SELECT sum(n) FROM cm WHERE actual = k.k AND pred = k.k), 0)
        |      AS tp,
        |    coalesce((SELECT sum(n) FROM cm WHERE pred = k.k AND actual <> k.k), 0)
        |      AS fp,
        |    coalesce((SELECT sum(n) FROM cm WHERE actual = k.k AND pred <> k.k), 0)
        |      AS fn
        |  FROM (SELECT DISTINCT actual AS k FROM sc) k),
        |f AS (SELECT class, tp, fp, fn,
        |        CASE WHEN 2*tp + fp + fn = 0 THEN 0
        |             ELSE (2000000 * tp) // (2*tp + fp + fn) END AS f1_e6
        |      FROM cls)
        |SELECT class, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
        |  CAST(fn AS BIGINT) AS fn, CAST(f1_e6 AS BIGINT) AS f1_e6,
        |  CAST((SELECT sum(f1_e6) // count(*) FROM f) AS BIGINT) AS macro_f1_e6
        |FROM f ORDER BY class""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        substring(col("o_orderpriority"), 1, 1).cast("long").as("actual"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      val b = sc.agg(min("cents").as("mn"), max("cents").as("mx"))
      val p = sc.crossJoin(broadcast(b))
        .select(col("actual"),
          (expr("((cents - mn) * 5) DIV (mx - mn + 1)") + 1).as("pred"))
      val cm = p.groupBy("actual", "pred").agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // read per class role
      val ks = sc.select(col("actual").as("class")).distinct()
      val tp = cm.filter(col("actual") === col("pred"))
        .select(col("actual").as("class"), col("n").as("tp"))
      val fp = cm.filter(col("actual") =!= col("pred"))
        .groupBy(col("pred").as("class")).agg(sum("n").as("fp"))
      val fn = cm.filter(col("actual") =!= col("pred"))
        .groupBy(col("actual").as("class")).agg(sum("n").as("fn"))
      val cls = ks.join(tp, Seq("class"), "left")
        .join(fp, Seq("class"), "left").join(fn, Seq("class"), "left")
        .select(col("class"), coalesce(col("tp"), lit(0L)).as("tp"),
          coalesce(col("fp"), lit(0L)).as("fp"),
          coalesce(col("fn"), lit(0L)).as("fn"))
      val f = cls.withColumn("f1_e6",
        when(lit(2) * col("tp") + col("fp") + col("fn") === 0, lit(0L))
          .otherwise(expr("(2000000 * tp) DIV (2*tp + fp + fn)")))
      val macroF = f.agg(expr("sum(f1_e6) DIV count(*)").as("macro_f1_e6"))
      f.crossJoin(broadcast(macroF))
        .select(col("class"), col("tp"), col("fp"), col("fn"), col("f1_e6"),
          col("macro_f1_e6"))
        .orderBy("class")
    },

    // L99 — three-feature OLS via Cramer on the CENTERED normal
    // equations (ml8's 2-feature closed form, one rank up): the scatter
    // matrix S_ij = n·Σxᵢxⱼ − Σxᵢ·Σxⱼ and vector b_i = n·Σxᵢy − Σxᵢ·Σy
    // are EXACT BIGINTs from one map-side-combinable pass (bounded
    // feature domains keep n·Σxᵢxⱼ under 2^63 at sf scales; at
    // warehouse n the same pass rides decimal(38,0)). The 3×3
    // determinants exceed any integer width, so they are evaluated in
    // DOUBLE over the exact integers — the SAME cofactor expression
    // tree on both engines is bit-identical IEEE arithmetic (sim1/q60
    // precedent). Betas are det ratios; the intercept closes the means.
    Q(
      "ml19_ols3",
      """WITH t AS (
        |  SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
        |    CAST(round(l_discount*1000) AS BIGINT) AS x2,
        |    CAST(round(l_tax*1000) AS BIGINT) AS x3,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS y
        |  FROM lineitem),
        |m AS (SELECT count(*) AS n,
        |    sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3, sum(y) AS sy,
        |    sum(x1*x1) AS s11, sum(x1*x2) AS s12, sum(x1*x3) AS s13,
        |    sum(x2*x2) AS s22, sum(x2*x3) AS s23, sum(x3*x3) AS s33,
        |    sum(x1*y) AS s1y, sum(x2*y) AS s2y, sum(x3*y) AS s3y
        |  FROM t),
        |c AS (SELECT n,
        |    CAST(n*s11 - s1*s1 AS DOUBLE) AS a11,
        |    CAST(n*s12 - s1*s2 AS DOUBLE) AS a12,
        |    CAST(n*s13 - s1*s3 AS DOUBLE) AS a13,
        |    CAST(n*s22 - s2*s2 AS DOUBLE) AS a22,
        |    CAST(n*s23 - s2*s3 AS DOUBLE) AS a23,
        |    CAST(n*s33 - s3*s3 AS DOUBLE) AS a33,
        |    CAST(n*s1y - s1*sy AS DOUBLE) AS b1,
        |    CAST(n*s2y - s2*sy AS DOUBLE) AS b2,
        |    CAST(n*s3y - s3*sy AS DOUBLE) AS b3,
        |    CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
        |    CAST(s3 AS DOUBLE) AS d3, CAST(sy AS DOUBLE) AS dy
        |  FROM m),
        |dets AS (SELECT n, d1, d2, d3, dy,
        |    a11*(a22*a33 - a23*a23) - a12*(a12*a33 - a23*a13)
        |      + a13*(a12*a23 - a22*a13) AS det,
        |    b1*(a22*a33 - a23*a23) - a12*(b2*a33 - a23*b3)
        |      + a13*(b2*a23 - a22*b3) AS det1,
        |    a11*(b2*a33 - b3*a23) - b1*(a12*a33 - a23*a13)
        |      + a13*(a12*b3 - b2*a13) AS det2,
        |    a11*(a22*b3 - a23*b2) - a12*(a12*b3 - b2*a13)
        |      + b1*(a12*a23 - a22*a13) AS det3
        |  FROM c)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(round(1000000 * det1/det) AS BIGINT) AS beta_qty_e6,
        |  CAST(round(1000000 * det2/det) AS BIGINT) AS beta_disc_e6,
        |  CAST(round(1000000 * det3/det) AS BIGINT) AS beta_tax_e6,
        |  CAST(round((dy - (det1/det)*d1 - (det2/det)*d2 - (det3/det)*d3) / n)
        |    AS BIGINT) AS intercept_cents
        |FROM dets""".stripMargin
    ) { (s, d) =>
      val t = Tables.lineitem(s, d).select(
        round(col("l_quantity")).cast("long").as("x1"),
        round(col("l_discount") * 1000).cast("long").as("x2"),
        round(col("l_tax") * 1000).cast("long").as("x3"),
        round(col("l_extendedprice") * 100).cast("long").as("y"))
      val m = t.agg(count(lit(1)).as("n"),
        sum("x1").as("s1"), sum("x2").as("s2"), sum("x3").as("s3"),
        sum("y").as("sy"),
        sum(col("x1") * col("x1")).as("s11"), sum(col("x1") * col("x2")).as("s12"),
        sum(col("x1") * col("x3")).as("s13"), sum(col("x2") * col("x2")).as("s22"),
        sum(col("x2") * col("x3")).as("s23"), sum(col("x3") * col("x3")).as("s33"),
        sum(col("x1") * col("y")).as("s1y"), sum(col("x2") * col("y")).as("s2y"),
        sum(col("x3") * col("y")).as("s3y"))
      val dec = (x: org.apache.spark.sql.Column) => x.cast("decimal(38,0)")
      // the b_i products pass 2^63 already at sf0.1 (Σxᵢ·Σy ~ 1e22) —
      // every product rides decimal(38,0) before the one double cast
      val c = m.select(col("n"),
        (dec(col("n")) * col("s11") - dec(col("s1")) * col("s1")).cast("double").as("a11"),
        (dec(col("n")) * col("s12") - dec(col("s1")) * col("s2")).cast("double").as("a12"),
        (dec(col("n")) * col("s13") - dec(col("s1")) * col("s3")).cast("double").as("a13"),
        (dec(col("n")) * col("s22") - dec(col("s2")) * col("s2")).cast("double").as("a22"),
        (dec(col("n")) * col("s23") - dec(col("s2")) * col("s3")).cast("double").as("a23"),
        (dec(col("n")) * col("s33") - dec(col("s3")) * col("s3")).cast("double").as("a33"),
        (dec(col("n")) * col("s1y") - dec(col("s1")) * col("sy")).cast("double").as("b1"),
        (dec(col("n")) * col("s2y") - dec(col("s2")) * col("sy")).cast("double").as("b2"),
        (dec(col("n")) * col("s3y") - dec(col("s3")) * col("sy")).cast("double").as("b3"),
        col("s1").cast("double").as("d1"), col("s2").cast("double").as("d2"),
        col("s3").cast("double").as("d3"), col("sy").cast("double").as("dy"))
      val dets = c.select(col("n"), col("d1"), col("d2"), col("d3"), col("dy"),
        (col("a11") * (col("a22") * col("a33") - col("a23") * col("a23"))
          - col("a12") * (col("a12") * col("a33") - col("a23") * col("a13"))
          + col("a13") * (col("a12") * col("a23") - col("a22") * col("a13")))
          .as("det"),
        (col("b1") * (col("a22") * col("a33") - col("a23") * col("a23"))
          - col("a12") * (col("b2") * col("a33") - col("a23") * col("b3"))
          + col("a13") * (col("b2") * col("a23") - col("a22") * col("b3")))
          .as("det1"),
        (col("a11") * (col("b2") * col("a33") - col("b3") * col("a23"))
          - col("b1") * (col("a12") * col("a33") - col("a23") * col("a13"))
          + col("a13") * (col("a12") * col("b3") - col("b2") * col("a13")))
          .as("det2"),
        (col("a11") * (col("a22") * col("b3") - col("a23") * col("b2"))
          - col("a12") * (col("a12") * col("b3") - col("b2") * col("a13"))
          + col("b1") * (col("a12") * col("a23") - col("a22") * col("a13")))
          .as("det3"))
      dets.select(col("n"),
        round(lit(1000000) * col("det1") / col("det")).cast("long").as("beta_qty_e6"),
        round(lit(1000000) * col("det2") / col("det")).cast("long").as("beta_disc_e6"),
        round(lit(1000000) * col("det3") / col("det")).cast("long").as("beta_tax_e6"),
        round((col("dy") - (col("det1") / col("det")) * col("d1")
          - (col("det2") / col("det")) * col("d2")
          - (col("det3") / col("det")) * col("d3")) / col("n"))
          .cast("long").as("intercept_cents"))
    },

    // L100 — per-feature split-gain importance (the feature-ranking
    // readout GBDT trainers print): ml15's histogram split finder run
    // per candidate feature, each reporting its parent Gini, its best
    // achievable weighted Gini, and the gain — the ranking says which
    // feature a first tree would split on. One scan per feature (a real
    // trainer fuses them; three scans keeps each plan ml15-identical),
    // every number the same exact integer algebra as ml15, argmin under
    // a total order (gini, bin) made explicit per feature.
    Q(
      "ml20_feature_importance", {
        val feats = Seq(
          ("cents", "CAST(round(o_totalprice*100) AS BIGINT)"),
          ("dom", "CAST(day(CAST(o_orderdate AS DATE)) AS BIGINT)"),
          ("mon", "CAST(month(CAST(o_orderdate AS DATE)) AS BIGINT)"))
        val per = feats.map { case (nm, ex) =>
          s"""f_$nm AS (
             |  WITH sc AS (SELECT $ex AS f,
             |      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
             |    FROM orders),
             |  b AS (SELECT min(f) AS mn, max(f) AS mx FROM sc),
             |  cells AS (SELECT ((f - mn) * 16) // (mx - mn + 1) AS bin, count(*) AS n_b,
             |              CAST(sum(y) AS BIGINT) AS pos_b
             |            FROM sc CROSS JOIN b GROUP BY 1),
             |  cum AS (SELECT bin,
             |            sum(n_b) OVER (ORDER BY bin
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
             |            sum(pos_b) OVER (ORDER BY bin
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS posl,
             |            sum(n_b) OVER () AS n, sum(pos_b) OVER () AS pos
             |          FROM cells),
             |  cand AS (SELECT bin, nl, posl, n - nl AS nr, pos - posl AS posr, n, pos
             |           FROM cum WHERE nl > 0 AND n - nl > 0),
             |  scored AS (SELECT bin, n, pos,
             |      CAST(round(1000000 * (
             |        CAST(CAST(nl AS HUGEINT)*nl - CAST(posl AS HUGEINT)*posl
             |             - CAST(nl-posl AS HUGEINT)*(nl-posl) AS DOUBLE) / nl
             |        + CAST(CAST(nr AS HUGEINT)*nr - CAST(posr AS HUGEINT)*posr
             |             - CAST(nr-posr AS HUGEINT)*(nr-posr) AS DOUBLE) / nr) / n)
             |        AS BIGINT) AS gini_e6
             |    FROM cand)
             |  SELECT '$nm' AS feature,
             |    CAST(round(1000000 * CAST(CAST(n AS HUGEINT)*n
             |        - CAST(pos AS HUGEINT)*pos
             |        - CAST(n-pos AS HUGEINT)*(n-pos) AS DOUBLE) / n / n)
             |      AS BIGINT) AS gini0_e6,
             |    min(gini_e6) AS best_gini_e6,
             |    (SELECT min(bin) FROM scored s2
             |     WHERE s2.gini_e6 = (SELECT min(gini_e6) FROM scored))
             |      AS best_bin
             |  FROM scored GROUP BY n, pos)"""
            .stripMargin
        }.mkString(",\n")
        s"""WITH
           |$per
           |SELECT feature, CAST(best_bin AS BIGINT) AS best_bin, gini0_e6,
           |  best_gini_e6, gini0_e6 - best_gini_e6 AS gain_e6
           |FROM (SELECT * FROM f_cents UNION ALL SELECT * FROM f_dom
           |      UNION ALL SELECT * FROM f_mon)
           |ORDER BY feature""".stripMargin
      }
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      def oneFeature(nm: String, f: org.apache.spark.sql.Column): DataFrame = {
        val sc = Tables.orders(s, d).select(f.as("f"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        val b = sc.agg(min("f").as("mn"), max("f").as("mx"))
        val cells = sc.crossJoin(broadcast(b))
          .select(expr("((f - mn) * 16) DIV (mx - mn + 1)").as("bin"), col("y"))
          .groupBy("bin")
          .agg(count(lit(1)).as("n_b"), sum("y").as("pos_b"))
        val wc = Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cum = cells.select(col("bin"),
          sum("n_b").over(wc).as("nl"), sum("pos_b").over(wc).as("posl"),
          sum("n_b").over(Window.partitionBy()).as("n"),
          sum("pos_b").over(Window.partitionBy()).as("pos"))
        val cand = cum
          .select(col("bin"), col("nl"), col("posl"),
            (col("n") - col("nl")).as("nr"), (col("pos") - col("posl")).as("posr"),
            col("n"), col("pos"))
          .filter(col("nl") > 0 && col("nr") > 0)
        val scored = cand.select(col("bin"), col("n"), col("pos"),
          round(lit(1000000) * (
            (dec(col("nl")) * col("nl") - dec(col("posl")) * col("posl")
              - dec(col("nl") - col("posl")) * (col("nl") - col("posl")))
              .cast("double") / col("nl")
            + (dec(col("nr")) * col("nr") - dec(col("posr")) * col("posr")
              - dec(col("nr") - col("posr")) * (col("nr") - col("posr")))
              .cast("double") / col("nr")) / col("n"))
            .cast("long").as("gini_e6"))
        scored.groupBy("n", "pos")
          .agg(min("gini_e6").as("best_gini_e6"),
            min(struct(col("gini_e6"), col("bin"))).as("mb"))
          .select(lit(nm).as("feature"),
            round(lit(1000000) * (dec(col("n")) * col("n")
              - dec(col("pos")) * col("pos")
              - dec(col("n") - col("pos")) * (col("n") - col("pos")))
              .cast("double") / col("n") / col("n")).cast("long").as("gini0_e6"),
            col("best_gini_e6"), col("mb.bin").as("best_bin"))
      }
      oneFeature("cents", round(col("o_totalprice") * 100).cast("long"))
        .unionByName(oneFeature("dom",
          dayofmonth(col("o_orderdate").cast("date")).cast("long")))
        .unionByName(oneFeature("mon",
          month(col("o_orderdate").cast("date")).cast("long")))
        .select(col("feature"), col("best_bin").cast("long").as("best_bin"),
          col("gini0_e6"), col("best_gini_e6"),
          (col("gini0_e6") - col("best_gini_e6")).as("gain_e6"))
        .orderBy("feature")
    },

    // L101 — precision/recall curve at 19 score thresholds: ml12 gives
    // the area; THIS gives the plot (and the operating-point table a
    // deployment picks from). Thresholds are the equal-width bin
    // boundaries (ml15's scan-local binning — no global rank window);
    // TP/FP at each threshold come from ONE cumulative pass over the
    // 20-cell frame, precision/recall as exact floor permille. The
    // whole curve costs one fact scan.
    Q(
      "ml21_pr_curve",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM sc),
        |cells AS (SELECT ((cents - mn) * 20) // (mx - mn + 1) AS bin,
        |            count(*) AS n_b, CAST(sum(y) AS BIGINT) AS pos_b
        |          FROM sc CROSS JOIN b GROUP BY 1),
        |cum AS (SELECT bin,
        |          sum(n_b) OVER (ORDER BY bin
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
        |          sum(pos_b) OVER (ORDER BY bin
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS posl,
        |          sum(n_b) OVER () AS n, sum(pos_b) OVER () AS pos
        |        FROM cells),
        |th AS (SELECT bin + 1 AS t, pos - posl AS tp,
        |         (n - pos) - (nl - posl) AS fp, pos
        |       FROM cum WHERE bin < 19)
        |SELECT CAST(t AS BIGINT) AS threshold_bin, CAST(tp AS BIGINT) AS tp,
        |  CAST(fp AS BIGINT) AS fp,
        |  CASE WHEN tp + fp = 0 THEN NULL
        |       ELSE CAST((tp * 1000) // (tp + fp) AS BIGINT) END AS precision_pm,
        |  CAST((tp * 1000) // pos AS BIGINT) AS recall_pm
        |FROM th ORDER BY threshold_bin""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val b = sc.agg(min("cents").as("mn"), max("cents").as("mx"))
      val cells = sc.crossJoin(broadcast(b))
        .select(expr("((cents - mn) * 20) DIV (mx - mn + 1)").as("bin"), col("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum("y").as("pos_b"))
      val wc = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cells.select(col("bin"),
        sum("n_b").over(wc).as("nl"), sum("pos_b").over(wc).as("posl"),
        sum("n_b").over(Window.partitionBy()).as("n"),
        sum("pos_b").over(Window.partitionBy()).as("pos"))
      cum.filter(col("bin") < 19)
        .select((col("bin") + 1).as("threshold_bin"),
          (col("pos") - col("posl")).as("tp"),
          ((col("n") - col("pos")) - (col("nl") - col("posl"))).as("fp"),
          col("pos"))
        .select(col("threshold_bin"), col("tp"), col("fp"),
          when(col("tp") + col("fp") === 0, lit(null))
            .otherwise(expr("(tp * 1000) DIV (tp + fp)")).as("precision_pm"),
          expr("(tp * 1000) DIV pos").as("recall_pm"))
        .orderBy("threshold_bin")
    },

    // L102 — cost-optimal decision threshold: the step that turns
    // ml21's curve into a DECISION — with a false negative costing 5×
    // a false positive, which threshold minimizes total cost? Pure
    // integer cost per threshold off the same 20-cell cumulative
    // frame, argmin under the explicit (cost, threshold) total order;
    // the winner is marked so the oracle certifies the decision, not
    // just the curve.
    Q(
      "ml22_cost_threshold",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM sc),
        |cells AS (SELECT ((cents - mn) * 20) // (mx - mn + 1) AS bin,
        |            count(*) AS n_b, CAST(sum(y) AS BIGINT) AS pos_b
        |          FROM sc CROSS JOIN b GROUP BY 1),
        |cum AS (SELECT bin,
        |          sum(n_b) OVER (ORDER BY bin
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS nl,
        |          sum(pos_b) OVER (ORDER BY bin
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS posl,
        |          sum(n_b) OVER () AS n, sum(pos_b) OVER () AS pos
        |        FROM cells),
        |th AS (SELECT bin + 1 AS t,
        |         CAST((n - pos) - (nl - posl) AS BIGINT) AS fp,
        |         CAST(posl AS BIGINT) AS fn
        |       FROM cum WHERE bin < 19),
        |cost AS (SELECT t, fp, fn, fp + 5 * fn AS cost FROM th),
        |best AS (SELECT min(cost) AS mc FROM cost)
        |SELECT CAST(t AS BIGINT) AS threshold_bin, fp, fn,
        |  CAST(cost AS BIGINT) AS cost,
        |  CASE WHEN cost = (SELECT mc FROM best)
        |        AND t = (SELECT min(t) FROM cost
        |                 WHERE cost = (SELECT mc FROM best))
        |       THEN 1 ELSE 0 END AS is_best
        |FROM cost ORDER BY threshold_bin""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val b = sc.agg(min("cents").as("mn"), max("cents").as("mx"))
      val cells = sc.crossJoin(broadcast(b))
        .select(expr("((cents - mn) * 20) DIV (mx - mn + 1)").as("bin"), col("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum("y").as("pos_b"))
      val wc = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cells.select(col("bin"),
        sum("n_b").over(wc).as("nl"), sum("pos_b").over(wc).as("posl"),
        sum("n_b").over(Window.partitionBy()).as("n"),
        sum("pos_b").over(Window.partitionBy()).as("pos"))
      val cost = cum.filter(col("bin") < 19)
        .select((col("bin") + 1).as("t"),
          ((col("n") - col("pos")) - (col("nl") - col("posl"))).as("fp"),
          col("posl").as("fn"))
        .withColumn("cost", col("fp") + lit(5) * col("fn"))
        .localCheckpoint(true) // argmin + output both read it
      val best = cost.agg(min(struct(col("cost"), col("t"))).as("m"))
        .select(col("m.cost").as("mc"), col("m.t").as("mt"))
      cost.crossJoin(broadcast(best))
        .select(col("t").as("threshold_bin"), col("fp"), col("fn"), col("cost"),
          when(col("cost") === col("mc") && col("t") === col("mt"), 1L)
            .otherwise(0L).as("is_best"))
        .orderBy("threshold_bin")
    },

    // L103 — regression evaluation metrics (MAE / RMSE / R²) for the
    // simplest honest predictor (per-priority mean price, ml1's target
    // encoding as the model): predictions are floor-quantized integer
    // cents (one DIV per group), so every error is an EXACT integer,
    // Σ|e| and Σe² exact (squares in decimal(38,0)/HUGEINT), and the
    // three metrics are single double trees over exact integers. The
    // group-mean "model" broadcasts; the fact is scored in one pass.
    Q(
      "ml23_reg_metrics",
      """WITH sc AS (SELECT o_orderpriority AS grp,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS y FROM orders),
        |mdl AS (SELECT grp, CAST(sum(y) // count(*) AS BIGINT) AS pred
        |        FROM sc GROUP BY 1),
        |er AS (SELECT sc.y, mdl.pred, sc.y - mdl.pred AS e
        |       FROM sc JOIN mdl ON sc.grp = mdl.grp),
        |st AS (SELECT count(*) AS n, CAST(sum(abs(e)) AS BIGINT) AS sae,
        |         CAST(sum(CAST(e AS HUGEINT) * e) AS HUGEINT) AS sse,
        |         CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy
        |       FROM er)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(sae AS DOUBLE) / n AS mae_cents,
        |  sqrt(CAST(sse AS DOUBLE) / n) AS rmse_cents,
        |  CAST(1 AS DOUBLE) - CAST(sse AS DOUBLE)
        |    / (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) AS r2
        |FROM st""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val sc = Tables.orders(s, d).select(col("o_orderpriority").as("grp"),
        round(col("o_totalprice") * 100).cast("long").as("y"))
      val mdl = sc.groupBy("grp").agg(expr("sum(y) DIV count(*)").as("pred"))
      val er = sc.join(broadcast(mdl), "grp")
        .select(col("y"), col("pred"), (col("y") - col("pred")).as("e"))
      val st = er.agg(count(lit(1)).as("n"), sum(abs(col("e"))).as("sae"),
        sum(dec(col("e")) * col("e")).as("sse"),
        sum("y").as("sy"), sum(dec(col("y")) * col("y")).as("syy"))
      st.select(col("n"),
        (col("sae").cast("double") / col("n")).as("mae_cents"),
        sqrt(col("sse").cast("double") / col("n")).as("rmse_cents"),
        (lit(1).cast("double") - col("sse").cast("double")
          / (col("syy").cast("double")
            - col("sy").cast("double") * col("sy") / col("n"))).as("r2"))
    },

    // L104 — expected calibration error (ECE), FULLY exact: ml6's
    // reliability table collapsed to the one number papers report.
    // Per bin, |accuracy − confidence| = |pos·mx − sumc| / (n_b·mx)
    // after cross-multiplying the two rationals onto a common
    // denominator, so the bin-weighted sum needs NO floats at all:
    // ece_e6 = (1e6·Σ_b |pos_b·mx − sumc_b|) DIV (n·mx), every term an
    // exact integer (wide products in decimal(38,0)/HUGEINT). One fact
    // pass into 10 bins.
    Q(
      "ml24_ece",
      """WITH scored AS (
        |  SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS label
        |  FROM orders),
        |mx AS (SELECT max(cents) AS m FROM scored),
        |bins AS (
        |  SELECT CASE WHEN cents = m THEN 9 ELSE (cents*10) // m END AS bin,
        |    count(*) AS n_b, CAST(sum(label) AS BIGINT) AS pos_b,
        |    CAST(sum(cents) AS BIGINT) AS sumc_b, max(m) AS m
        |  FROM scored CROSS JOIN mx GROUP BY 1),
        |t AS (SELECT CAST(sum(n_b) AS BIGINT) AS n, max(m) AS m,
        |        CAST(sum(abs(CAST(pos_b AS HUGEINT) * m - sumc_b)) AS HUGEINT)
        |          AS num
        |      FROM bins)
        |SELECT n, CAST(m AS BIGINT) AS max_cents,
        |  CAST((1000000 * num) // (CAST(n AS HUGEINT) * m) AS BIGINT) AS ece_e6
        |FROM t""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val scored = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("label"))
      val mx = scored.agg(max("cents").as("m"))
      val bins = scored.crossJoin(broadcast(mx))
        .withColumn("bin", when(col("cents") === col("m"), lit(9L))
          .otherwise(expr("(cents*10) DIV m")))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum("label").as("pos_b"),
          sum("cents").as("sumc_b"), max("m").as("m"))
      val t = bins.agg(sum("n_b").as("n"), max("m").as("m"),
        sum(abs(dec(col("pos_b")) * col("m") - col("sumc_b"))).as("num"))
      t.select(col("n"), col("m").as("max_cents"),
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * num) DIV (CAST(n AS DECIMAL(38,0)) * m) AS BIGINT)")
          .as("ece_e6"))
    },

    // L105b — model-score KS statistic (the credit-scoring separation
    // number): max over thresholds of |F_pos − F_neg|, held EXACT as
    // max|cumpos·neg − cumneg·pos| over the 20-cell cumulative frame
    // (cross-scaled ECDF numerators, ev27's discipline applied to a
    // MODEL score instead of an A/B metric); ks_e6 is one floor DIV of
    // exact integers. One fact pass into bins.
    Q(
      "ml25_ks_score",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM sc),
        |cells AS (SELECT ((cents - mn) * 20) // (mx - mn + 1) AS bin,
        |            count(*) AS n_b, CAST(sum(y) AS BIGINT) AS pos_b
        |          FROM sc CROSS JOIN b GROUP BY 1),
        |cum AS (SELECT bin,
        |          sum(pos_b) OVER (ORDER BY bin
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumpos,
        |          sum(n_b - pos_b) OVER (ORDER BY bin
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumneg,
        |          sum(pos_b) OVER () AS pos,
        |          sum(n_b - pos_b) OVER () AS neg
        |        FROM cells)
        |SELECT CAST(max(pos) AS BIGINT) AS n_pos, CAST(max(neg) AS BIGINT) AS n_neg,
        |  CAST(max(abs(CAST(cumpos AS HUGEINT) * neg
        |    - CAST(cumneg AS HUGEINT) * pos)) AS BIGINT) AS d_num,
        |  CAST((1000000 * max(abs(CAST(cumpos AS HUGEINT) * neg
        |    - CAST(cumneg AS HUGEINT) * pos)))
        |    // (CAST(max(pos) AS HUGEINT) * max(neg)) AS BIGINT) AS ks_e6
        |FROM cum""".stripMargin
    ) { (s, d) =>
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val b = sc.agg(min("cents").as("mn"), max("cents").as("mx"))
      val cells = sc.crossJoin(broadcast(b))
        .select(expr("((cents - mn) * 20) DIV (mx - mn + 1)").as("bin"), col("y"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_b"), sum("y").as("pos_b"))
      val wc = Window.orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = cells.select(col("bin"),
        sum("pos_b").over(wc).as("cumpos"),
        sum(col("n_b") - col("pos_b")).over(wc).as("cumneg"),
        sum("pos_b").over(Window.partitionBy()).as("pos"),
        sum(col("n_b") - col("pos_b")).over(Window.partitionBy()).as("neg"))
      val gap = abs(dec(col("cumpos")) * col("neg")
        - dec(col("cumneg")) * col("pos"))
      cum.agg(max("pos").as("n_pos"), max("neg").as("n_neg"),
          max(gap).cast("long").as("d_num"))
        .select(col("n_pos"), col("n_neg"), col("d_num"),
          expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * d_num) DIV (CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)")
            .as("ks_e6"))
    },

    // R165 — Matthews correlation + balanced accuracy + Youden's J on
    // ml9's confusion frame (same mean-threshold classifier, so the two
    // entries certify each other). sqrt IS portable (IEEE-754 requires
    // correct rounding, unlike trig/ln which stay banned): every factor
    // is an exact count cast to double individually (< 2^53 even at
    // lake scale — they're row counts), products associate in ONE fixed
    // written order on both engines, and the final ratio is e6-rounded.
    // Degenerate margins (a zero row/column) NULL out MCC identically
    // on both engines. One fact pass; the confusion matrix is 1 row.
    Q(
      "ml26_mcc",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y FROM orders),
        |t AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr FROM sc),
        |cm AS (SELECT
        |    CAST(sum(CASE WHEN cents >= thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN cents >= thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN cents < thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN cents < thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM sc CROSS JOIN t)
        |SELECT tp, fp, tn, fn,
        |  CASE WHEN tp+fp = 0 OR tp+fn = 0 OR tn+fp = 0 OR tn+fn = 0 THEN NULL
        |    ELSE CAST(round(1000000 *
        |      (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
        |        - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
        |      / sqrt((CAST(tp+fp AS DOUBLE) * CAST(tp+fn AS DOUBLE))
        |           * (CAST(tn+fp AS DOUBLE) * CAST(tn+fn AS DOUBLE)))) AS BIGINT)
        |  END AS mcc_e6,
        |  CAST(round(500000 * (CAST(tp AS DOUBLE) / (tp+fn)
        |    + CAST(tn AS DOUBLE) / (tn+fp))) AS BIGINT) AS bal_acc_e6,
        |  CAST(round(1000000 * (CAST(tp AS DOUBLE) / (tp+fn)
        |    + CAST(tn AS DOUBLE) / (tn+fp) - 1)) AS BIGINT) AS youden_e6
        |FROM cm""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        .localCheckpoint(true) // threshold + confusion both read it
      val t = sc.agg(expr("sum(cents) DIV count(*)").as("thr"))
      val cm = sc.crossJoin(broadcast(t)).agg(
        sum(when(col("cents") >= col("thr") && col("y") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("cents") >= col("thr") && col("y") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("cents") < col("thr") && col("y") === 0, 1L).otherwise(0L)).as("tn"),
        sum(when(col("cents") < col("thr") && col("y") === 1, 1L).otherwise(0L)).as("fn"))
      cm.select(col("tp"), col("fp"), col("tn"), col("fn"),
        when(expr("tp+fp = 0 OR tp+fn = 0 OR tn+fp = 0 OR tn+fn = 0"), lit(null))
          .otherwise(expr("""CAST(round(1000000 *
            (CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
              - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
            / sqrt((CAST(tp+fp AS DOUBLE) * CAST(tp+fn AS DOUBLE))
                 * (CAST(tn+fp AS DOUBLE) * CAST(tn+fn AS DOUBLE)))) AS BIGINT)"""))
          .as("mcc_e6"),
        expr("""CAST(round(500000 * (CAST(tp AS DOUBLE) / (tp+fn)
          + CAST(tn AS DOUBLE) / (tn+fp))) AS BIGINT)""").as("bal_acc_e6"),
        expr("""CAST(round(1000000 * (CAST(tp AS DOUBLE) / (tp+fn)
          + CAST(tn AS DOUBLE) / (tn+fp) - 1)) AS BIGINT)""").as("youden_e6"))
    },

    // R170 — popularity-recommender hit-rate@25: the baseline every
    // recommender must beat, evaluated with a leak-free TEMPORAL split
    // (train = orders up to the exact lower-median epoch day via the
    // ev19 rank-pick discipline, test = after). Top-25 parts by
    // distinct TRAIN buyers under the (count, partkey) total order;
    // hit = a test user bought any of them. Scale: the median comes
    // off day CELLS (date-domain-bounded), the popularity frame is
    // part-dimension-sized with a map-side-combinable distinct-count,
    // the top-25 broadcasts into the test-side semi-probe — the fact
    // is touched twice (train agg, test distinct), never self-joined.
    Q(
      "ml27_pop_recall",
      """WITH od AS (SELECT o_orderkey, o_custkey,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS ed
        |  FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM od),
        |cells AS (SELECT ed, CAST(count(*) AS BIGINT) AS c FROM od GROUP BY 1),
        |cum AS (SELECT ed, sum(c) OVER (ORDER BY ed) AS cumc FROM cells),
        |med AS (SELECT min(ed) AS med FROM cum, n WHERE cumc >= (n.n + 1) // 2),
        |tr AS (SELECT o_orderkey, o_custkey FROM od, med WHERE ed <= med),
        |te AS (SELECT o_orderkey, o_custkey FROM od, med WHERE ed > med),
        |pop AS (SELECT l_partkey AS pk, count(DISTINCT o_custkey) AS cnt
        |        FROM lineitem JOIN tr ON l_orderkey = o_orderkey GROUP BY 1),
        |topk AS (SELECT pk FROM (
        |    SELECT pk, row_number() OVER (ORDER BY cnt DESC, pk) AS rn FROM pop)
        |  WHERE rn <= 25),
        |tu AS (SELECT DISTINCT o_custkey AS ck, l_partkey AS pk
        |       FROM lineitem JOIN te ON l_orderkey = o_orderkey),
        |users AS (SELECT ck,
        |    max(CASE WHEN pk IN (SELECT pk FROM topk) THEN 1 ELSE 0 END) AS hit
        |  FROM tu GROUP BY 1)
        |SELECT CAST(25 AS BIGINT) AS k,
        |  CAST(count(*) AS BIGINT) AS n_users,
        |  CAST(sum(hit) AS BIGINT) AS n_hit,
        |  (CAST(sum(hit) AS BIGINT) * 1000) // CAST(count(*) AS BIGINT) AS hit_permille
        |FROM users""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val od = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("long").as("ed"))
        .localCheckpoint(true) // median + both split sides read it
      val n = od.agg(count(lit(1)).as("n"))
      val cells = od.groupBy("ed").agg(count(lit(1)).as("c"))
      // day-cell window: bounded by the date domain, not the fact
      val cum = cells.withColumn("cumc",
        sum("c").over(Window.orderBy("ed")))
      val med = cum.crossJoin(broadcast(n))
        .filter(col("cumc") >= expr("(n + 1) DIV 2"))
        .agg(min("ed").as("med"))
      val withMed = od.crossJoin(broadcast(med))
      val tr = withMed.filter(col("ed") <= col("med"))
        .select("o_orderkey", "o_custkey")
      val te = withMed.filter(col("ed") > col("med"))
        .select("o_orderkey", "o_custkey")
      val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
      val pop = li.join(tr, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_partkey").as("pk"))
        .agg(countDistinct("o_custkey").as("cnt"))
      // top-25 via TakeOrderedAndProject (k rows per map task), not an
      // unpartitioned row_number over the part-sized frame — same
      // (cnt DESC, pk) total order, so the oracle's rank pick is identical
      val topk = pop.orderBy(desc("cnt"), col("pk")).limit(25).select("pk")
      val tu = li.join(te, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_partkey").as("pk")).distinct()
      val users = tu.join(broadcast(topk.withColumn("intop", lit(1))), Seq("pk"), "left")
        .groupBy("ck").agg(max(coalesce(col("intop"), lit(0))).as("hit"))
      users.agg(count(lit(1)).as("n_users"), sum("hit").cast("long").as("n_hit"))
        .select(lit(25L).as("k"), col("n_users"), col("n_hit"),
          expr("(n_hit * 1000) DIV n_users").as("hit_permille"))
    },

    // R177 — group-fairness audit: demographic parity + equalized odds
    // for ml9's mean-threshold classifier across customer market
    // segments — the pre-deployment bias table (which group gets
    // flagged more, and is the ERROR profile equal across groups).
    // Per segment: selection rate, TPR, FPR in exact permille; the
    // parity gap (max−min selection) and the equalized-odds gap
    // (greatest of the TPR / FPR spreads) repeat on every row from a
    // broadcast 1-row frame. Scale: orders⨝broadcast(customer-keyed
    // segment) once, one aggregate to the |segments| frame, everything
    // after segment-sized.
    Q(
      "ml28_fairness",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |    c_mktsegment AS seg
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |t AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr FROM sc),
        |g AS (SELECT seg,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN cents >= thr THEN 1 ELSE 0 END) AS BIGINT) AS pos,
        |    CAST(sum(CASE WHEN cents >= thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN cents < thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(sum(CASE WHEN cents >= thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN cents < thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM sc CROSS JOIN t GROUP BY 1),
        |r AS (SELECT seg, n,
        |    (pos * 1000) // n AS sel_pm,
        |    (tp * 1000) // (tp + fn) AS tpr_pm,
        |    (fp * 1000) // (fp + tn) AS fpr_pm
        |  FROM g),
        |gaps AS (SELECT
        |    max(sel_pm) - min(sel_pm) AS dp_gap_pm,
        |    CASE WHEN max(tpr_pm) - min(tpr_pm) >= max(fpr_pm) - min(fpr_pm)
        |         THEN max(tpr_pm) - min(tpr_pm)
        |         ELSE max(fpr_pm) - min(fpr_pm) END AS eo_gap_pm
        |  FROM r)
        |SELECT r.seg, r.n, r.sel_pm, r.tpr_pm, r.fpr_pm,
        |  gaps.dp_gap_pm, gaps.eo_gap_pm
        |FROM r CROSS JOIN gaps ORDER BY r.seg""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment").as("seg"))),
          col("o_custkey") === col("c_custkey"))
        .select(round(col("o_totalprice") * 100).cast("long").as("cents"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
          col("seg"))
        .localCheckpoint(true) // threshold + per-group both read it
      val t = sc.agg(expr("sum(cents) DIV count(*)").as("thr"))
      val g = sc.crossJoin(broadcast(t)).groupBy("seg").agg(
        count(lit(1)).as("n"),
        sum(when(col("cents") >= col("thr"), 1L).otherwise(0L)).as("pos"),
        sum(when(col("cents") >= col("thr") && col("y") === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(col("cents") < col("thr") && col("y") === 1, 1L).otherwise(0L)).as("fn"),
        sum(when(col("cents") >= col("thr") && col("y") === 0, 1L).otherwise(0L)).as("fp"),
        sum(when(col("cents") < col("thr") && col("y") === 0, 1L).otherwise(0L)).as("tn"))
      val r = g.select(col("seg"), col("n"),
        expr("(pos * 1000) DIV n").as("sel_pm"),
        expr("(tp * 1000) DIV (tp + fn)").as("tpr_pm"),
        expr("(fp * 1000) DIV (fp + tn)").as("fpr_pm"))
        .localCheckpoint(true) // rows + gap summary both read it
      val gaps = r.agg(
        (max("sel_pm") - min("sel_pm")).as("dp_gap_pm"),
        greatest(max("tpr_pm") - min("tpr_pm"),
          max("fpr_pm") - min("fpr_pm")).as("eo_gap_pm"))
      r.crossJoin(broadcast(gaps))
        .select(col("seg"), col("n"), col("sel_pm"), col("tpr_pm"), col("fpr_pm"),
          col("dp_gap_pm"), col("eo_gap_pm"))
        .orderBy("seg")
    },

    // R180 — learning curve: ml9's mean-threshold classifier re-fit on
    // growing TEMPORAL prefixes (20/40/60/80% of history by exact
    // ceil-rank day cuts) and each fit scored on the SAME held-out
    // last-20% tail — the "is more data still buying accuracy" readout
    // that decides whether to extend a training window. All exact
    // integers: cuts are day-cell rank picks, thresholds floor DIVs,
    // accuracy one conditional aggregate per prefix folded into a
    // SINGLE test pass (4 thresholds broadcast as one row). Scale: the
    // fact is touched twice (one pass computing all 4 prefix sums
    // conditionally, one test pass), windows only on day cells.
    Q(
      "ml29_learning_curve",
      """WITH od AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |    CAST(date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS ed
        |  FROM orders),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM od),
        |cells AS (SELECT ed, CAST(count(*) AS BIGINT) AS c FROM od GROUP BY 1),
        |cum AS (SELECT ed, sum(c) OVER (ORDER BY ed) AS cum FROM cells),
        |cuts AS (SELECT
        |    min(CASE WHEN cum >= (n.n*20 + 99) // 100 THEN ed END) AS c20,
        |    min(CASE WHEN cum >= (n.n*40 + 99) // 100 THEN ed END) AS c40,
        |    min(CASE WHEN cum >= (n.n*60 + 99) // 100 THEN ed END) AS c60,
        |    min(CASE WHEN cum >= (n.n*80 + 99) // 100 THEN ed END) AS c80
        |  FROM cum, n),
        |tr AS (SELECT
        |    CAST(count(CASE WHEN ed <= c20 THEN 1 END) AS BIGINT) AS n20,
        |    CAST(count(CASE WHEN ed <= c40 THEN 1 END) AS BIGINT) AS n40,
        |    CAST(count(CASE WHEN ed <= c60 THEN 1 END) AS BIGINT) AS n60,
        |    CAST(count(CASE WHEN ed <= c80 THEN 1 END) AS BIGINT) AS n80,
        |    CAST(sum(CASE WHEN ed <= c20 THEN cents END)
        |      // count(CASE WHEN ed <= c20 THEN 1 END) AS BIGINT) AS thr20,
        |    CAST(sum(CASE WHEN ed <= c40 THEN cents END)
        |      // count(CASE WHEN ed <= c40 THEN 1 END) AS BIGINT) AS thr40,
        |    CAST(sum(CASE WHEN ed <= c60 THEN cents END)
        |      // count(CASE WHEN ed <= c60 THEN 1 END) AS BIGINT) AS thr60,
        |    CAST(sum(CASE WHEN ed <= c80 THEN cents END)
        |      // count(CASE WHEN ed <= c80 THEN 1 END) AS BIGINT) AS thr80
        |  FROM od, cuts),
        |ev AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n_test,
        |    CAST(sum(CASE WHEN (cents >= thr20) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS ok20,
        |    CAST(sum(CASE WHEN (cents >= thr40) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS ok40,
        |    CAST(sum(CASE WHEN (cents >= thr60) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS ok60,
        |    CAST(sum(CASE WHEN (cents >= thr80) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS ok80
        |  FROM od, cuts, tr WHERE ed > c80)
        |SELECT * FROM (
        |  SELECT CAST(20 AS BIGINT) AS train_pct, n20 AS n_train, thr20 AS thr,
        |    n_test, (ok20 * 1000) // n_test AS acc_permille FROM tr, ev
        |  UNION ALL
        |  SELECT 40, n40, thr40, n_test, (ok40 * 1000) // n_test FROM tr, ev
        |  UNION ALL
        |  SELECT 60, n60, thr60, n_test, (ok60 * 1000) // n_test FROM tr, ev
        |  UNION ALL
        |  SELECT 80, n80, thr80, n_test, (ok80 * 1000) // n_test FROM tr, ev)
        |ORDER BY train_pct""".stripMargin
    ) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val od = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
          .cast("long").as("ed"))
        .localCheckpoint(true) // cuts + train sums + test pass read it
      val n = od.agg(count(lit(1)).as("n"))
      val cum = od.groupBy("ed").agg(count(lit(1)).as("c"))
        .withColumn("cum", sum("c").over(Window.orderBy("ed")))
      val cuts = cum.crossJoin(broadcast(n)).agg(
        min(when(expr("cum >= (n*20 + 99) DIV 100"), col("ed"))).as("c20"),
        min(when(expr("cum >= (n*40 + 99) DIV 100"), col("ed"))).as("c40"),
        min(when(expr("cum >= (n*60 + 99) DIV 100"), col("ed"))).as("c60"),
        min(when(expr("cum >= (n*80 + 99) DIV 100"), col("ed"))).as("c80"))
      val tr = od.crossJoin(broadcast(cuts)).agg(
        count(when(col("ed") <= col("c20"), 1)).as("n20"),
        count(when(col("ed") <= col("c40"), 1)).as("n40"),
        count(when(col("ed") <= col("c60"), 1)).as("n60"),
        count(when(col("ed") <= col("c80"), 1)).as("n80"),
        expr("sum(CASE WHEN ed <= c20 THEN cents END) DIV count(CASE WHEN ed <= c20 THEN 1 END)").as("thr20"),
        expr("sum(CASE WHEN ed <= c40 THEN cents END) DIV count(CASE WHEN ed <= c40 THEN 1 END)").as("thr40"),
        expr("sum(CASE WHEN ed <= c60 THEN cents END) DIV count(CASE WHEN ed <= c60 THEN 1 END)").as("thr60"),
        expr("sum(CASE WHEN ed <= c80 THEN cents END) DIV count(CASE WHEN ed <= c80 THEN 1 END)").as("thr80"))
      val ev = od.crossJoin(broadcast(cuts)).crossJoin(broadcast(tr))
        .filter(col("ed") > col("c80"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(expr("(cents >= thr20) = (y = 1)"), 1L).otherwise(0L)).as("ok20"),
          sum(when(expr("(cents >= thr40) = (y = 1)"), 1L).otherwise(0L)).as("ok40"),
          sum(when(expr("(cents >= thr60) = (y = 1)"), 1L).otherwise(0L)).as("ok60"),
          sum(when(expr("(cents >= thr80) = (y = 1)"), 1L).otherwise(0L)).as("ok80"))
      val one = tr.crossJoin(ev).localCheckpoint(true) // 4 output rows read it
      def row(p: Int) = one.select(lit(p.toLong).as("train_pct"),
        col(s"n$p").as("n_train"), col(s"thr$p").as("thr"), col("n_test"),
        expr(s"(ok$p * 1000) DIV n_test").as("acc_permille"))
      row(20).unionByName(row(40)).unionByName(row(60)).unionByName(row(80))
        .orderBy("train_pct")
    },

    // R190 — 5-fold cross-validation stability (ml29 varies the
    // training WINDOW, this varies the SPLIT): folds by the
    // deterministic o_orderkey % 5 hash, each fold scored against the
    // threshold fit on its complement. The algebra makes it ONE
    // training pass: per-fold (count, sum) suffice, because the
    // complement threshold is (S−S_f) DIV (N−N_f) — no refit per fold,
    // just arithmetic on the 5-row frame. Second fact pass scores all
    // folds with the 5 thresholds broadcast. Fold-to-fold accuracy
    // spread is the variance readout a single holdout can't give.
    Q(
      "ml31_cv_folds",
      """WITH od AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |    o_orderkey % 5 AS fold
        |  FROM orders),
        |fs AS (SELECT fold, CAST(count(*) AS BIGINT) AS nf,
        |         CAST(sum(cents) AS BIGINT) AS sf
        |       FROM od GROUP BY 1),
        |g AS (SELECT CAST(sum(nf) AS BIGINT) AS n, CAST(sum(sf) AS BIGINT) AS s FROM fs),
        |thr AS (SELECT fold, nf, (g.s - sf) // (g.n - nf) AS thr FROM fs, g)
        |SELECT od.fold,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(max(thr.thr) AS BIGINT) AS thr,
        |  (CAST(sum(CASE WHEN (od.cents >= thr.thr) = (od.y = 1)
        |                 THEN 1 ELSE 0 END) AS BIGINT) * 1000)
        |    // CAST(count(*) AS BIGINT) AS acc_permille
        |FROM od JOIN thr ON od.fold = thr.fold
        |GROUP BY od.fold ORDER BY od.fold""".stripMargin
    ) { (s, d) =>
      val od = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
        (col("o_orderkey") % 5).as("fold"))
        .localCheckpoint(true) // fold sums + scoring pass read it
      val fs = od.groupBy("fold")
        .agg(count(lit(1)).as("nf"), sum("cents").as("sf"))
      val g = fs.agg(sum("nf").as("n"), sum("sf").as("s"))
      val thr = fs.crossJoin(broadcast(g))
        .select(col("fold"), expr("(s - sf) DIV (n - nf)").as("thr"))
      od.join(broadcast(thr), "fold")
        .groupBy("fold")
        .agg(count(lit(1)).as("n_test"), max("thr").as("thr"),
          expr("""(sum(CASE WHEN (cents >= thr) = (y = 1) THEN 1 ELSE 0 END) * 1000)
            | DIV count(*)""".stripMargin).as("acc_permille"))
        .orderBy("fold")
    },

    // R213 — model-performance drift monitor: ml9's frozen classifier
    // scored per month, each month's ERROR RATE tested against 3σ
    // binomial limits around the lifetime error rate — q122's
    // sqrt-free p-chart pointed at the model instead of the process
    // ((e·N − E·n)² > 9·E·(N−E)·n, exact integers in decimal/
    // HUGEINT). The MLOps retraining trigger: a flagged month means
    // the world moved. One scoring pass to month cells; lifetime
    // totals broadcast.
    Q(
      "ml32_model_drift",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |    CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS ym
        |  FROM orders),
        |t AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr FROM sc),
        |m AS (SELECT ym,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN (cents >= thr) = (y = 1) THEN 0 ELSE 1 END) AS BIGINT) AS e
        |  FROM sc CROSS JOIN t GROUP BY 1),
        |g AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(e) AS BIGINT) AS ee FROM m)
        |SELECT ym, n, e,
        |  (e * 1000) // n AS err_permille,
        |  (ee * 1000) // nn AS lifetime_permille,
        |  CASE WHEN CAST(e * nn - ee * n AS HUGEINT) * (e * nn - ee * n)
        |            > 9 * CAST(ee AS HUGEINT) * (nn - ee) * n
        |       THEN 1 ELSE 0 END AS drift_flag
        |FROM m, g ORDER BY ym""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("ym"))
        .localCheckpoint(true) // threshold + monthly scoring read it
      val t = sc.agg(expr("sum(cents) DIV count(*)").as("thr"))
      val m = sc.crossJoin(broadcast(t)).groupBy("ym").agg(
        count(lit(1)).as("n"),
        sum(when(expr("(cents >= thr) = (y = 1)"), 0L).otherwise(1L)).as("e"))
      val g = m.agg(sum("n").as("nn"), sum("e").as("ee"))
      m.crossJoin(broadcast(g))
        .select(col("ym"), col("n"), col("e"),
          expr("(e * 1000) DIV n").as("err_permille"),
          expr("(ee * 1000) DIV nn").as("lifetime_permille"),
          when(expr("""CAST(e * nn - ee * n AS DECIMAL(38,0)) * (e * nn - ee * n)
            | > 9 * CAST(ee AS DECIMAL(38,0)) * (nn - ee) * n""".stripMargin), 1L)
            .otherwise(0L).as("drift_flag"))
        .orderBy("ym")
    },

    // R227 — McNemar's test (paired classifier comparison): is ml9's
    // price-threshold model actually BETTER than the rule-based
    // priority model on the SAME rows — the question two separate
    // accuracies can't answer (they share the rows, so the tests
    // aren't independent; McNemar uses only the DISCORDANT pairs).
    // χ² = (b−c)²/(b+c) entirely integer, e6-floored, significance by
    // the e6-scaled critical-value cross-multiply. One labeled pass to
    // the 4-cell agreement table.
    Q(
      "ml33_mcnemar",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS pb
        |  FROM orders),
        |t AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr FROM sc),
        |ag AS (SELECT
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN (cents >= thr) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS a_ok,
        |    CAST(sum(CASE WHEN (pb = 1) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS b_ok,
        |    CAST(sum(CASE WHEN (cents >= thr) = (y = 1)
        |                   AND (pb = 1) <> (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS b01,
        |    CAST(sum(CASE WHEN (cents >= thr) <> (y = 1)
        |                   AND (pb = 1) = (y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS c10
        |  FROM sc CROSS JOIN t)
        |SELECT n,
        |  (a_ok * 1000) // n AS acc_a_pm,
        |  (b_ok * 1000) // n AS acc_b_pm,
        |  b01 AS a_only_correct, c10 AS b_only_correct,
        |  CASE WHEN b01 + c10 = 0 THEN NULL
        |       ELSE (1000000 * (b01 - c10) * (b01 - c10)) // (b01 + c10) END AS mcnemar_e6,
        |  CASE WHEN 1000000 * (b01 - c10) * (b01 - c10) > 3841459 * (b01 + c10)
        |       THEN 1 ELSE 0 END AS significant
        |FROM ag""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("pb"))
        .localCheckpoint(true) // threshold + agreement table read it
      val t = sc.agg(expr("sum(cents) DIV count(*)").as("thr"))
      val ag = sc.crossJoin(broadcast(t)).agg(
        count(lit(1)).as("n"),
        sum(when(expr("(cents >= thr) = (y = 1)"), 1L).otherwise(0L)).as("a_ok"),
        sum(when(expr("(pb = 1) = (y = 1)"), 1L).otherwise(0L)).as("b_ok"),
        sum(when(expr("(cents >= thr) = (y = 1) AND (pb = 1) <> (y = 1)"), 1L)
          .otherwise(0L)).as("b01"),
        sum(when(expr("(cents >= thr) <> (y = 1) AND (pb = 1) = (y = 1)"), 1L)
          .otherwise(0L)).as("c10"))
      ag.select(col("n"),
        expr("(a_ok * 1000) DIV n").as("acc_a_pm"),
        expr("(b_ok * 1000) DIV n").as("acc_b_pm"),
        col("b01").as("a_only_correct"), col("c10").as("b_only_correct"),
        when(col("b01") + col("c10") === 0, lit(null))
          .otherwise(expr("(1000000 * (b01 - c10) * (b01 - c10)) DIV (b01 + c10)"))
          .as("mcnemar_e6"),
        when(expr("1000000 * (b01 - c10) * (b01 - c10) > 3841459 * (b01 + c10)"), 1L)
          .otherwise(0L).as("significant"))
    },

    // L111 — Qini uplift curve by targeting decile: ml10's cumulative
    // gains grade a RESPONSE model; an uplift model is graded on
    // INCREMENTAL conversions — Qini(k) = cumConvT(k) − cumConvC(k)·
    // cumNT(k)/cumNC(k), the treated conversions minus the control's
    // scaled counterfactual among the top-k targeted. Arms by user_id
    // parity (ev29/q128's randomization), outcome = purchased, targeting
    // score = pre-purchase engagement (view+click count). Deciles come
    // from ml10's broadcast percentile_disc thresholds (score ties land
    // in one decile — deterministic, never a global rank), cumulative
    // via the triangular self-join on the ≤10-row decile frame, and the
    // Qini value is EXACT: 1000·cumPT − (1000·cumPC·cumNT) DIV cumNC in
    // e3 units. One user-keyed aggregate touches the fact.
    Q(
      "ml34_qini",
      """WITH u AS (
        |  SELECT user_id,
        |    CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS tr,
        |    max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y,
        |    sum(CASE WHEN event_type IN ('view','click') THEN 1 ELSE 0 END)
        |      AS score
        |  FROM events GROUP BY 1),
        |thr AS (SELECT
        |    percentile_disc(0.1) WITHIN GROUP (ORDER BY score DESC) AS t1,
        |    percentile_disc(0.2) WITHIN GROUP (ORDER BY score DESC) AS t2,
        |    percentile_disc(0.3) WITHIN GROUP (ORDER BY score DESC) AS t3,
        |    percentile_disc(0.4) WITHIN GROUP (ORDER BY score DESC) AS t4,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY score DESC) AS t5,
        |    percentile_disc(0.6) WITHIN GROUP (ORDER BY score DESC) AS t6,
        |    percentile_disc(0.7) WITHIN GROUP (ORDER BY score DESC) AS t7,
        |    percentile_disc(0.8) WITHIN GROUP (ORDER BY score DESC) AS t8,
        |    percentile_disc(0.9) WITHIN GROUP (ORDER BY score DESC) AS t9
        |  FROM u),
        |tagged AS (SELECT tr, y,
        |    1 + (CASE WHEN score < t1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN score < t2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN score < t3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN score < t4 THEN 1 ELSE 0 END)
        |      + (CASE WHEN score < t5 THEN 1 ELSE 0 END)
        |      + (CASE WHEN score < t6 THEN 1 ELSE 0 END)
        |      + (CASE WHEN score < t7 THEN 1 ELSE 0 END)
        |      + (CASE WHEN score < t8 THEN 1 ELSE 0 END)
        |      + (CASE WHEN score < t9 THEN 1 ELSE 0 END) AS dc
        |  FROM u CROSS JOIN thr),
        |g AS (SELECT CAST(dc AS BIGINT) AS decile,
        |    CAST(sum(tr) AS BIGINT) AS nt,
        |    CAST(sum(tr * y) AS BIGINT) AS pt,
        |    CAST(sum(1 - tr) AS BIGINT) AS nc,
        |    CAST(sum((1 - tr) * y) AS BIGINT) AS pc
        |  FROM tagged GROUP BY 1),
        |c AS (SELECT a.decile, max(a.nt) AS nt, max(a.pt) AS pt,
        |    max(a.nc) AS nc, max(a.pc) AS pc,
        |    CAST(sum(b.nt) AS BIGINT) AS cnt, CAST(sum(b.pt) AS BIGINT) AS cpt,
        |    CAST(sum(b.nc) AS BIGINT) AS cnc, CAST(sum(b.pc) AS BIGINT) AS cpc
        |  FROM g a JOIN g b ON b.decile <= a.decile GROUP BY a.decile)
        |SELECT decile, nt, pt, nc, pc,
        |  CASE WHEN nt = 0 OR nc = 0 THEN NULL
        |       ELSE (1000 * pt) // nt - (1000 * pc) // nc END AS uplift_pm,
        |  CASE WHEN cnc = 0 THEN NULL
        |       ELSE 1000 * cpt - (1000 * cpc * cnt) // cnc END AS qini_e3
        |FROM c ORDER BY decile""".stripMargin
    ) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"),
          sum(when(col("event_type").isin("view", "click"), 1L).otherwise(0L))
            .as("score"))
        .select(col("user_id"),
          when(col("user_id") % 2 === 0, 1L).otherwise(0L).as("tr"),
          col("y"), col("score"))
        .localCheckpoint(true) // threshold agg + tagging pass both read it
      val thr = u.agg(
        (1 to 9).map(k => expr(
          s"percentile_disc(0.$k) WITHIN GROUP (ORDER BY score DESC)")
          .as(s"t$k")).head,
        (2 to 9).map(k => expr(
          s"percentile_disc(0.$k) WITHIN GROUP (ORDER BY score DESC)")
          .as(s"t$k")): _*)
      val dc = (1 to 9).map(k =>
        when(col("score") < col(s"t$k"), 1L).otherwise(0L))
        .reduce(_ + _) + 1
      val g = u.crossJoin(broadcast(thr))
        .select(col("tr"), col("y"), dc.as("decile"))
        .groupBy("decile")
        .agg(sum("tr").as("nt"), sum(col("tr") * col("y")).as("pt"),
          sum(lit(1L) - col("tr")).as("nc"),
          sum((lit(1L) - col("tr")) * col("y")).as("pc"))
        .localCheckpoint(true) // triangular cumulative reads it twice
      val b = g.select(col("decile").as("bd"), col("nt").as("bnt"),
        col("pt").as("bpt"), col("nc").as("bnc"), col("pc").as("bpc"))
      g.join(broadcast(b), col("bd") <= col("decile"))
        .groupBy("decile")
        .agg(max("nt").as("nt"), max("pt").as("pt"),
          max("nc").as("nc"), max("pc").as("pc"),
          sum("bnt").as("cnt"), sum("bpt").as("cpt"),
          sum("bnc").as("cnc"), sum("bpc").as("cpc"))
        .select(col("decile"), col("nt"), col("pt"), col("nc"), col("pc"),
          when(col("nt") === 0 || col("nc") === 0, lit(null))
            .otherwise(expr("(1000 * pt) DIV nt - (1000 * pc) DIV nc"))
            .as("uplift_pm"),
          when(col("cnc") === 0, lit(null))
            .otherwise(expr("1000 * cpt - (1000 * cpc * cnt) DIV cnc"))
            .as("qini_e3"))
        .orderBy("decile")
    },

    // L112 — Friedman test (k related samples over n blocks): ml33's
    // McNemar compares TWO classifiers; Friedman is the k-way
    // rank-based omnibus — here, does order PRIORITY CLASS shift mean
    // order value consistently across the 25 nation blocks (each nation
    // is its own control). Within each block the k=3 class means rank
    // WITHOUT division: avg_i > avg_j ⟺ s_i·c_j > s_j·c_i (exact
    // wide-integer cross-multiply — no float mean ever exists), doubled
    // ranks absorb ties (r2 = 2 + Σ 2·[beats] + [ties], rank 1 =
    // largest). χ²_F = 3·ΣR2²/(n·k(k+1)) − 3n(k+1) with ΣR2² exact in
    // decimal/HUGEINT; blocks missing any class drop (the balanced
    // design Friedman assumes). One fact aggregate to (nation, class)
    // cells; everything after is 25×3 algebra.
    Q(
      "ml35_friedman",
      """WITH cells AS (
        |  SELECT n_name, substr(o_orderpriority, 1, 1) AS pc,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS s,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE substr(o_orderpriority, 1, 1) IN ('1', '2', '3')
        |  GROUP BY 1, 2),
        |blk AS (
        |  SELECT n_name,
        |    max(CASE WHEN pc = '1' THEN s END) AS s1,
        |    max(CASE WHEN pc = '1' THEN c END) AS c1,
        |    max(CASE WHEN pc = '2' THEN s END) AS s2,
        |    max(CASE WHEN pc = '2' THEN c END) AS c2,
        |    max(CASE WHEN pc = '3' THEN s END) AS s3,
        |    max(CASE WHEN pc = '3' THEN c END) AS c3
        |  FROM cells GROUP BY 1
        |  HAVING count(*) = 3),
        |rk AS (
        |  SELECT n_name,
        |    2 + 2*(CASE WHEN CAST(s2 AS HUGEINT)*c1 > CAST(s1 AS HUGEINT)*c2 THEN 1 ELSE 0 END)
        |      + 2*(CASE WHEN CAST(s3 AS HUGEINT)*c1 > CAST(s1 AS HUGEINT)*c3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(s2 AS HUGEINT)*c1 = CAST(s1 AS HUGEINT)*c2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(s3 AS HUGEINT)*c1 = CAST(s1 AS HUGEINT)*c3 THEN 1 ELSE 0 END) AS r1,
        |    2 + 2*(CASE WHEN CAST(s1 AS HUGEINT)*c2 > CAST(s2 AS HUGEINT)*c1 THEN 1 ELSE 0 END)
        |      + 2*(CASE WHEN CAST(s3 AS HUGEINT)*c2 > CAST(s2 AS HUGEINT)*c3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(s1 AS HUGEINT)*c2 = CAST(s2 AS HUGEINT)*c1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(s3 AS HUGEINT)*c2 = CAST(s2 AS HUGEINT)*c3 THEN 1 ELSE 0 END) AS r2,
        |    2 + 2*(CASE WHEN CAST(s1 AS HUGEINT)*c3 > CAST(s3 AS HUGEINT)*c1 THEN 1 ELSE 0 END)
        |      + 2*(CASE WHEN CAST(s2 AS HUGEINT)*c3 > CAST(s3 AS HUGEINT)*c2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(s1 AS HUGEINT)*c3 = CAST(s3 AS HUGEINT)*c1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN CAST(s2 AS HUGEINT)*c3 = CAST(s3 AS HUGEINT)*c2 THEN 1 ELSE 0 END) AS r3
        |  FROM blk),
        |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(r1) AS BIGINT) AS r2_1, CAST(sum(r2) AS BIGINT) AS r2_2,
        |    CAST(sum(r3) AS BIGINT) AS r2_3
        |  FROM rk)
        |SELECT n, r2_1, r2_2, r2_3,
        |  -- doubled ranks: χ² = 3·ΣR2²/(n·k(k+1)) − 3n(k+1), k = 3
        |  3.0 * (CAST(r2_1 AS DOUBLE)*r2_1 + CAST(r2_2 AS DOUBLE)*r2_2
        |         + CAST(r2_3 AS DOUBLE)*r2_3)
        |    / (CAST(n AS DOUBLE) * 3 * 4) - 3.0 * CAST(n AS DOUBLE) * 4
        |    AS chi2_f
        |FROM agg""".stripMargin
    ) { (s, d) =>
      val cells = Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .withColumn("pc", substring(col("o_orderpriority"), 1, 1))
        .filter(col("pc").isin("1", "2", "3"))
        .groupBy("n_name", "pc")
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("s"),
          count(lit(1)).as("c"))
      val blk = cells.groupBy("n_name")
        .agg(max(when(col("pc") === "1", col("s"))).as("s1"),
          max(when(col("pc") === "1", col("c"))).as("c1"),
          max(when(col("pc") === "2", col("s"))).as("s2"),
          max(when(col("pc") === "2", col("c"))).as("c2"),
          max(when(col("pc") === "3", col("s"))).as("s3"),
          max(when(col("pc") === "3", col("c"))).as("c3"),
          count(lit(1)).as("k"))
        .filter(col("k") === 3)
      def cmp(si: org.apache.spark.sql.Column, ci: org.apache.spark.sql.Column, sj: org.apache.spark.sql.Column, cj: org.apache.spark.sql.Column) =
        (when(si.cast("decimal(38,0)") * cj > sj.cast("decimal(38,0)") * ci,
          1L).otherwise(0L),
         when(si.cast("decimal(38,0)") * cj === sj.cast("decimal(38,0)") * ci,
          1L).otherwise(0L))
      def rank(si: org.apache.spark.sql.Column, ci: org.apache.spark.sql.Column,
               so1: org.apache.spark.sql.Column, co1: org.apache.spark.sql.Column,
               so2: org.apache.spark.sql.Column, co2: org.apache.spark.sql.Column) = {
        val (b1, t1) = cmp(so1, co1, si, ci)
        val (b2, t2) = cmp(so2, co2, si, ci)
        lit(2L) + lit(2L) * b1 + lit(2L) * b2 + t1 + t2
      }
      val rk = blk.select(
        rank(col("s1"), col("c1"), col("s2"), col("c2"), col("s3"), col("c3"))
          .as("r1"),
        rank(col("s2"), col("c2"), col("s1"), col("c1"), col("s3"), col("c3"))
          .as("r2"),
        rank(col("s3"), col("c3"), col("s1"), col("c1"), col("s2"), col("c2"))
          .as("r3"))
      val agg = rk.agg(count(lit(1)).as("n"),
        sum("r1").as("r2_1"), sum("r2").as("r2_2"), sum("r3").as("r2_3"))
      val nd = col("n").cast("double")
      agg.select(col("n"), col("r2_1"), col("r2_2"), col("r2_3"),
        (lit(3.0) * (col("r2_1").cast("double") * col("r2_1")
          + col("r2_2").cast("double") * col("r2_2")
          + col("r2_3").cast("double") * col("r2_3"))
          / (nd * 3 * 4) - lit(3.0) * nd * 4).as("chi2_f"))
    },

    // L113 — Population Stability Index (PSI): THE production
    // score-drift monitor (ml32 watches accuracy drift, which needs
    // labels; PSI watches the SCORE DISTRIBUTION, available the moment
    // a batch scores). Decile bin edges come from the 1995 baseline's
    // order statistics (exact: value-cell cumulative, min v with
    // 10·cum ≥ k·n), every later year's scores bin against those SAME
    // edges, counts are +1-smoothed over the full year×bin grid (an
    // empty bin must contribute, not NaN), and each bin's
    // (p−q)·ln(p/q) term is micro-quantized to a BIGINT before the
    // per-year sum so the fold is order-invariant and engine-exact.
    // ln is NOT taken from libm (r7 advice: JVM vs DuckDB libm can
    // differ in the last ulp and flip the e6 floor at a boundary — the
    // catalog's only transcendental-before-quantize). Instead both
    // engines evaluate the SAME pinned expression text (pinnedLnSteps):
    // a 6-step binary ladder of exact power-of-two divides reduces the
    // rational p/q to m ∈ [1,2), then an 8-term atanh series — plain
    // IEEE +,-,*,/ and CASE, each correctly-rounded per IEEE-754, so
    // the two engines produce BIT-IDENTICAL doubles and the floor can
    // never disagree (relative error vs true ln ≈ 1e-9, irrelevant at
    // e6 quantization of a [0, ~few] metric).
    // psi_micro ≥ 200000 (PSI > 0.2) is the standard retrain flag.
    // SCALE: the score-cell cumulative runs through Blocked.cumulative
    // (scores are near-continuous cents — a data-scaling frame); the
    // oracle uses the plain window form; the only other shuffles are
    // year×bin-sized.
    Q(
      "ml36_psi",
      """WITH sc AS (SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS v
        |  FROM orders),
        |base AS (SELECT v FROM sc WHERE yr = 1995),
        |cells AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1),
        |nb AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cells),
        |cum AS (SELECT v,
        |    CAST(sum(c) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
        |  FROM cells),
        |edges AS (SELECT k, min(v) AS edge
        |  FROM cum CROSS JOIN nb CROSS JOIN (SELECT unnest(range(1, 10)) AS k)
        |  WHERE 10 * cc >= k * n GROUP BY 1),
        |yv AS (SELECT yr, v, CAST(count(*) AS BIGINT) AS m
        |       FROM sc GROUP BY 1, 2),
        |binned AS (SELECT yr, v, m,
        |    1 + CAST(count(CASE WHEN v > edge THEN 1 END) AS BIGINT) AS bin
        |  FROM yv CROSS JOIN edges GROUP BY yr, v, m),
        |grid AS (SELECT yr, k AS bin FROM (SELECT DISTINCT yr FROM sc)
        |  CROSS JOIN (SELECT unnest(range(1, 11)) AS k)),
        |cnt AS (SELECT g.yr, g.bin,
        |    CAST(coalesce(b.c, 0) + 1 AS BIGINT) AS c
        |  FROM grid g LEFT JOIN (SELECT yr, bin, CAST(sum(m) AS BIGINT) AS c
        |                         FROM binned GROUP BY 1, 2) b
        |    ON g.yr = b.yr AND g.bin = b.bin),
        |tot AS (SELECT yr, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
        |bl AS (SELECT bin, c AS bc FROM cnt WHERE yr = 1995),
        |bt AS (SELECT n AS bn FROM tot WHERE yr = 1995),
        |terms0 AS (SELECT cnt.yr,
        |    CAST(cnt.c AS DOUBLE) / tot.n - CAST(bl.bc AS DOUBLE) / bt.bn AS d,
        |    (CAST(cnt.c AS DOUBLE) / tot.n)
        |      / (CAST(bl.bc AS DOUBLE) / bt.bn) AS x
        |  FROM cnt JOIN tot ON cnt.yr = tot.yr
        |  JOIN bl ON cnt.bin = bl.bin CROSS JOIN bt),
        |""".stripMargin + pinnedLnCtes("terms0") +
      """terms AS (SELECT yr,
        |    CAST(floor(1000000.0 * d * lnx) AS BIGINT) AS t_micro FROM plF)
        |SELECT yr, CAST(sum(t_micro) AS BIGINT) AS psi_micro,
        |  CAST(CASE WHEN sum(t_micro) >= 200000 THEN 1 ELSE 0 END AS BIGINT)
        |    AS drift_flag
        |FROM terms GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d)
        .select(year(col("o_orderdate").cast("date")).cast("long").as("yr"),
          round(col("o_totalprice") * 100).cast("long").as("v"))
      val base = sc.filter(col("yr") === 1995).select("v")
      val cells = base.groupBy("v").agg(count(lit(1)).as("c"))
      val nb = cells.agg(sum("c").as("n"))
      val cum = Blocked.cumulative(cells, Seq(col("v")), Seq("c"))
        .select(col("v"), col("cum_c").as("cc"))
      val edges = cum.crossJoin(broadcast(nb))
        .select(col("v"), col("cc"), col("n"),
          explode(sequence(lit(1L), lit(9L))).as("k"))
        .filter(lit(10) * col("cc") >= col("k") * col("n"))
        .groupBy("k").agg(min("v").as("edge"))
      val yv = sc.groupBy("yr", "v").agg(count(lit(1)).as("m"))
      val binned = yv
        .join(broadcast(edges), col("v") > col("edge"), "left")
        .groupBy("yr", "v", "m")
        .agg((lit(1) + count(col("edge"))).as("bin"))
      val grid = sc.select("yr").distinct()
        .crossJoin(broadcast(
          s.range(1, 11).toDF("bin").select(col("bin"))))
      val cnt = grid.join(
          binned.groupBy("yr", "bin").agg(sum("m").as("c0")),
          Seq("yr", "bin"), "left")
        .select(col("yr"), col("bin"),
          (coalesce(col("c0"), lit(0L)) + 1).as("c"))
      val tot = cnt.groupBy("yr").agg(sum("c").as("n"))
      val bl = cnt.filter(col("yr") === 1995)
        .select(col("bin"), col("c").as("bc"))
      val bt = tot.filter(col("yr") === 1995).select(col("n").as("bn"))
      val p = col("c").cast("double") / col("n")
      val q = col("bc").cast("double") / col("bn")
      val terms0 = cnt.join(tot, Seq("yr"))
        .join(broadcast(bl), Seq("bin")).crossJoin(broadcast(bt))
        .select(col("yr"), (p - q).as("d"), (p / q).as("x"))
      // engine-pinned ln: the SAME expression text DuckDB runs (no libm)
      val withLn = graft.functions.PinnedMath.withLnx(terms0)
      val terms = withLn.select(col("yr"),
        floor(lit(1000000.0) * col("d") * col("lnx")).cast("long")
          .as("t_micro"))
      terms.groupBy("yr").agg(
          sum("t_micro").as("psi_micro"),
          when(sum("t_micro") >= 200000L, 1L).otherwise(0L).as("drift_flag"))
        .orderBy("yr")
    },

    // L114 — Cochran's Q (k paired binary classifiers): ml33's McNemar
    // generalized from 2 to k — do the price-threshold model, the
    // priority rule, and a custkey-parity null baseline have EQUAL
    // success rates on the SAME rows? (k separate accuracies can't
    // answer it — the tests share blocks.) Q = (k−1)(k·ΣG² − T²)
    // / (k·T − ΣL²) with G_j = per-classifier correct totals, L_i =
    // per-row correct count, T = ΣL — entirely integer (decimal(38,0)
    // for the squares), ONE e6 floor division at the end; significance
    // vs χ²(k−1 = 2, .95) as the e6 cross-compare. One labeled pass.
    Q(
      "ml37_cochran_q",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS pb,
        |    CAST(o_custkey % 2 AS BIGINT) AS pc
        |  FROM orders),
        |t AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr FROM sc),
        |x AS (SELECT
        |    CASE WHEN (cents >= thr) = (y = 1) THEN 1 ELSE 0 END AS xa,
        |    CASE WHEN (pb = 1) = (y = 1) THEN 1 ELSE 0 END AS xb,
        |    CASE WHEN (pc = 1) = (y = 1) THEN 1 ELSE 0 END AS xc
        |  FROM sc CROSS JOIN t),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xa) AS BIGINT) AS ga, CAST(sum(xb) AS BIGINT) AS gb,
        |    CAST(sum(xc) AS BIGINT) AS gc,
        |    CAST(sum((xa + xb + xc) * (xa + xb + xc)) AS BIGINT) AS l2
        |  FROM x)
        |SELECT n, ga, gb, gc,
        |  CAST((CAST(2 AS HUGEINT) * 1000000
        |        * (3 * (CAST(ga AS HUGEINT)*ga + CAST(gb AS HUGEINT)*gb
        |                + CAST(gc AS HUGEINT)*gc)
        |           - CAST(ga + gb + gc AS HUGEINT) * (ga + gb + gc)))
        |    // (3 * CAST(ga + gb + gc AS HUGEINT) - l2) AS BIGINT) AS q_e6,
        |  CAST(2 AS BIGINT) AS df,
        |  CAST(CASE WHEN (CAST(2 AS HUGEINT) * 1000000
        |        * (3 * (CAST(ga AS HUGEINT)*ga + CAST(gb AS HUGEINT)*gb
        |                + CAST(gc AS HUGEINT)*gc)
        |           - CAST(ga + gb + gc AS HUGEINT) * (ga + gb + gc)))
        |    // (3 * CAST(ga + gb + gc AS HUGEINT) - l2) > 5991465
        |    THEN 1 ELSE 0 END AS BIGINT) AS reject_95
        |FROM ag""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("pb"),
        (col("o_custkey") % 2).cast("long").as("pc"))
      val t = sc.agg(expr("CAST(sum(cents) DIV count(*) AS BIGINT)").as("thr"))
      val x = sc.crossJoin(broadcast(t)).select(
        when((col("cents") >= col("thr")) === (col("y") === 1), 1L)
          .otherwise(0L).as("xa"),
        when((col("pb") === 1) === (col("y") === 1), 1L).otherwise(0L).as("xb"),
        when((col("pc") === 1) === (col("y") === 1), 1L).otherwise(0L).as("xc"))
      val ag = x.agg(count(lit(1)).as("n"),
        sum("xa").as("ga"), sum("xb").as("gb"), sum("xc").as("gc"),
        sum((col("xa") + col("xb") + col("xc"))
          * (col("xa") + col("xb") + col("xc"))).as("l2"))
      val d38 = "decimal(38,0)"
      val g2 = col("ga").cast(d38) * col("ga") + col("gb").cast(d38) * col("gb") +
        col("gc").cast(d38) * col("gc")
      val tt = (col("ga") + col("gb") + col("gc")).cast(d38)
      val num = lit(2).cast(d38) * 1000000 * (lit(3) * g2 - tt * tt)
      val den = lit(3).cast(d38) * tt - col("l2")
      val qe6 = ((num - pmod(num, den)) / den).cast("long")
      ag.select(col("n"), col("ga"), col("gb"), col("gc"),
        qe6.as("q_e6"), lit(2L).as("df"),
        when(qe6 > 5991465L, 1L).otherwise(0L).as("reject_95"))
    },

    // L115 — Cohen's kappa (chance-corrected agreement): the labeling-
    // pipeline QA statistic raw accuracy can't give — ml37's price-
    // threshold model vs the actual label, corrected for the agreement
    // two raters reach by marginal luck. κ = (pₒ−pₑ)/(1−pₑ) with
    // pₒ = (a+d)/n and pₑ = [(a+b)(a+c) + (c+d)(b+d)]/n² collapses to
    // ONE exact integer division: κ·10⁶ = 10⁶·(n·(a+d) − pen) DIV
    // (n² − pen) — signed, and Spark DIV / DuckDB // BOTH truncate
    // toward zero (measured in ev93), so the quantized κ is
    // engine-exact. One labeled pass; the Landis-Koch band is a CASE
    // over the shared integer. All decimal(38,0)/HUGEINT intermediates.
    Q(
      "ml38_cohen_kappa",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |  FROM orders),
        |t AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr FROM sc),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN cents >= thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN cents >= thr AND y = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
        |    CAST(sum(CASE WHEN cents < thr AND y = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM sc CROSS JOIN t),
        |k AS (SELECT n, a, b, c, n - a - b - c AS d,
        |    (CAST(a + b AS HUGEINT) * (a + c)
        |     + CAST(n - a - b AS HUGEINT) * (n - a - c)) AS pen
        |  FROM ag),
        |r AS (SELECT n, a, b, c, d,
        |    CAST((CAST(a + d AS HUGEINT) * 1000000) // n AS BIGINT) AS po_e6,
        |    CAST((pen * 1000000) // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_e6,
        |    CAST(((CAST(n AS HUGEINT) * (a + d) - pen) * 1000000)
        |      // (CAST(n AS HUGEINT) * n - pen) AS BIGINT) AS kappa_e6
        |  FROM k)
        |SELECT n, a, b, c, d, po_e6, pe_e6, kappa_e6,
        |  CASE WHEN kappa_e6 < 0 THEN 'poor'
        |       WHEN kappa_e6 < 200000 THEN 'slight'
        |       WHEN kappa_e6 < 400000 THEN 'fair'
        |       WHEN kappa_e6 < 600000 THEN 'moderate'
        |       WHEN kappa_e6 < 800000 THEN 'substantial'
        |       ELSE 'near-perfect' END AS landis_koch
        |FROM r""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      val t = sc.agg(expr("CAST(sum(cents) DIV count(*) AS BIGINT)").as("thr"))
      val ag = sc.crossJoin(broadcast(t)).agg(
        count(lit(1)).as("n"),
        sum(when(col("cents") >= col("thr") && col("y") === 1, 1L)
          .otherwise(0L)).as("a"),
        sum(when(col("cents") >= col("thr") && col("y") === 0, 1L)
          .otherwise(0L)).as("b"),
        sum(when(col("cents") < col("thr") && col("y") === 1, 1L)
          .otherwise(0L)).as("c"))
      val d38 = "decimal(38,0)"
      val k = ag.select(col("n"), col("a"), col("b"), col("c"),
        (col("n") - col("a") - col("b") - col("c")).as("d"),
        ((col("a") + col("b")).cast(d38) * (col("a") + col("c"))
          + (col("n") - col("a") - col("b")).cast(d38)
            * (col("n") - col("a") - col("c"))).as("pen"))
      val r = k.select(col("n"), col("a"), col("b"), col("c"), col("d"),
        expr("CAST((CAST(a + d AS decimal(38,0)) * 1000000) DIV n AS BIGINT)")
          .as("po_e6"),
        expr("CAST((pen * 1000000) DIV (CAST(n AS decimal(38,0)) * n) AS BIGINT)")
          .as("pe_e6"),
        expr("CAST(((CAST(n AS decimal(38,0)) * (a + d) - pen) * 1000000) " +
          "DIV (CAST(n AS decimal(38,0)) * n - pen) AS BIGINT)").as("kappa_e6"))
      r.withColumn("landis_koch",
        when(col("kappa_e6") < 0, "poor")
          .when(col("kappa_e6") < 200000, "slight")
          .when(col("kappa_e6") < 400000, "fair")
          .when(col("kappa_e6") < 600000, "moderate")
          .when(col("kappa_e6") < 800000, "substantial")
          .otherwise("near-perfect"))
    },

    // L116 — Mann-Kendall trend test on monthly revenue: the
    // distribution-free "is this series trending" check (ev93 fits
    // slopes ASSUMING a linear model; MK asks whether ANY monotone
    // trend exists). S = Σ_{i<j} sign(v_j − v_i) over the
    // calendar-bounded month frame (≤ ~84 rows → the pair join is
    // spine²-cheap and fact-linear), tie-corrected variance
    // V = [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18, and the two-sided 5%
    // decision |S|−1 > 1.96·√V cross-multiplied into integers:
    // 180000·(|S|−1)² > 38416·W (W = 18V). Entirely integer — no
    // quantization anywhere.
    Q(
      "ml39_mann_kendall",
      """WITH m AS (SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS ym,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS v
        |  FROM orders GROUP BY 1),
        |p AS (SELECT CAST(sum(CASE WHEN b.v > a.v THEN 1
        |                           WHEN b.v < a.v THEN -1 ELSE 0 END) AS BIGINT) AS s
        |      FROM m a JOIN m b ON b.ym > a.ym),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM m),
        |ties AS (SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tsum
        |         FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM m
        |               GROUP BY v HAVING count(*) > 1)),
        |w AS (SELECT n, n * (n - 1) * (2 * n + 5) - tsum AS wv
        |      FROM nn CROSS JOIN ties)
        |SELECT n AS n_months, s AS s_stat, wv AS var18,
        |  CAST(CASE WHEN s <> 0
        |         AND 180000 * (abs(s) - 1) * (abs(s) - 1) > 38416 * wv
        |       THEN 1 ELSE 0 END AS BIGINT) AS trend_reject_95
        |FROM w CROSS JOIN p""".stripMargin
    ) { (s, d) =>
      val m = Tables.orders(s, d)
        .groupBy(date_trunc("month", col("o_orderdate").cast("date")).as("ym"))
        .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("v"))
        .localCheckpoint(true) // pair join + ties + count read it
      val p = m.as("a")
        .join(m.select(col("ym").as("bym"), col("v").as("bv")),
          col("bym") > col("ym"))
        .agg(sum(when(col("bv") > col("v"), 1L)
          .when(col("bv") < col("v"), -1L).otherwise(0L)).as("s"))
      val nn = m.agg(count(lit(1)).as("n"))
      val ties = m.groupBy("v").agg(count(lit(1)).as("t"))
        .filter(col("t") > 1)
        .agg(coalesce(sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5)),
          lit(0L)).as("tsum"))
      nn.crossJoin(broadcast(ties)).crossJoin(broadcast(p))
        .select(col("n").as("n_months"), col("s").as("s_stat"),
          (col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) - col("tsum"))
            .as("var18"))
        .withColumn("trend_reject_95",
          when(col("s_stat") =!= 0
            && lit(180000L) * (abs(col("s_stat")) - 1) * (abs(col("s_stat")) - 1)
               > lit(38416L) * col("var18"), 1L).otherwise(0L))
    },

    // L117 — Fleiss' kappa over ml37's three binary raters (the
    // price-threshold model, the priority rule, the custkey-parity
    // null): ml38 corrects ONE rater against the label; Fleiss asks
    // whether the PANEL agrees with itself beyond chance — the
    // multi-annotator QA statistic. For k = 3 binary raters with
    // per-item positive count s ∈ {0..3}: P̄ = (A − 3n)/(6n) with
    // A = Σ(s² + (3−s)²), P̄ₑ = (T² + (3n−T)²)/(9n²) with T = Σs,
    // and κ = (P̄−P̄ₑ)/(1−P̄ₑ) collapses over the 18n² common
    // denominator to ONE signed exact integer division:
    // κ·10⁶ = 10⁶·(3n(A−3n) − 2(T²+(3n−T)²)) DIV (18n² − 2(T²+(3n−T)²))
    // — decimal(38,0)/HUGEINT products, Spark DIV ≡ DuckDB //
    // truncation (the ev93 license). One labeled pass, 1-row output.
    Q(
      "ml40_fleiss_kappa",
      """WITH sc AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS cents,
        |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS rb,
        |    CAST(o_custkey % 2 AS BIGINT) AS rc
        |  FROM orders),
        |t AS (SELECT CAST(sum(cents) // count(*) AS BIGINT) AS thr FROM sc),
        |x AS (SELECT (CASE WHEN cents >= thr THEN 1 ELSE 0 END) + rb + rc AS s
        |      FROM sc CROSS JOIN t),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(s) AS BIGINT) AS tpos,
        |    CAST(sum(s * s + (3 - s) * (3 - s)) AS BIGINT) AS a
        |  FROM x),
        |k AS (SELECT n, tpos, a,
        |    (CAST(2 AS HUGEINT) * (CAST(tpos AS HUGEINT) * tpos
        |       + CAST(3 * n - tpos AS HUGEINT) * (3 * n - tpos))) AS pe2
        |  FROM ag)
        |SELECT n, tpos, a,
        |  CAST(((CAST(3 AS HUGEINT) * n * (a - 3 * n) - pe2) * 1000000)
        |    // (CAST(18 AS HUGEINT) * n * n - pe2) AS BIGINT) AS kappa_e6
        |FROM k""".stripMargin
    ) { (s, d) =>
      val sc = Tables.orders(s, d).select(
        round(col("o_totalprice") * 100).cast("long").as("cents"),
        when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L).as("rb"),
        (col("o_custkey") % 2).cast("long").as("rc"))
      val t = sc.agg(expr("CAST(sum(cents) DIV count(*) AS BIGINT)").as("thr"))
      val x = sc.crossJoin(broadcast(t)).select(
        (when(col("cents") >= col("thr"), 1L).otherwise(0L)
          + col("rb") + col("rc")).as("s"))
      val ag = x.agg(count(lit(1)).as("n"), sum("s").as("tpos"),
        sum(col("s") * col("s") + (lit(3) - col("s")) * (lit(3) - col("s")))
          .as("a"))
      val d38 = "decimal(38,0)"
      val k = ag.withColumn("pe2",
        lit(2).cast(d38) * (col("tpos").cast(d38) * col("tpos")
          + (lit(3) * col("n") - col("tpos")).cast(d38)
            * (lit(3) * col("n") - col("tpos"))))
      k.select(col("n"), col("tpos"), col("a"),
        expr("CAST(((CAST(3 AS decimal(38,0)) * n * (a - 3 * n) - pe2) " +
          "* 1000000) DIV (CAST(18 AS decimal(38,0)) * n * n - pe2) " +
          "AS BIGINT)").as("kappa_e6"))
    },
  )
}
